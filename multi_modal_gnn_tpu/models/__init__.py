"""Model family: relational GNNs over the heterogeneous EHR graph."""

from multi_modal_gnn_tpu.models.rgcn import HeteroRGCN  # noqa: F401
from multi_modal_gnn_tpu.models.hgt import HeteroGT  # noqa: F401
from multi_modal_gnn_tpu.models.factory import build_model, count_parameters  # noqa: F401
from multi_modal_gnn_tpu.models.losses import (  # noqa: F401
    compute_lab_weights,
    weighted_regression_loss,
)
