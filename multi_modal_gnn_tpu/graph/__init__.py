"""Heterogeneous graph representation and construction.

TPU-native replacement for the reference's pickled PyG ``HeteroData``
(src/graph_build.py): graphs are frozen pytrees of fixed-shape, padded,
destination-sorted COO/CSR device arrays, built vectorized from dataframes
(no per-row Python loops) and serialized as .npz + JSON sidecar.
"""

from multi_modal_gnn_tpu.graph.schema import (  # noqa: F401
    PATIENT,
    LAB,
    DIAGNOSIS,
    MEDICATION,
    PATIENT_LAB,
    PATIENT_DIAGNOSIS,
    PATIENT_MEDICATION,
    reverse_edge_type,
)
from multi_modal_gnn_tpu.graph.hetero import EdgeSet, HeteroGraph, pad_edge_set  # noqa: F401
from multi_modal_gnn_tpu.graph.indexer import NodeIndexer  # noqa: F401
from multi_modal_gnn_tpu.graph.build import (  # noqa: F401
    GraphBundle,
    GraphMeta,
    build_heterogeneous_graph,
    build_graph_from_preprocessed,
)
from multi_modal_gnn_tpu.graph.stats import validate_graph, compute_graph_statistics  # noqa: F401
from multi_modal_gnn_tpu.graph.serialize import save_graph, load_graph  # noqa: F401
from multi_modal_gnn_tpu.graph.distributed import (  # noqa: F401
    load_graph_distributed,
    save_graph_sharded,
)
