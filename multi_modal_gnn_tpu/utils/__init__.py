"""Shared utilities: logging, RNG, host I/O, normalization, timing."""

from multi_modal_gnn_tpu.utils.logging import setup_logging  # noqa: F401
from multi_modal_gnn_tpu.utils.rng import RngSequence, set_global_seeds  # noqa: F401
from multi_modal_gnn_tpu.utils.normalizer import LabNormalizer, remove_outliers  # noqa: F401
from multi_modal_gnn_tpu.utils.io import (  # noqa: F401
    load_dataframe,
    save_dataframe,
    load_json,
    save_json,
)
from multi_modal_gnn_tpu.utils.timing import Timer, format_time  # noqa: F401
