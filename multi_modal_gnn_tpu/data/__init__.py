"""Dataset adapters (eICU, MIMIC-III) and the synthetic cohort generator."""

from multi_modal_gnn_tpu.data.synthetic import (  # noqa: F401
    SyntheticSpec,
    generate_synthetic_tables,
    make_synthetic_bundle,
)
