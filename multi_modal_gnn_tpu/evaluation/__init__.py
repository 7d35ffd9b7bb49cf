"""Evaluation: metrics, winsorization, stratification, baselines, reports."""

from multi_modal_gnn_tpu.evaluation.metrics import (  # noqa: F401
    compute_regression_metrics,
    compute_per_lab_metrics,
    winsorize_residuals,
    stratify_by_patient_degree,
    stratify_by_lab_frequency,
)
from multi_modal_gnn_tpu.evaluation.baselines import (  # noqa: F401
    ALSBaseline,
    GlobalMeanBaseline,
    NearestNeighborBaseline,
    PerLabMeanBaseline,
    SideInfoALSBaseline,
    evaluate_baselines,
    membership_matrix,
)
from multi_modal_gnn_tpu.evaluation.conformal import (  # noqa: F401
    ConformalCalibrator,
    calibrate_from_trainer,
    conformal_quantile,
)
from multi_modal_gnn_tpu.evaluation.evaluate import evaluate_model, evaluation_pipeline  # noqa: F401
