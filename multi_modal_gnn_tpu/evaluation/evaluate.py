"""Comprehensive model evaluation stage.

Produces the reference's artifact contract (src/evaluate.py:349-572):
``evaluation_results.json`` (overall winsorized metrics, sample count,
stratified results) and ``per_lab_metrics.csv`` — plus real baseline
comparisons (the reference CLI only stubs them, :494-515).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.evaluation.baselines import evaluate_baselines
from multi_modal_gnn_tpu.evaluation.metrics import (
    compute_per_lab_metrics,
    compute_regression_metrics,
    stratify_by_lab_frequency,
    stratify_by_patient_degree,
    winsorize_residuals,
)
from multi_modal_gnn_tpu.graph.build import GraphBundle
from multi_modal_gnn_tpu.graph.schema import LAB, PATIENT_LAB
from multi_modal_gnn_tpu.utils.io import save_dataframe, save_json

logger = logging.getLogger(__name__)


def evaluate_model(
    trainer,
    bundle: GraphBundle,
    config: Config,
    output_dir: Optional[str | Path] = None,
    split: str = "test",
    use_best_state: bool = True,
) -> Dict:
    """Evaluate a trained model on a held-out split and write artifacts."""
    graph = bundle.graph
    output_dir = Path(output_dir) if output_dir is not None else None
    if output_dir is not None:
        output_dir.mkdir(parents=True, exist_ok=True)

    state = trainer.best_state if (use_best_state and trainer.best_state is not None) else None
    patient_idx, lab_idx, targets = trainer.masker.split_arrays(split)
    predictions = trainer.predict(split, state=state).astype(np.float64)
    raw_metrics = compute_regression_metrics(predictions, targets)

    # post-hoc per-lab winsorization (reporting only)
    sigma = config.evaluation.winsorize_sigma
    predictions_w, num_capped = winsorize_residuals(predictions, targets, lab_idx, sigma=sigma)
    logger.info(
        "Winsorized %d/%d residuals (%.2f%%) at +/-%.1f sigma",
        num_capped, len(predictions), 100 * num_capped / max(len(predictions), 1), sigma,
    )

    overall = compute_regression_metrics(predictions_w, targets)
    logger.info(
        "%s metrics: MAE %.4f | RMSE %.4f | R2 %.4f | MAPE %.1f%%",
        split, overall["mae"], overall["rmse"], overall["r2"], overall["mape"],
    )

    results: Dict = {
        "overall_metrics": overall,
        "raw_metrics": raw_metrics,
        "num_test_samples": int(len(predictions)),
        "winsorization": {"sigma": sigma, "num_capped": int(num_capped)},
    }

    # per-lab table
    if config.evaluation.per_lab_metrics:
        per_lab = compute_per_lab_metrics(
            predictions_w, targets, lab_idx, lab_names=bundle.meta.lab_names
        )
        if output_dir is not None and len(per_lab):
            save_dataframe(per_lab, output_dir / "per_lab_metrics.csv")

    # baselines fitted on the real train split
    if config.evaluation.baselines:
        from multi_modal_gnn_tpu.graph.schema import PATIENT

        tr_p, tr_l, tr_v = trainer.masker.split_arrays("train")
        want_nn = "nearest_neighbor" in config.evaluation.baselines
        want_als = "als" in config.evaluation.baselines
        want_si = "sideinfo_als" in config.evaluation.baselines
        memberships = None
        if want_si:
            from multi_modal_gnn_tpu.training.warmstart import bundle_membership_matrix

            memberships = bundle_membership_matrix(bundle)
        want_pairs = want_nn or want_als or want_si
        # evaluation.extras.huber_delta: Huber-IRLS robust ALS/side-info
        # baselines for heavy-tailed cohorts (baselines.py ALSBaseline)
        hd = config.evaluation.extras.get("huber_delta", None)
        results["baselines"] = evaluate_baselines(
            tr_v, tr_l, targets, lab_idx, graph.num_nodes(LAB),
            train_patient_indices=tr_p if want_pairs else None,
            test_patient_indices=patient_idx if want_pairs else None,
            num_patients=graph.num_nodes(PATIENT) if want_pairs else None,
            include_nn=want_nn,
            include_als=want_als,
            memberships=memberships,
            huber_delta=float(hd) if hd is not None else None,
        )
        for name, m in results["baselines"].items():
            if m["mae"] > 0:
                improvement = (m["mae"] - overall["mae"]) / m["mae"] * 100
                logger.info("Baseline %s: MAE %.4f (model %+.1f%%)", name, m["mae"], improvement)

    # split-conformal prediction intervals (beyond reference): calibrated on
    # the validation split, coverage reported on THIS split's raw
    # predictions (the winsorization guard is reporting-only and would
    # leak targets into the bounds).  evaluation.extras.conformal_alpha
    # overrides the 0.1 default; set it falsy to disable.
    alpha = config.evaluation.extras.get("conformal_alpha", 0.1)
    # skip only the split calibration actually uses (in-sample coverage is
    # trivially ~1-alpha there): the carved "cal" split when the masker has
    # one — in which case "val" is disjoint from calibration and evaluable
    cal_split = "cal" if getattr(trainer.masker, "has_calibration_split", False) else "val"
    if alpha and split != cal_split:
        from multi_modal_gnn_tpu.evaluation.conformal import calibrate_from_trainer

        try:
            # calibrate with the SAME parameters the reported predictions
            # used (best state, or the live state when use_best_state=False)
            calibrator = calibrate_from_trainer(
                trainer, alpha=float(alpha),
                state=state if state is not None else trainer.state,
            )
        except ValueError as e:  # calibration split too small for this alpha
            logger.warning("Conformal calibration skipped: %s", e)
        else:
            conf = calibrator.evaluate(predictions, targets, lab_idx)
            results["conformal"] = conf
            logger.info(
                "Conformal (alpha=%.2f): coverage %.3f (target %.2f), "
                "mean width %.3f",
                calibrator.alpha, conf["coverage"], conf["target_coverage"],
                conf["mean_width"],
            )
            if output_dir is not None:
                calibrator.save(output_dir / "conformal.json")

    # stratified analysis
    stratified: Dict = {}
    strat_by = config.evaluation.stratify_by
    if "num_labs" in strat_by:
        stratified["by_patient_degree"] = stratify_by_patient_degree(
            predictions_w, targets, patient_idx, np.asarray(graph.patient_lab_degree)
        )
    if "lab_frequency" in strat_by:
        lab_counts = np.asarray(graph.edges[PATIENT_LAB].dst_count)
        stratified["by_lab_frequency"] = stratify_by_lab_frequency(
            predictions_w, targets, lab_idx, lab_counts
        )
    results["stratified_results"] = stratified

    if output_dir is not None:
        save_json(
            {
                "overall_metrics": overall,
                "num_test_samples": results["num_test_samples"],
                "stratified_results": stratified,
                "raw_metrics": raw_metrics,
                "baselines": results.get("baselines", {}),
                # only present when calibration actually ran — an empty {}
                # here would read as "computed, found nothing" and diverge
                # from the in-memory contract (key absent when skipped)
                **({"conformal": results["conformal"]} if "conformal" in results else {}),
            },
            output_dir / "evaluation_results.json",
        )
    return results


def evaluation_pipeline(
    config: Config,
    bundle: GraphBundle,
    checkpoint_path: str | Path,
    output_dir: str | Path,
    force: bool = False,
) -> Dict:
    """CLI entry: rebuild model, restore a checkpoint, evaluate test.

    The test split is recovered by re-deriving the seeded permutation —
    same approach as the reference CLI (src/evaluate.py:636-644).  The
    trainer is built ``eval_only`` (no train step is ever staged) and the
    restore verifies the checkpoint's config hash against the live config
    unless ``force``."""
    from multi_modal_gnn_tpu.models.factory import build_model
    from multi_modal_gnn_tpu.training.masker import masker_from_config
    from multi_modal_gnn_tpu.training.trainer import Trainer

    # the shared config->masker factory: split partition (incl. the strict
    # conformal "cal" carve) is identical to the one training used
    masker = masker_from_config(config, bundle)
    model = build_model(config, bundle.graph)
    trainer = Trainer(model, bundle.graph, masker, config, eval_only=True)
    trainer.restore(checkpoint_path, force=force)
    return evaluate_model(trainer, bundle, config, output_dir=output_dir)
