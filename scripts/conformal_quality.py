"""Conformal interval quality on the VALIDATED eicu phenomenology.

Measures what the split-conformal machinery (evaluation/conformal.py)
actually delivers on the calibrated heavy-tailed cohort — the regime it was
built for — for two prediction channels:

  * the FAITHFUL reference recipe (iter7 analogue: degree gate + inverse-
    variance weights, 100 epochs), and
  * the zero-training Huber-IRLS side-info plant (closed-form epoch-0
    channel — conformal is predictor-agnostic).

For each channel, at alpha in {0.1, 0.2}, three interval constructions are
compared on the held-out test split (calibration on validation):

  * per-lab Mondrian conformal (the shipped default),
  * global-only conformal (min_per_lab=inf),
  * a parametric Gaussian interval pred +/- z_{1-alpha/2} * std(val
    residuals) — the textbook alternative whose tail assumption the
    phenomenology deliberately violates.

Reported per construction: test coverage, mean/median width, per-lab
min/mean coverage (labs with >= 20 test points).  Output:
outputs/diagnostics/conformal_quality.json; README "Generator validation"
quotes the headline.

Usage:
    python scripts/conformal_quality.py --cpu --tag v1
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

Z = {0.1: 1.6449, 0.2: 1.2816}  # standard normal z_{1-alpha/2}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--scan-chunk", type=int, default=10)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--data-seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tag", type=str, default="")
    ap.add_argument("--channels", type=str, default="iter7,sideinfo_huber")
    ap.add_argument("--strict-split", type=float, default=0.0,
                    help="carve this fraction of val into a dedicated 'cal' "
                         "split (masker calibration_split) and calibrate on "
                         "it — the STRICT guarantee; 0 = calibrate on val "
                         "(the v1 behavior, mildly optimistic)")
    args = ap.parse_args()

    if args.cpu:
        from multi_modal_gnn_tpu.utils.platform import force_cpu_devices

        force_cpu_devices(1)

    from multi_modal_gnn_tpu.config import Config
    from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, generate_synthetic_tables
    from multi_modal_gnn_tpu.evaluation.conformal import ConformalCalibrator
    from multi_modal_gnn_tpu.evaluation.metrics import compute_regression_metrics
    from multi_modal_gnn_tpu.graph.build import build_heterogeneous_graph
    from multi_modal_gnn_tpu.graph.schema import LAB
    from multi_modal_gnn_tpu.models.factory import build_model
    from multi_modal_gnn_tpu.training.masker import EdgeMasker
    from multi_modal_gnn_tpu.training.trainer import Trainer

    spec = SyntheticSpec.eicu_real(seed=args.data_seed)
    config = Config()
    tables = generate_synthetic_tables(spec)
    bundle = build_heterogeneous_graph(
        labs=tables["labs_normalized"],
        diagnoses=tables["diagnoses"],
        medications=tables["medications"],
        cohort=tables["cohort"],
        labitems=tables["labitems"],
        config=config,
    )
    masker = EdgeMasker(
        bundle.graph, seed=args.seed, host_edges=bundle.patient_lab_host(),
        calibration_split=args.strict_split,
    )
    num_labs = bundle.graph.num_nodes(LAB)
    # with --strict-split, calibrate on the dedicated "cal" split the
    # optimizer never saw (early stopping runs on the REDUCED val)
    cal_split = "cal" if masker.has_calibration_split else "val"
    _, va_l, va_v = masker.split_arrays(cal_split)
    _, te_l, te_v = masker.split_arrays("test")

    def interval_rows(val_pred: np.ndarray, te_pred: np.ndarray) -> dict:
        rows = {}
        for alpha in (0.1, 0.2):
            mondrian = ConformalCalibrator.fit(
                val_pred, va_v, va_l, num_labs, alpha=alpha
            )
            glob = ConformalCalibrator.fit(
                val_pred, va_v, va_l, num_labs, alpha=alpha,
                min_per_lab=len(va_v) + 1,  # force global fallback everywhere
            )
            rows[f"alpha_{alpha}"] = {
                "mondrian": mondrian.evaluate(te_pred, te_v, te_l),
                "global": glob.evaluate(te_pred, te_v, te_l),
                "gaussian": _gaussian_row(val_pred, te_pred, alpha),
            }
        return rows

    def _gaussian_row(val_pred: np.ndarray, te_pred: np.ndarray, alpha: float) -> dict:
        r = Z[alpha] * float(np.std(val_pred - va_v))
        covered = np.abs(te_pred - te_v) <= r
        hit = np.bincount(te_l, weights=covered, minlength=num_labs)
        tot = np.bincount(te_l, minlength=num_labs)
        el = tot >= 20
        # mirror ConformalCalibrator.evaluate: NaN when no lab reaches the
        # sample floor (tiny cohorts) instead of a reduce-on-empty crash
        per_lab = hit[el] / tot[el] if el.any() else np.array([])
        return {
            "alpha": alpha,
            "target_coverage": 1 - alpha,
            "coverage": float(covered.mean()),
            "mean_width": 2 * r,
            "median_width": 2 * r,
            "per_lab_min_coverage": float(per_lab.min()) if per_lab.size else float("nan"),
            "per_lab_mean_coverage": float(per_lab.mean()) if per_lab.size else float("nan"),
        }

    report: dict = {
        "spec_seed": args.data_seed,
        "splits": masker.split_sizes(),
        "calibration_split": cal_split,
        "strict_split_fraction": args.strict_split,
    }

    wanted = args.channels.split(",")

    if "iter7" in wanted:
        tc = dataclasses.replace(
            config.train,
            epochs=args.epochs,
            early_stopping_patience=15,
            scan_chunk=args.scan_chunk,
            seed=args.seed,
            extras={**config.train.extras, "lab_reweighting": True},
        )
        cfg = dataclasses.replace(config, train=tc)
        trainer = Trainer(build_model(cfg, bundle.graph), bundle.graph, masker, cfg)
        t0 = time.perf_counter()
        trainer.fit(scan_chunk=args.scan_chunk)
        best = trainer.best_state if trainer.best_state is not None else trainer.state
        val_pred = trainer.predict(cal_split, state=best).astype(np.float64)
        te_pred = trainer.predict("test", state=best).astype(np.float64)
        report["iter7"] = {
            "raw_test": compute_regression_metrics(te_pred, te_v),
            "train_time_s": time.perf_counter() - t0,
            **interval_rows(val_pred, te_pred),
        }
        print("iter7:", json.dumps(report["iter7"], indent=1, default=float))

    if "sideinfo_huber" in wanted:
        from multi_modal_gnn_tpu.training.warmstart import (
            bundle_membership_matrix,
            warm_start_trainer,
        )

        rank = 8
        mc = dataclasses.replace(
            config.model,
            edge_head=dataclasses.replace(
                config.model.edge_head,
                extras={"bilinear_rank": 2 * rank + 1, "bilinear_source": "embedding"},
            ),
        )
        cfg = dataclasses.replace(config, model=mc)
        trainer = Trainer(build_model(cfg, bundle.graph), bundle.graph, masker, cfg)
        warm_start_trainer(
            trainer, rank=rank, reg=12.0,
            memberships=bundle_membership_matrix(bundle), huber_delta=0.7,
        )
        val_pred = trainer.predict(cal_split).astype(np.float64)
        te_pred = trainer.predict("test").astype(np.float64)
        report["sideinfo_huber_epoch0"] = {
            "raw_test": compute_regression_metrics(te_pred, te_v),
            **interval_rows(val_pred, te_pred),
        }
        print("sideinfo_huber_epoch0:",
              json.dumps(report["sideinfo_huber_epoch0"], indent=1, default=float))

    out_dir = Path("outputs/diagnostics")
    out_dir.mkdir(parents=True, exist_ok=True)
    tag = args.tag or time.strftime("%H%M%S")
    out_path = out_dir / f"conformal_quality_{tag}.json"
    out_path.write_text(json.dumps(report, indent=2, default=float))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
