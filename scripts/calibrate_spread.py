"""Generator v2.2 calibration sweep: per-lab MAE spread (VERDICT r3 item 2).

The one fingerprint line v2.1 does not reproduce: the reference's per-lab
winsorized MAE spans 0.138-1.04 with std 0.19 (per_lab_metrics.csv), while
the validated cohort realizes 0.49-0.75, std 0.068.  Mechanism analysis
(README "Generator validation"): the reference's spread is carried by
per-lab TEST-STRATUM variance dispersion — heavy per-lab kurtosis makes the
~120-sample test stratum realize variance far from the global 1.0 (CPK
0.137, FiO2 2.6), and winsorized MAE tracks sqrt(realized variance) — plus
a few near-deterministic setting-like labs at the bottom.

This sweep measures candidates CHEAPLY (no SGD): per-lab test variance
dispersion is a data statistic, and the per-lab MAE spread of the rank-8
ALS channel tracks the faithful rung's (both are conditional-mean
predictors on the same cohort).  Finalists are then confirmed with the
100-epoch faithful rung via validate_generator.py — REQUIRED, because the
round-4 calibration measured two proxy limits: (a) the proxy's STRATIFIED
R^2 ordering does not transfer to the rung (SGD's early severity recovery
favors rare labs in ways the closed-form channel doesn't), and (b) a
student-t near df=2 looked spike-like in theory but cannot concentrate in
finite samples (the renormalized bulk lands at |z|~0.3) — the explicit
bulk+spike mixture that replaced it (heavy_bulk/heavy_spike_*) was found
with the sim_lab() study below, not the t sweep.

Usage: python scripts/calibrate_spread.py [--quick]
"""

from __future__ import annotations

import argparse
import dataclasses
import itertools
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REF = {"min": 0.138, "max": 0.856, "std": 0.191,
       "var_lo": 0.137, "var_hi": 2.6}


def sim_lab(n, beta, p, S, n_rep=400, seed=0):
    """Standalone realization study for one spike-mixture lab: test-stratum
    variance + zero-predictor winsorized-MAE quantiles over re-draws.  This
    is how the v2.2 (heavy_bulk, heavy_spike_prob, heavy_spike_scale)
    defaults were chosen: (0.15, 0.015, 4.5)-class settings realize
    tvar 0.06-2.4 and MAE 0.15-0.28 — the CPK/troponin regime."""
    rng = np.random.default_rng(seed)
    tvars, maes = [], []
    for _ in range(n_rep):
        x = beta * rng.standard_normal(n)
        spike = rng.random(n) < p
        x = np.where(
            spike,
            np.sign(rng.standard_normal(n)) * S * (0.5 + np.abs(rng.standard_normal(n))),
            x,
        )
        x = (x - x.mean()) / x.std()
        te = rng.random(n) < 0.15
        resid = x[te]
        sd = resid.std()
        capped = np.clip(resid, -3 * sd, 3 * sd)
        tvars.append(resid.var())
        maes.append(np.abs(capped).mean())
    tvars, maes = np.array(tvars), np.array(maes)
    return {
        "tvar_q10_50_90": np.percentile(tvars, [10, 50, 90]).round(3).tolist(),
        "mae_q10_50_90": np.percentile(maes, [10, 50, 90]).round(3).tolist(),
        "p_mae_lt_0.3": float((maes < 0.3).mean()),
    }


def measure(spec, seed_split=42):
    from multi_modal_gnn_tpu.config import Config
    from multi_modal_gnn_tpu.data.synthetic import generate_synthetic_tables
    from multi_modal_gnn_tpu.evaluation.baselines import ALSBaseline
    from multi_modal_gnn_tpu.evaluation.metrics import (
        compute_per_lab_metrics,
        compute_regression_metrics,
        stratify_by_lab_frequency,
        winsorize_residuals,
    )
    from multi_modal_gnn_tpu.graph.build import build_heterogeneous_graph
    from multi_modal_gnn_tpu.graph.schema import LAB, PATIENT
    from multi_modal_gnn_tpu.training.masker import EdgeMasker

    config = Config()
    tables = generate_synthetic_tables(spec)
    bundle = build_heterogeneous_graph(
        labs=tables["labs_normalized"], diagnoses=tables["diagnoses"],
        medications=tables["medications"], cohort=tables["cohort"],
        labitems=tables["labitems"], config=config,
    )
    masker = EdgeMasker(bundle.graph, seed=seed_split,
                        host_edges=bundle.patient_lab_host())
    nP, nL = bundle.graph.num_nodes(PATIENT), bundle.graph.num_nodes(LAB)
    tr_p, tr_l, tr_v = masker.split_arrays("train")
    te_p, te_l, te_v = masker.split_arrays("test")

    # data statistics
    v_all = np.concatenate([masker.split_arrays(s)[2] for s in ("train", "val", "test")])
    kurt = float(((v_all - v_all.mean()) ** 4).mean() / v_all.var() ** 2 - 3)
    te_var = np.array([te_v[te_l == j].var() if (te_l == j).sum() >= 20 else np.nan
                       for j in range(nL)])
    te_var = te_var[~np.isnan(te_var)]

    als = ALSBaseline(nP, nL, rank=8, reg=12.0).fit(tr_v, tr_p, tr_l)
    preds = als.predict(te_p, te_l).astype(np.float64)
    raw = compute_regression_metrics(preds, te_v)
    preds_w, capped = winsorize_residuals(preds, te_v, te_l, sigma=3.0)
    wins = compute_regression_metrics(preds_w, te_v)
    per_lab = compute_per_lab_metrics(preds_w, te_v, te_l)
    mae = per_lab["mae"].to_numpy() if hasattr(per_lab["mae"], "to_numpy") else np.asarray(per_lab["mae"])
    all_l = np.concatenate([masker.split_arrays(s)[1] for s in ("train", "val", "test")])
    lab_counts = np.bincount(all_l, minlength=nL)
    strat = stratify_by_lab_frequency(preds_w, te_v, te_l, lab_counts)
    return {
        "kurtosis": round(kurt, 2),
        "test_var": {"min": round(float(te_var.min()), 3),
                     "max": round(float(te_var.max()), 3),
                     "std": round(float(te_var.std()), 3)},
        "als_raw_r2": round(raw["r2"], 4),
        "als_win_r2": round(wins["r2"], 4),
        "als_win_mae": round(wins["mae"], 4),
        "guard_rate": round(capped / len(te_v), 4),
        "per_lab_mae": {"min": round(float(mae.min()), 3),
                        "max": round(float(mae.max()), 3),
                        "std": round(float(mae.std()), 3)},
        "rare_gt_common": bool(
            strat["rare (bottom 25%)"]["r2"] > strat["common (middle 50%)"]["r2"]
        ),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--grid", type=str, default="")
    args = ap.parse_args()

    from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec

    base = SyntheticSpec.eicu_real(seed=0)
    print("v2.1 baseline:", json.dumps(measure(base)))

    if args.grid:
        grid = json.loads(args.grid)
    else:
        grid = {
            "heavy_lab_frac": [0.08, 0.12],
            "heavy_bulk": [0.12, 0.2],
            "heavy_spike_prob": [0.01, 0.02],
            "heavy_spike_scale": [3.5, 5.0],
        }
    keys = sorted(grid)
    combos = list(itertools.product(*(grid[k] for k in keys)))
    if args.quick:
        combos = combos[:4]
    results = []
    for vals in combos:
        over = dict(zip(keys, vals))
        spec = dataclasses.replace(base, **over)
        m = measure(spec)
        results.append({"overrides": over, **m})
        print(json.dumps(results[-1]))
    out = Path("outputs/diagnostics/spread_sweep.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({"reference": REF, "rows": results}, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
