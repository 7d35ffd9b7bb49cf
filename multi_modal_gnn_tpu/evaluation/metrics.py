"""Regression metrics, per-lab breakdowns, winsorization, stratification.

Numerically matches the reference evaluation (src/evaluate.py):
  * MAE / RMSE / R^2 / MAPE-on-nonzero-targets (:36-82);
  * per-lab table, >= 2 samples, sorted by MAE (:89-140);
  * post-hoc per-lab residual winsorization at mean +/- k*sigma applied to
    predictions before metrics (:410-440);
  * stratification by patient lab-degree buckets 1-5 / 6-15 / 16+ (:237-287)
    and by lab-frequency quartiles of positive lab counts (:290-341).

All metric math is vectorized numpy on the host — the test split is tiny
relative to training compute, and host-side keeps the jitted path lean.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd


def compute_regression_metrics(predictions: np.ndarray, targets: np.ndarray) -> Dict[str, float]:
    predictions = np.asarray(predictions, dtype=np.float64)
    targets = np.asarray(targets, dtype=np.float64)
    err = predictions - targets
    mae = float(np.mean(np.abs(err)))
    rmse = float(np.sqrt(np.mean(err**2)))
    ss_res = float(np.sum(err**2))
    ss_tot = float(np.sum((targets - targets.mean()) ** 2))
    r2 = float(1.0 - ss_res / ss_tot) if ss_tot > 0 else 0.0
    nz = targets != 0
    mape = (
        float(np.mean(np.abs((targets[nz] - predictions[nz]) / targets[nz])) * 100)
        if nz.any()
        else float("nan")
    )
    return {"mae": mae, "rmse": rmse, "r2": r2, "mape": mape}


def winsorize_residuals(
    predictions: np.ndarray,
    targets: np.ndarray,
    lab_indices: np.ndarray,
    sigma: float = 3.0,
) -> Tuple[np.ndarray, int]:
    """Cap residuals per lab at mean +/- sigma*std; returns (adjusted
    predictions, number capped).  Reporting-only guard — identical semantics
    to reference src/evaluate.py:410-440."""
    predictions = np.asarray(predictions, dtype=np.float64).copy()
    targets = np.asarray(targets, dtype=np.float64)
    lab_indices = np.asarray(lab_indices)
    residuals = predictions - targets
    num_capped = 0
    for lab_idx in np.unique(lab_indices):
        m = lab_indices == lab_idx
        r = residuals[m]
        if len(r) > 1:
            mu, sd = r.mean(), r.std()
            capped = np.clip(r, mu - sigma * sd, mu + sigma * sd)
            num_capped += int(np.sum(capped != r))
            predictions[m] = targets[m] + capped
    return predictions, num_capped


def compute_per_lab_metrics(
    predictions: np.ndarray,
    targets: np.ndarray,
    lab_indices: np.ndarray,
    lab_names: Optional[Dict[int, str]] = None,
    min_samples: int = 2,
) -> pd.DataFrame:
    lab_names = lab_names or {}
    rows = []
    for lab_idx in np.unique(lab_indices):
        m = lab_indices == lab_idx
        if int(m.sum()) < min_samples:
            continue
        metrics = compute_regression_metrics(predictions[m], targets[m])
        metrics["lab_index"] = int(lab_idx)
        metrics["lab_name"] = lab_names.get(int(lab_idx), f"Lab_{int(lab_idx)}")
        metrics["num_samples"] = int(m.sum())
        rows.append(metrics)
    df = pd.DataFrame(rows)
    if len(df):
        df = df.sort_values("mae").reset_index(drop=True)
    return df


def stratify_by_patient_degree(
    predictions: np.ndarray,
    targets: np.ndarray,
    patient_indices: np.ndarray,
    patient_lab_degree: np.ndarray,
) -> Dict[str, Dict]:
    deg = np.asarray(patient_lab_degree)[np.asarray(patient_indices)]
    groups = {
        "low (1-5 labs)": (deg >= 1) & (deg <= 5),
        "medium (6-15 labs)": (deg >= 6) & (deg <= 15),
        "high (16+ labs)": deg >= 16,
    }
    out = {}
    for name, m in groups.items():
        if m.sum() > 0:
            metrics = compute_regression_metrics(predictions[m], targets[m])
            metrics["num_samples"] = int(m.sum())
            out[name] = metrics
    return out


def stratify_by_lab_frequency(
    predictions: np.ndarray,
    targets: np.ndarray,
    lab_indices: np.ndarray,
    lab_counts: np.ndarray,
) -> Dict[str, Dict]:
    lab_counts = np.asarray(lab_counts)
    freq = lab_counts[np.asarray(lab_indices)]
    positive = lab_counts[lab_counts > 0]
    if len(positive) == 0:
        return {}
    q25 = np.percentile(positive, 25)
    q75 = np.percentile(positive, 75)
    groups = {
        "rare (bottom 25%)": freq < q25,
        "common (middle 50%)": (freq >= q25) & (freq <= q75),
        "very common (top 25%)": freq > q75,
    }
    out = {}
    for name, m in groups.items():
        if m.sum() > 0:
            metrics = compute_regression_metrics(predictions[m], targets[m])
            metrics["num_samples"] = int(m.sum())
            out[name] = metrics
    return out
