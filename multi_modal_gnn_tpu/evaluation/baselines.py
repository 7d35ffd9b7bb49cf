"""Baseline predictors (reference: src/evaluate.py:147-230).

The reference's CLI evaluation only approximates these (src/evaluate.py:
494-515 notes "Requires training data"); here they are evaluated for real
from the train split, since the masker hands us the split arrays directly.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from multi_modal_gnn_tpu.evaluation.metrics import compute_regression_metrics


class GlobalMeanBaseline:
    """Predict the global mean of train-split values."""

    def __init__(self):
        self.mean = 0.0

    def fit(self, values: np.ndarray) -> "GlobalMeanBaseline":
        self.mean = float(np.mean(values))
        return self

    def predict(self, n: int) -> np.ndarray:
        return np.full(n, self.mean)


class PerLabMeanBaseline:
    """Predict each lab's train-split mean (vectorized via bincount)."""

    def __init__(self, num_labs: int):
        self.num_labs = num_labs
        self.lab_means = np.zeros(num_labs)

    def fit(self, values: np.ndarray, lab_indices: np.ndarray) -> "PerLabMeanBaseline":
        sums = np.bincount(lab_indices, weights=values, minlength=self.num_labs)
        counts = np.bincount(lab_indices, minlength=self.num_labs)
        self.lab_means = np.where(counts > 0, sums / np.maximum(counts, 1), 0.0)
        return self

    def predict(self, lab_indices: np.ndarray) -> np.ndarray:
        return self.lab_means[np.asarray(lab_indices)]


def evaluate_baselines(
    train_values: np.ndarray,
    train_lab_indices: np.ndarray,
    test_values: np.ndarray,
    test_lab_indices: np.ndarray,
    num_labs: int,
) -> Dict[str, Dict[str, float]]:
    results = {}
    gm = GlobalMeanBaseline().fit(train_values)
    results["global_mean"] = compute_regression_metrics(
        gm.predict(len(test_values)), test_values
    )
    plm = PerLabMeanBaseline(num_labs).fit(train_values, train_lab_indices)
    results["per_lab_mean"] = compute_regression_metrics(
        plm.predict(test_lab_indices), test_values
    )
    return results
