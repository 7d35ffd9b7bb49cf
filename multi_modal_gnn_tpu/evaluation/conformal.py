"""Split-conformal prediction intervals for imputed lab values.

No reference analogue (``src/evaluate.py`` reports point metrics only) —
this is a framework addition motivated by the validated eicu phenomenology:
on heavy-tailed residuals every conditional-mean channel converges to the
same raw plateau (README "Generator validation"), so the clinically useful
serving output is not a point estimate but an interval with a coverage
guarantee.

Method: split (inductive) conformal regression on absolute residuals
(Vovk et al. 2005; Lei et al. 2018).  Calibrating on a held-out split of
n exchangeable residuals, the interval ``pred +/- q`` with
``q = s_(ceil((n+1)(1-alpha)))`` (the finite-sample-corrected empirical
quantile of the calibration scores) covers a fresh target with probability
at least ``1 - alpha`` — distribution-free, for ANY underlying predictor
(the GNN, a warm-started plant, an ALS baseline).  Per-lab (Mondrian)
calibration adapts the radius to each lab's own residual scale — near-
deterministic "setting-like" labs get tight intervals, tail-concentrated
labs wide ones — with a global fallback for labs whose calibration count
cannot support the corrected quantile.

Everything here is host-side numpy on split-sized arrays (same rationale as
``evaluation.metrics``): calibration is a sort, serving lookup is one
``q[lab]`` gather, and the jitted device path stays untouched.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import math
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def conformal_quantile(scores: np.ndarray, alpha: float) -> float:
    """Finite-sample-corrected (1-alpha) quantile of conformity scores.

    Returns ``s_(k)`` with ``k = ceil((n+1)(1-alpha))`` (1-indexed order
    statistic), the smallest radius with the split-conformal coverage
    guarantee.  Returns ``inf`` when ``k > n`` — i.e. n is too small to
    certify level alpha (n must be at least ``(1-alpha)/alpha``).
    """
    scores = np.asarray(scores, dtype=np.float64)
    n = scores.size
    if n == 0:
        return float("inf")
    k = math.ceil((n + 1) * (1.0 - alpha))
    if k > n:
        return float("inf")
    return float(np.sort(scores)[k - 1])


@dataclasses.dataclass
class ConformalCalibrator:
    """Per-lab symmetric prediction-interval radii with a global fallback.

    ``q_lab[l]`` is the certified radius for lab ``l`` (already filled with
    the global radius where the lab's calibration count is below
    ``min_per_lab`` or cannot support the corrected quantile), so interval
    construction is a single gather: ``pred +/- q_lab[lab_idx]``.
    """

    alpha: float
    q_global: float
    q_lab: np.ndarray  # [num_labs] float64, fallback-filled
    cal_counts: np.ndarray  # [num_labs] int64 calibration samples per lab
    min_per_lab: int = 30

    @classmethod
    def fit(
        cls,
        predictions: np.ndarray,
        targets: np.ndarray,
        lab_indices: np.ndarray,
        num_labs: int,
        alpha: float = 0.1,
        min_per_lab: int = 30,
    ) -> "ConformalCalibrator":
        """Calibrate on a held-out split (predictions vs targets).

        The calibration split must be disjoint from both the training data
        (residuals there are optimistically biased) and the split whose
        coverage will be reported (coverage there would be in-sample).  The
        evaluation pipeline uses the validation split.
        """
        if not 0.0 < alpha < 1.0:
            raise ValueError(f"alpha must be in (0, 1), got {alpha}")
        predictions = np.asarray(predictions, dtype=np.float64)
        targets = np.asarray(targets, dtype=np.float64)
        lab_indices = np.asarray(lab_indices, dtype=np.int64)
        scores = np.abs(predictions - targets)

        q_global = conformal_quantile(scores, alpha)
        if not np.isfinite(q_global):
            raise ValueError(
                f"calibration set of {scores.size} samples cannot certify "
                f"alpha={alpha} (needs at least {math.ceil(1 / alpha)})"
            )
        counts = np.bincount(lab_indices, minlength=num_labs).astype(np.int64)
        q_lab = np.full(num_labs, q_global, dtype=np.float64)
        for lab in np.flatnonzero(counts >= max(min_per_lab, 1)):
            q = conformal_quantile(scores[lab_indices == lab], alpha)
            if np.isfinite(q):
                q_lab[lab] = q
        return cls(
            alpha=float(alpha),
            q_global=float(q_global),
            q_lab=q_lab,
            cal_counts=counts,
            min_per_lab=int(min_per_lab),
        )

    # -- interval construction ------------------------------------------

    def radius(self, lab_indices: np.ndarray) -> np.ndarray:
        return self.q_lab[np.asarray(lab_indices, dtype=np.int64)]

    def intervals(
        self, predictions: np.ndarray, lab_indices: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """``(lower, upper)`` bounds, each shaped like ``predictions``."""
        predictions = np.asarray(predictions, dtype=np.float64)
        r = self.radius(lab_indices)
        return predictions - r, predictions + r

    # -- evaluation ------------------------------------------------------

    def evaluate(
        self,
        predictions: np.ndarray,
        targets: np.ndarray,
        lab_indices: np.ndarray,
        min_lab_samples: int = 20,
    ) -> Dict:
        """Empirical coverage + width statistics on a disjoint split.

        ``per_lab_min_coverage`` is taken over labs with at least
        ``min_lab_samples`` test points (below that the empirical rate is
        too noisy to name a worst lab).
        """
        predictions = np.asarray(predictions, dtype=np.float64)
        targets = np.asarray(targets, dtype=np.float64)
        lab_indices = np.asarray(lab_indices, dtype=np.int64)
        r = self.radius(lab_indices)
        covered = np.abs(predictions - targets) <= r
        num_labs = len(self.q_lab)
        hit = np.bincount(lab_indices, weights=covered, minlength=num_labs)
        tot = np.bincount(lab_indices, minlength=num_labs)
        eligible = tot >= min_lab_samples
        per_lab_cov = hit[eligible] / tot[eligible] if eligible.any() else np.array([])
        return {
            "alpha": self.alpha,
            "target_coverage": 1.0 - self.alpha,
            "coverage": float(covered.mean()) if covered.size else float("nan"),
            "mean_width": float(2.0 * r.mean()) if r.size else float("nan"),
            "median_width": float(2.0 * np.median(r)) if r.size else float("nan"),
            "q_global": self.q_global,
            "num_samples": int(covered.size),
            "num_labs_calibrated": int(np.sum(self.cal_counts >= self.min_per_lab)),
            "per_lab_min_coverage": float(per_lab_cov.min()) if per_lab_cov.size else float("nan"),
            "per_lab_mean_coverage": float(per_lab_cov.mean()) if per_lab_cov.size else float("nan"),
        }

    # -- serialization (serving manifest sidecar) ------------------------

    def to_dict(self) -> Dict:
        return {
            "alpha": self.alpha,
            "q_global": self.q_global,
            "q_lab": [float(q) for q in self.q_lab],
            "cal_counts": [int(c) for c in self.cal_counts],
            "min_per_lab": self.min_per_lab,
        }

    @classmethod
    def from_dict(cls, d: Dict) -> "ConformalCalibrator":
        return cls(
            alpha=float(d["alpha"]),
            q_global=float(d["q_global"]),
            q_lab=np.asarray(d["q_lab"], dtype=np.float64),
            cal_counts=np.asarray(d["cal_counts"], dtype=np.int64),
            min_per_lab=int(d.get("min_per_lab", 30)),
        )

    def save(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.to_dict()))

    @classmethod
    def load(cls, path: str | Path) -> "ConformalCalibrator":
        return cls.from_dict(json.loads(Path(path).read_text()))


def calibrate_cold_start(
    als,
    masker,
    num_labs: int,
    alpha: float = 0.1,
    min_per_lab: int = 30,
    memberships: Optional[np.ndarray] = None,
) -> ConformalCalibrator:
    """Calibrator for the ALS fold-in (cold-start) serving channel.

    The fold-in predictor has a different residual distribution than the
    graph model, so serving its requests with the model's radii would break
    the guarantee.  This simulates the cold-start request on the validation
    split: each val patient is folded in from ONLY their train-observed
    labs (exactly what ``ServingModel.predict_cold_start`` does for an
    unseen patient with those observations) and their val labs are the
    queries.  ``memberships`` (full [num_patients, F] matrix) routes through
    the side-info fold-in when ``als`` is a SideInfoALSBaseline.
    """
    tr_p, tr_l, tr_v = masker.split_arrays("train")
    va_p, va_l, va_v = masker.split_arrays("val")
    order = np.argsort(tr_p, kind="stable")
    tr_p_s, tr_l_s, tr_v_s = tr_p[order], tr_l[order], tr_v[order]

    preds = np.empty(len(va_v), dtype=np.float64)
    for pid in np.unique(va_p):
        q = va_p == pid
        lo = np.searchsorted(tr_p_s, pid, side="left")
        hi = np.searchsorted(tr_p_s, pid, side="right")
        obs_l, obs_v = tr_l_s[lo:hi], tr_v_s[lo:hi]
        if memberships is not None:
            preds[q] = als.predict_cold_start(obs_l, obs_v, va_l[q], memberships[pid])
        else:
            preds[q] = als.predict_cold_start(obs_l, obs_v, va_l[q])
    return ConformalCalibrator.fit(
        preds, va_v, va_l, num_labs, alpha=alpha, min_per_lab=min_per_lab
    )


def calibrate_from_trainer(
    trainer, alpha: float = 0.1, min_per_lab: int = 30, state=None
) -> ConformalCalibrator:
    """Fit a calibrator on the trainer's validation split.

    ``state`` selects the parameters to calibrate (default: the best-
    validation state when one was recorded — the state served and
    evaluated); pass the state being deployed if it differs.

    The validation split already steers early stopping / LR plateaus, so its
    residual SCALE is mildly optimistic relative to a never-touched split;
    test-split coverage in practice sits at the guaranteed level (pinned in
    tests/test_conformal.py).  For strict guarantees reserve a third split.
    """
    from multi_modal_gnn_tpu.graph.schema import LAB

    _, val_l, val_t = trainer.masker.split_arrays("val")
    if state is None:
        state = trainer.best_state if trainer.best_state is not None else None
    val_pred = np.asarray(trainer.predict("val", state=state), dtype=np.float64)
    return ConformalCalibrator.fit(
        val_pred, val_t, val_l, trainer.graph.num_nodes(LAB),
        alpha=alpha, min_per_lab=min_per_lab,
    )
