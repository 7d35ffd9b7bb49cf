"""Per-lab value normalization and outlier removal.

Capability-parity with the reference ``LabNormalizer`` (src/utils.py:309-433)
and ``remove_outliers`` (src/utils.py:435-485), but vectorized: statistics for
all labs are computed in one groupby instead of a per-lab Python loop, and the
fitted state is a plain DataFrame that serializes to parquet/JSON for use by
inference-time denormalization (reference: src/inference.py:296-299).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

_METHODS = ("zscore", "minmax", "robust", "none")


class LabNormalizer:
    """Fit/transform/inverse-transform per-group normalization.

    Methods:
      * ``zscore``: (x - mean) / std        (std==0 -> x - mean)
      * ``minmax``: (x - min) / (max - min) (range==0 -> 0)
      * ``robust``: (x - median) / IQR      (IQR==0 -> x - median)
      * ``none``:   identity
    """

    def __init__(self, method: str = "zscore"):
        if method not in _METHODS:
            raise ValueError(f"Unknown normalization method: {method}")
        self.method = method
        self.stats: Dict[object, Optional[dict]] = {}

    # -- vectorized API --------------------------------------------------

    def fit_frame(self, df: pd.DataFrame, value_col: str, group_col: str) -> "LabNormalizer":
        """Fit statistics for every group in one pass."""
        clean = df[[group_col, value_col]].dropna(subset=[value_col])
        if self.method == "none":
            for gid in clean[group_col].unique():
                self.stats[gid] = {}
            return self
        g = clean.groupby(group_col)[value_col]
        if self.method == "zscore":
            agg = g.agg(["mean", "std"])
            # pandas std is ddof=1; a single observation gives NaN -> treat as 0
            agg["std"] = agg["std"].fillna(0.0)
            table = agg.rename(columns={"mean": "center", "std": "scale"})
        elif self.method == "minmax":
            agg = g.agg(["min", "max"])
            table = pd.DataFrame(
                {"center": agg["min"], "scale": agg["max"] - agg["min"]}, index=agg.index
            )
        else:  # robust
            med = g.median()
            q25 = g.quantile(0.25)
            q75 = g.quantile(0.75)
            table = pd.DataFrame({"center": med, "scale": q75 - q25}, index=med.index)
        for gid, row in table.iterrows():
            self.stats[gid] = {"center": float(row["center"]), "scale": float(row["scale"])}
        return self

    def transform_frame(self, df: pd.DataFrame, value_col: str, group_col: str) -> pd.Series:
        """Vectorized transform of a frame column; unknown groups pass through."""
        if self.method == "none":
            return df[value_col].copy()
        centers = {g: s["center"] for g, s in self.stats.items() if s}
        scales = {g: s["scale"] for g, s in self.stats.items() if s}
        center = df[group_col].map(centers).astype(float)
        scale = df[group_col].map(scales).astype(float)
        values = df[value_col].astype(float)
        known = center.notna()
        out = values.copy()
        shifted = values - center
        if self.method == "minmax":
            # range==0 -> map to 0 (matches reference minmax degenerate case)
            normalized = np.where(scale != 0, shifted / scale.replace(0, np.nan), 0.0)
        else:
            normalized = np.where(scale != 0, shifted / scale.replace(0, np.nan), shifted)
        out[known] = pd.Series(normalized, index=df.index)[known]
        return out

    def fit_transform_frame(self, df: pd.DataFrame, value_col: str, group_col: str) -> pd.Series:
        self.fit_frame(df, value_col, group_col)
        return self.transform_frame(df, value_col, group_col)

    # -- scalar / per-series API (reference-compatible) -------------------

    def fit(self, values: pd.Series, lab_id) -> None:
        clean = values.dropna()
        if len(clean) == 0:
            logger.warning("No valid values for lab %s", lab_id)
            self.stats[lab_id] = None
            return
        if self.method == "zscore":
            std = clean.std()
            self.stats[lab_id] = {
                "center": float(clean.mean()),
                "scale": float(0.0 if pd.isna(std) else std),
            }
        elif self.method == "minmax":
            self.stats[lab_id] = {
                "center": float(clean.min()),
                "scale": float(clean.max() - clean.min()),
            }
        elif self.method == "robust":
            self.stats[lab_id] = {
                "center": float(clean.median()),
                "scale": float(clean.quantile(0.75) - clean.quantile(0.25)),
            }
        else:
            self.stats[lab_id] = {}

    def transform(self, values: pd.Series, lab_id) -> pd.Series:
        if self.method == "none":
            return values
        if lab_id not in self.stats or self.stats[lab_id] is None:
            logger.warning("No statistics for lab %s; returning original values", lab_id)
            return values
        center, scale = self._center(lab_id), self._scale(lab_id)
        if scale == 0 or pd.isna(scale):
            return values * 0 if self.method == "minmax" else values - center
        return (values - center) / scale

    def fit_transform(self, values: pd.Series, lab_id) -> pd.Series:
        self.fit(values, lab_id)
        return self.transform(values, lab_id)

    def inverse_transform(self, normalized: pd.Series, lab_id) -> pd.Series:
        if self.method == "none":
            return normalized
        if lab_id not in self.stats or self.stats[lab_id] is None:
            return normalized
        center, scale = self._center(lab_id), self._scale(lab_id)
        if scale == 0 or pd.isna(scale):
            # mirror transform's degenerate-scale branch: zscore/robust
            # shifted by center (scale treated as 1), minmax collapsed to 0
            return normalized * 0 + center if self.method == "minmax" else normalized + center
        return normalized * scale + center

    # -- (de)serialization ------------------------------------------------

    def to_frame(self) -> pd.DataFrame:
        rows = [
            {"lab_id": gid, "center": s.get("center", 0.0), "scale": s.get("scale", 1.0)}
            for gid, s in self.stats.items()
            if s is not None
        ]
        df = pd.DataFrame(rows)
        df["method"] = self.method
        return df

    @classmethod
    def from_frame(cls, df: pd.DataFrame) -> "LabNormalizer":
        method = df["method"].iloc[0] if len(df) else "zscore"
        norm = cls(method=method)
        for _, row in df.iterrows():
            norm.stats[row["lab_id"]] = {
                "center": float(row["center"]),
                "scale": float(row["scale"]),
            }
        return norm

    def _center(self, gid) -> float:
        s = self.stats.get(gid)
        return s.get("center", 0.0) if s else 0.0

    def _scale(self, gid) -> float:
        s = self.stats.get(gid)
        return s.get("scale", 1.0) if s else 1.0


def remove_outliers(
    values: pd.Series, method: str = "std", threshold: float = 5.0
) -> pd.Series:
    """Set outliers to NaN. ``std``: beyond mean +/- t*std; ``iqr``: beyond
    [q25 - t*IQR, q75 + t*IQR]. Mirrors reference src/utils.py:435-485."""
    if method == "std":
        mean, std = values.mean(), values.std()
        lo, hi = mean - threshold * std, mean + threshold * std
    elif method == "iqr":
        q25, q75 = values.quantile(0.25), values.quantile(0.75)
        iqr = q75 - q25
        lo, hi = q25 - threshold * iqr, q75 + threshold * iqr
    else:
        raise ValueError(f"Unknown outlier detection method: {method}")
    mask = (values < lo) | (values > hi)
    out = values.copy()
    n = int(mask.sum())
    if n:
        logger.info("Removed %d outliers (%.2f%%)", n, 100 * n / len(values))
        out[mask] = np.nan
    return out


def remove_outliers_grouped(
    df: pd.DataFrame,
    value_col: str,
    group_col: str,
    threshold: float = 5.0,
) -> pd.Series:
    """Vectorized per-group std-outlier removal: one groupby-transform instead
    of the reference's per-lab Python loop (src/preprocess.py:69-79)."""
    g = df.groupby(group_col)[value_col]
    mean = g.transform("mean")
    std = g.transform("std").fillna(0.0)
    values = df[value_col]
    mask = (values < mean - threshold * std) | (values > mean + threshold * std)
    out = values.copy()
    out[mask] = np.nan
    return out
