"""Host-side artifact I/O: parquet/csv dataframes and JSON results.

Reproduces the artifact contract of the reference (src/utils.py:233-301 and
SURVEY.md section 2.3): interim parquet tables, JSON result files, CSV metric
tables.  Graph/model binary artifacts use .npz + JSON sidecars instead of
pickled torch objects (see graph/serialize.py, training/checkpoint.py).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)


def save_dataframe(df: pd.DataFrame, path: str | Path, fmt: str | None = None) -> Path:
    """Save a DataFrame as parquet (default) or csv, inferring from suffix."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fmt = fmt or ("csv" if path.suffix == ".csv" else "parquet")
    if fmt == "parquet":
        df.to_parquet(path, index=False)
    elif fmt == "csv":
        df.to_csv(path, index=False)
    else:
        raise ValueError(f"Unknown dataframe format: {fmt}")
    logger.info("Saved DataFrame %s to %s", df.shape, path)
    return path


def load_dataframe(path: str | Path) -> pd.DataFrame:
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"DataFrame file not found: {path}")
    if path.suffix == ".csv":
        df = pd.read_csv(path)
    else:
        df = pd.read_parquet(path)
    logger.info("Loaded DataFrame %s from %s", df.shape, path)
    return df


class NumpyJSONEncoder(json.JSONEncoder):
    """JSON encoder that understands numpy scalars/arrays and Paths."""

    def default(self, o: Any):
        if isinstance(o, (np.integer,)):
            return int(o)
        if isinstance(o, (np.floating,)):
            return float(o)
        if isinstance(o, (np.bool_,)):
            return bool(o)
        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, Path):
            return str(o)
        return super().default(o)


def save_json(obj: Any, path: str | Path, indent: int = 2) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=indent, cls=NumpyJSONEncoder)
    return path


def load_json(path: str | Path) -> Any:
    with open(path) as f:
        return json.load(f)
