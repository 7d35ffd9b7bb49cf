"""Checkpointing with true mid-training resume.

The reference saves a best-model dict (epoch, model/optimizer state, val
loss, config; src/train.py:502-509) but can only ever restart training from
scratch (SURVEY.md section 5).  Here a checkpoint captures the full training
state — params, batch stats, optimizer state, epoch, scheduler and
early-stopping state — as one msgpack file (flax.serialization) plus a JSON
sidecar, and ``Trainer.fit(resume_from=...)`` continues bit-exactly where it
stopped (per-epoch RNG is keyed by (seed, epoch), not stateful).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, Optional

import jax
from flax import serialization

from multi_modal_gnn_tpu.utils.io import load_json, save_json

logger = logging.getLogger(__name__)


def save_checkpoint(
    path: str | Path,
    state_pytree: Any,
    metadata: Optional[Dict] = None,
) -> Path:
    """Serialize a pytree of arrays to ``<path>`` (msgpack) + ``<path>.json``."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    state_host = jax.device_get(state_pytree)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state_host))
    save_json(metadata or {}, path.with_suffix(path.suffix + ".json"))
    logger.info("Saved checkpoint to %s", path)
    return path


def load_checkpoint(path: str | Path, target_pytree: Any) -> tuple[Any, Dict]:
    """Restore a checkpoint into the structure of ``target_pytree``."""
    path = Path(path)
    with open(path, "rb") as f:
        restored = serialization.from_bytes(target_pytree, f.read())
    meta_path = path.with_suffix(path.suffix + ".json")
    metadata = load_json(meta_path) if meta_path.exists() else {}
    logger.info("Loaded checkpoint from %s", path)
    return restored, metadata
