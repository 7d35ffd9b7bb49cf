"""Tracing / profiling / observability.

The reference's only instrumentation is wall-clock epoch deltas
(src/train.py:462-487).  Here:
  * :func:`trace` wraps ``jax.profiler`` so any pipeline stretch can emit a
    TensorBoard-loadable device trace;
  * :class:`StepTimer` collects per-step wall times and derives the
    throughput stats the benchmark contract wants (edges/sec);
  * :class:`MetricsWriter` appends structured JSONL metric records —
    greppable observability without a tracking service;
  * :func:`maybe_init_wandb` gates Weights & Biases like the reference
    (src/utils.py:488-514) but degrades to a no-op when the package is
    absent (it is not installed in this image).
"""

from __future__ import annotations

import json
import logging
import time
from contextlib import contextmanager
from pathlib import Path
from typing import Dict, Iterator, Optional

import numpy as np

logger = logging.getLogger(__name__)


@contextmanager
def trace(log_dir: str | Path, enabled: bool = True) -> Iterator[None]:
    """Capture a jax.profiler device trace for the enclosed block."""
    if not enabled:
        yield
        return
    import jax

    log_dir = str(log_dir)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("Profiler trace written to %s", log_dir)


class StepTimer:
    """Per-step wall-clock accumulator with throughput summary."""

    def __init__(self, items_per_step: int = 0):
        self.items_per_step = items_per_step
        self.times: list[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        assert self._t0 is not None, "start() not called"
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        self._t0 = None
        return dt

    @contextmanager
    def step(self) -> Iterator[None]:
        self.start()
        try:
            yield
        finally:
            self.stop()

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        out = {
            "steps": len(arr),
            "total_s": float(arr.sum()),
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p95_ms": float(np.percentile(arr, 95) * 1e3),
        }
        if self.items_per_step:
            out["items_per_sec"] = float(self.items_per_step / arr.mean())
        return out


class MetricsWriter:
    """Append-only JSONL metric records: {"step": .., "ts": .., **metrics}."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a")

    def write(self, step: int, **metrics) -> None:
        record = {"step": int(step), "ts": time.time(), **metrics}
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()

    def close(self) -> None:
        self._fh.close()

    def __enter__(self) -> "MetricsWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def maybe_init_wandb(config) -> Optional[object]:
    """Initialize wandb iff enabled AND installed; else None (no-op)."""
    lc = config.logging
    if not lc.use_wandb:
        return None
    try:
        import wandb
    except ImportError:
        logger.warning("logging.use_wandb=true but wandb is not installed; skipping")
        return None
    run = wandb.init(
        project=lc.wandb_project, entity=lc.wandb_entity, config=config.to_dict()
    )
    logger.info("wandb run initialized: %s", run.name)
    return run


def apply_debug_flags(config) -> None:
    """Wire reproducibility debug switches into jax (debug_nans etc.)."""
    import jax

    rc = config.reproducibility
    if rc.debug_nans:
        jax.config.update("jax_debug_nans", True)
        logger.info("jax_debug_nans enabled")
    if rc.deterministic:
        from multi_modal_gnn_tpu.utils.rng import set_deterministic

        set_deterministic(True)
