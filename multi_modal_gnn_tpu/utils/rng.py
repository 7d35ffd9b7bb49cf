"""Deterministic randomness.

The reference seeds random/numpy/torch globally (src/utils.py:80-104) and then
*breaks* reproducibility by re-seeding the per-epoch supervision mask from
``time.time()`` (src/train.py:156).  Here all randomness flows from a single
``jax.random.key`` split into named streams, so runs are bit-reproducible:
the per-epoch supervision mask is keyed by (seed, epoch) instead of
wall-clock.
"""

from __future__ import annotations

import random
from typing import Iterator

import jax
import numpy as np


def set_global_seeds(seed: int = 42) -> None:
    """Seed host-side RNGs (python + numpy). Device RNG is key-based."""
    random.seed(seed)
    np.random.seed(seed)


def set_deterministic(enabled: bool = True) -> None:
    """Determinism switch (reference: src/utils.py:107-126, torch's
    use_deterministic_algorithms).  XLA:TPU is deterministic by default for
    a fixed program; this additionally pins reduction determinism on GPU
    backends and is otherwise a documented no-op."""
    import os

    if enabled:
        flags = os.environ.get("XLA_FLAGS", "")
        if "--xla_gpu_deterministic_ops" not in flags:
            os.environ["XLA_FLAGS"] = flags + " --xla_gpu_deterministic_ops=true"


def compute_class_weights(labels: np.ndarray, num_classes: int) -> np.ndarray:
    """Inverse-frequency class weights normalized to mean 1 (reference:
    src/utils.py compute_class_weights)."""
    counts = np.bincount(np.asarray(labels, dtype=np.int64), minlength=num_classes)
    weights = 1.0 / np.maximum(counts, 1)
    return (weights * num_classes / weights.sum()).astype(np.float32)


class RngSequence:
    """Named, counted PRNG key streams derived from one root seed.

    Usage::

        rngs = RngSequence(seed=42)
        init_key = rngs.next("init")        # fold_in("init"), counter 0
        mask_key = rngs.key_for("mask", epoch)   # pure function of (seed, name, epoch)
    """

    def __init__(self, seed: int):
        self.seed = int(seed)
        self._root = jax.random.key(self.seed)
        self._counters: dict[str, int] = {}

    def _stream(self, name: str) -> jax.Array:
        # Stable per-name stream: fold the hash of the name into the root key.
        return jax.random.fold_in(self._root, _stable_hash(name))

    def stream(self, name: str) -> jax.Array:
        """The stream's base key; ``fold_in(stream(n), i) == key_for(n, i)``.
        Lets jitted scans derive per-epoch keys on device."""
        return self._stream(name)

    def next(self, name: str) -> jax.Array:
        """Next key in the named stream (stateful counter)."""
        count = self._counters.get(name, 0)
        self._counters[name] = count + 1
        return jax.random.fold_in(self._stream(name), count)

    def key_for(self, name: str, index: int) -> jax.Array:
        """Stateless key: pure function of (seed, name, index)."""
        return jax.random.fold_in(self._stream(name), int(index))

    def iter(self, name: str) -> Iterator[jax.Array]:
        while True:
            yield self.next(name)


def _stable_hash(name: str) -> int:
    """Deterministic 31-bit hash of a string (python's hash() is salted)."""
    h = 2166136261
    for ch in name.encode():
        h = ((h ^ ch) * 16777619) & 0x7FFFFFFF
    return h
