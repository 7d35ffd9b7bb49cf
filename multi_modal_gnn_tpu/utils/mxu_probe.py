"""Runtime MXU dtype probe: measure whether bf16 matmuls actually beat f32
on the attached chip (ROADMAP "bf16 auto-detection", VERDICT round-2 item 7).

On this build's v5e the measured f32 and bf16 MXU rates are IDENTICAL
(PERFORMANCE.md "Kernel-shape probes": 11.5 ms vs 11.5 ms on the production
indicator-matmul shape — f32 dots at default precision already do one-pass
bf16 multiplies), so bf16 compute buys nothing; on chips where the bf16
systolic rate is a true multiple of f32, it buys up to 4x on the dominant
kernels.  Rather than hardcoding either assumption, ``model.compute_dtype:
"auto"`` probes once per device kind:

    ratio = t_f32 / t_bf16  on a 32-chain of dependent [2048, 2048]
    matmuls (~550 GFLOP per timing step — well above relay dispatch noise);
    bf16 engages when ratio >= 1.15

The result is cached in-process and on disk (``.mxu_probe.json``, keyed by
device kind) so the probe's two small compiles happen once per machine, not
per run.  Timing follows PERFORMANCE.md "Measurement methodology": sync by
reducing to a scalar on device and reading 4 bytes — never
``block_until_ready`` through the relay.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)

_CACHE_PATH = Path(__file__).resolve().parents[2] / ".mxu_probe.json"
_BF16_ENGAGE_RATIO = 1.15
_memo: dict = {}


def _time_matmul(dtype, iters: int = 7, chain: int = 32, dim: int = 2048) -> float:
    """Median time of ``chain`` dependent [dim, dim] matmuls (~550 GFLOP at
    the defaults: 32 x 2*2048^3 — ~12 ms of f32 MXU work per step, well
    above dispatch noise), scalar-readback synchronized.  ``b = ones/dim``
    keeps the iterate at ~1.0 so neither dtype over/underflows."""
    import jax
    import jax.numpy as jnp

    x0 = jnp.ones((dim, dim), dtype)
    b = jnp.full((dim, dim), 1.0 / dim, dtype)

    @jax.jit
    def step(x, b):
        def body(_, x):
            y = jnp.dot(x, b, preferred_element_type=jnp.float32)
            return y.astype(dtype)

        x = jax.lax.fori_loop(0, chain, body, x)
        return jnp.sum(x.astype(jnp.float32))

    float(step(x0, b))  # compile + warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(step(x0, b))  # scalar readback = device sync
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def probe_bf16_speedup(force: bool = False) -> float:
    """Return measured ``t_f32 / t_bf16`` for the attached default backend.

    > 1 means bf16 is faster.  Cached per device kind in .mxu_probe.json.
    """
    import jax
    import jax.numpy as jnp

    kind = jax.devices()[0].device_kind
    if not force:
        if kind in _memo:
            return _memo[kind]
        try:
            disk = json.loads(_CACHE_PATH.read_text())
            if kind in disk:
                _memo[kind] = float(disk[kind]["ratio"])
                return _memo[kind]
        except (OSError, ValueError):
            pass

    t_f32 = _time_matmul(jnp.float32)
    t_bf16 = _time_matmul(jnp.bfloat16)
    ratio = t_f32 / t_bf16
    logger.info(
        "MXU probe (%s): f32 %.3f ms, bf16 %.3f ms, ratio %.2f",
        kind, 1e3 * t_f32, 1e3 * t_bf16, ratio,
    )
    _memo[kind] = ratio
    try:
        disk = {}
        try:
            disk = json.loads(_CACHE_PATH.read_text())
        except (OSError, ValueError):
            pass
        disk[kind] = {
            "ratio": round(ratio, 4),
            "t_f32_ms": round(1e3 * t_f32, 4),
            "t_bf16_ms": round(1e3 * t_bf16, 4),
        }
        _CACHE_PATH.write_text(json.dumps(disk, indent=2))
    except OSError:
        pass
    return ratio


def resolve_compute_dtype(configured: str) -> str:
    """Map ``model.compute_dtype`` to a concrete dtype name.

    "auto" engages bfloat16 exactly when the probed bf16 MXU rate beats f32
    by >= 15% on the attached chip (this v5e: ratio ~1.0 -> float32 stays).
    Explicit "float32"/"bfloat16" pass through unchanged.
    """
    if configured != "auto":
        return configured
    import jax

    if jax.default_backend() != "tpu":
        # bf16 never beats f32 on host CPU, and the ~8.8 TFLOP of probe
        # matmuls take minutes there — only a real MXU is worth probing
        return "float32"
    try:
        ratio = probe_bf16_speedup()
    except Exception as exc:  # noqa: BLE001 — a probe failure must never
        # take down model construction; fall back to the safe default
        logger.warning("MXU probe failed (%s); compute_dtype=float32", exc)
        return "float32"
    choice = "bfloat16" if ratio >= _BF16_ENGAGE_RATIO else "float32"
    logger.info("compute_dtype=auto -> %s (bf16 speedup ratio %.2f)", choice, ratio)
    return choice
