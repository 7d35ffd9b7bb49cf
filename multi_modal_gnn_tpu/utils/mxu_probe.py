"""Runtime MXU dtype probe: measure whether bf16 matmuls actually beat f32
on the attached chip (ROADMAP "bf16 auto-detection", VERDICT round-2 item 7;
statistical hardening — repeats + dispersion + conservative engagement —
VERDICT round-3 item 5).

On this build's v5e the measured f32 and bf16 MXU rates are IDENTICAL
(PERFORMANCE.md "Kernel-shape probes": 11.5 ms vs 11.5 ms on the production
indicator-matmul shape — f32 dots at default precision already do one-pass
bf16 multiplies), so bf16 compute buys nothing; on chips where the bf16
systolic rate is a true multiple of f32, it buys up to 4x on the dominant
kernels.  Rather than hardcoding either assumption, ``model.compute_dtype:
"auto"`` probes once per device kind:

    k fresh (t_f32, t_bf16) pairs of a 32-chain of dependent [2048, 2048]
    matmuls (~550 GFLOP per timing step — well above relay dispatch noise);
    per-pair ratio r_i = t_f32_i / t_bf16_i; bf16 engages only when the
    CONSERVATIVE end (min over pairs) clears 1.15

The min-over-pairs gate is the round-3 fix: a single-pair probe was observed
to spread 0.839 .. 0.998 across days on the same physically-unchanged chip
(relay dispatch weather — PERFORMANCE.md "MXU probe dispersion"), so on a
chip whose true ratio sits near the threshold, one draw could flip the
dtype.  Requiring every repeat to clear the bar makes a false bf16
engagement need ALL k draws to err high simultaneously.

Results (median + min/max + the raw pairs) are cached in-process and on
disk (``.mxu_probe.json``, keyed by device kind) so the probe's two small
compiles happen once per machine, not per run; legacy single-ratio cache
entries (no dispersion recorded) are ignored and re-probed.  Timing follows
PERFORMANCE.md "Measurement methodology": sync by reducing to a scalar on
device and reading 4 bytes — never ``block_until_ready`` through the relay.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Dict

logger = logging.getLogger(__name__)

_CACHE_PATH = Path(__file__).resolve().parents[2] / ".mxu_probe.json"
_BF16_ENGAGE_RATIO = 1.15
_DEFAULT_REPEATS = 3
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


def probe_bf16_stats(force: bool = False, repeats: int = _DEFAULT_REPEATS) -> Dict:
    """Measure ``t_f32 / t_bf16`` with dispersion for the attached backend.

    Returns ``{"ratio": median over repeats, "ratio_min": ..., "ratio_max":
    ..., "repeats": k, "t_f32_ms": [...], "t_bf16_ms": [...]}``.  > 1 means
    bf16 is faster.  Cached per device kind in .mxu_probe.json; a cached
    entry without dispersion fields (pre-round-4 format) is re-probed.
    """
    import jax
    import jax.numpy as jnp

    kind = jax.devices()[0].device_kind
    if not force:
        if kind in _memo:
            return _memo[kind]
        try:
            disk = json.loads(_CACHE_PATH.read_text())
            entry = disk.get(kind)
            if entry and "ratio_min" in entry:
                _memo[kind] = entry
                return entry
        except (OSError, ValueError):
            pass

    # interleaved fresh pairs: each repeat re-times BOTH dtypes, so slow
    # drift (relay weather) hits the pair together and cancels in the ratio
    t_f32, t_bf16 = [], []
    for _ in range(max(int(repeats), 1)):
        t_f32.append(_time_matmul(jnp.float32))
        t_bf16.append(_time_matmul(jnp.bfloat16))
    ratios = sorted(f / b for f, b in zip(t_f32, t_bf16))
    entry = {
        "ratio": round(ratios[len(ratios) // 2], 4),
        "ratio_min": round(ratios[0], 4),
        "ratio_max": round(ratios[-1], 4),
        "repeats": len(ratios),
        "t_f32_ms": [round(1e3 * t, 4) for t in t_f32],
        "t_bf16_ms": [round(1e3 * t, 4) for t in t_bf16],
    }
    logger.info(
        "MXU probe (%s): ratio median %.3f [min %.3f, max %.3f] over %d pairs",
        kind, entry["ratio"], entry["ratio_min"], entry["ratio_max"], entry["repeats"],
    )
    _memo[kind] = entry
    try:
        disk = {}
        try:
            disk = json.loads(_CACHE_PATH.read_text())
        except (OSError, ValueError):
            pass
        disk[kind] = entry
        _CACHE_PATH.write_text(json.dumps(disk, indent=2))
    except OSError:
        pass
    return entry


def probe_bf16_speedup(force: bool = False) -> float:
    """Median measured ``t_f32 / t_bf16`` for the attached default backend
    (see :func:`probe_bf16_stats` for the dispersion record)."""
    return float(probe_bf16_stats(force=force)["ratio"])


def resolve_compute_dtype(configured: str) -> str:
    """Map ``model.compute_dtype`` to a concrete dtype name.

    "auto" engages bfloat16 exactly when the probed bf16 MXU rate beats f32
    by >= 15% at the CONSERVATIVE end of the measured dispersion — every
    probe repeat must clear the bar, so relay-dispatch weather on one draw
    cannot flip the dtype (this v5e: median ~1.0 -> float32 stays).
    Explicit "float32"/"bfloat16" pass through unchanged.
    """
    if configured != "auto":
        return configured
    import jax

    if jax.default_backend() != "tpu":
        # auto only ever engages bf16 on a real MXU: host-CPU matmuls can
        # probe bf16-faster (this machine: 3.1x — XLA:CPU's f32 GEMM is the
        # slow path), but the CPU backend exists here for tests/fallbacks
        # where f32 parity with the quality pins matters more than speed,
        # and the ~8.8 TFLOP probe takes minutes there
        return "float32"
    try:
        stats = probe_bf16_stats()
    except Exception as exc:  # noqa: BLE001 — a probe failure must never
        # take down model construction; fall back to the safe default
        logger.warning("MXU probe failed (%s); compute_dtype=float32", exc)
        return "float32"
    choice = (
        "bfloat16" if stats["ratio_min"] >= _BF16_ENGAGE_RATIO else "float32"
    )
    logger.info(
        "compute_dtype=auto -> %s (bf16 speedup %.2f [%.2f, %.2f])",
        choice, stats["ratio"], stats["ratio_min"], stats["ratio_max"],
    )
    return choice
