"""Microbench: in-kernel row gather — indicator matmul vs dynamic gather.

The fused pair-head kernel forward (ops/pallas_pairhead.py) is ~59% of its
MXU FLOP bound; the hypothesis (PERFORMANCE.md "round-3 levers") is that the
VPU-built one-hot indicators serialize with the MXU passes.  This probe
measures, at scale-config shapes (3840 tiles x 1024 slots, 512-row lab
table), three in-kernel gather implementations:

  A  indicator matmul              [1024, 512] one-hot @ [512, H]
  B  dynamic gather, 128-wide rows table[idx] with the table padded to 128
     lanes (Mosaic's gather lowering requires 128-aligned row widths)
  C  dynamic gather, H-wide rows   table[idx] at the natural width (expected
     to fail to lower for H < 128 — kept to document the constraint)

Timing follows PERFORMANCE.md methodology: reduce to a scalar on device,
read 4 bytes.
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_E = 1024


def _kernel_indicator(idx_ref, tbl_ref, out_ref):
    n_rows = tbl_ref.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_E, n_rows), 1)
    p = (idx_ref[:].reshape(TILE_E, 1) == cols).astype(tbl_ref.dtype)
    rows = jnp.dot(p, tbl_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.sum(rows, axis=1)


def _kernel_dyngather(idx_ref, tbl_ref, out_ref, *, h: int):
    rows = jnp.take(tbl_ref[:], idx_ref[:], axis=0)
    out_ref[:] = jnp.sum(rows[:, :h].astype(jnp.float32), axis=1)


def build(call_kernel, num_tiles, tbl_shape, dtype):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_E,), lambda t: (t,)),
            pl.BlockSpec(tbl_shape, lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_E,), lambda t: (t,)),
    )
    f = pl.pallas_call(
        call_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles * TILE_E,), jnp.float32),
    )
    return jax.jit(lambda idx, tbl: f(idx, tbl).sum())


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(out)  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    v = float(out)  # scalar sync, 4-byte readback
    dt = (time.perf_counter() - t0) / iters
    return dt, v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=3840)
    ap.add_argument("--rows", type=int, default=512)
    ap.add_argument("--h", type=int, default=64)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, args.rows, args.tiles * TILE_E, dtype=np.int32))
    tbl = jnp.asarray(rng.standard_normal((args.rows, args.h)), dtype=dt)
    tbl128 = jnp.asarray(rng.standard_normal((args.rows, 128)), dtype=dt)
    tbl128 = tbl128.at[:, : args.h].set(tbl).at[:, args.h :].set(0.0)

    fa = build(_kernel_indicator, args.tiles, (args.rows, args.h), dt)
    ta, va = timeit(fa, idx, tbl)
    print(f"A indicator matmul  [{args.rows},{args.h}]  : {ta*1e3:8.3f} ms  sum={va:.1f}")

    try:
        fb = build(
            functools.partial(_kernel_dyngather, h=args.h),
            args.tiles, (args.rows, 128), dt,
        )
        tb, vb = timeit(fb, idx, tbl128)
        print(f"B dyn gather 128-w  [{args.rows},128]->{args.h}: {tb*1e3:8.3f} ms  sum={vb:.1f}")
        assert abs(va - vb) / max(abs(va), 1) < 1e-3, (va, vb)
    except Exception as e:  # noqa: BLE001
        print(f"B dyn gather 128-wide failed to lower: {type(e).__name__}: {str(e)[:300]}")

    try:
        fc = build(
            functools.partial(_kernel_dyngather, h=args.h),
            args.tiles, (args.rows, args.h), dt,
        )
        tc, vc = timeit(fc, idx, tbl)
        print(f"C dyn gather {args.h}-wide [{args.rows},{args.h}]  : {tc*1e3:8.3f} ms  sum={vc:.1f}")
    except Exception as e:  # noqa: BLE001
        print(f"C dyn gather {args.h}-wide failed to lower: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
