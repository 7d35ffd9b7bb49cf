"""Measure the single-vs-dual dw2 implementation drift (ROADMAP perf queue b).

The single-head pair-head backward computes dw2 on the MXU
(``dot_general`` contracting the slot axis); the dual kernel uses a VPU
masked sum.  This times ``_fused_bwd`` at the production scale-config shapes
with both forms (ops/pallas_pairhead._DW2_VPU toggle + jax.clear_caches())
so the drift can be unified on the measured winner.

Usage (real chip, one JAX process at a time):
    python scripts/bench_dw2.py [--iters 30]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--tiles", type=int, default=3812, help="scale config: 3.9M slots")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # per-backend cache dirs (compile-cache hygiene, same split as bench.py)
    cache = ".jax_cache" if jax.default_backend() == "tpu" else ".jax_cache_cpu"
    jax.config.update("jax_compilation_cache_dir", f"/root/repo/{cache}")

    from multi_modal_gnn_tpu.graph.hetero import TILE_E, WINDOW
    from multi_modal_gnn_tpu.ops import pallas_pairhead as pph

    # production scale-config shapes (PERFORMANCE.md device trace)
    num_windows, labs, h0, h1 = 782, 500, 64, 32
    e_win = args.tiles * TILE_E
    rng = np.random.default_rng(0)
    proj_p = jnp.asarray(rng.standard_normal((num_windows * WINDOW, h0)), jnp.float32)
    proj_l = jnp.asarray(rng.standard_normal((labs, h0)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((h0, h1)) * 0.1, jnp.float32)
    b1 = jnp.zeros((h1,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((h1,)) * 0.1, jnp.float32)
    b2 = jnp.zeros((1,), jnp.float32)
    # slot-major plan: tiles cycle through windows
    win_tile_map = jnp.asarray(
        np.sort(rng.integers(0, num_windows, args.tiles)), jnp.int32
    )
    win_local = jnp.asarray(rng.integers(0, WINDOW, e_win), jnp.int32)
    lab_idx = jnp.asarray(rng.integers(0, labs, e_win), jnp.int32)
    seed = jnp.zeros((2,), jnp.uint32)
    g_out = jnp.asarray(rng.standard_normal(e_win), jnp.float32)

    def run_once():
        outs = pph._fused_bwd(
            proj_p, proj_l, w1, b1, w2, b2, lab_idx, win_local, win_tile_map,
            seed, None, None, g_out, num_windows, 0.0, False, 0, False,
        )
        return float(jnp.sum(outs[2]))  # scalar readback = device sync

    for name, flag in (("mxu_dot_general", False), ("vpu_masked_sum", True)):
        pph._DW2_VPU = flag
        jax.clear_caches()
        run_once()  # compile + warm
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            run_once()
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2]
        print(f"dw2={name}: median {1e3 * med:.2f} ms over {args.iters} iters "
              f"(p10 {1e3 * times[len(times) // 10]:.2f}, "
              f"p90 {1e3 * times[9 * len(times) // 10]:.2f})")
    # restore the module DEFAULT (VPU — the measured winner) and drop the
    # kernels traced under the deselected form
    pph._DW2_VPU = True
    jax.clear_caches()


if __name__ == "__main__":
    main()
