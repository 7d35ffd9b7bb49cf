"""Hardware re-validation runbook for the fused pair-head kernel.

CPU tests cannot exercise the in-kernel PRNG (pltpu.prng_* has no CPU
lowering) or Mosaic's lowering rules, so after any kernel change the
following must re-run on a live chip (ROADMAP "Re-validate on hardware").
This script runs the SAFE checks in order and stops before anything that
could crash the remote compiler (a Mosaic crash wedges the device claim):

  1. in-kernel dropout keep-rate: fused forward at rate r must zero ~r of
     the real slots beyond the relu/mask zeros (the signed/unsigned
     threshold fix, commit 8591527);
  2. forward/backward parity of the compiled (non-interpret) kernel vs the
     unfused reference at a production-like shape, rate=0;
  3. (--span) the arbitrary-base span-tile kernel — FIRST hardware compile
     of the dynamic-slice lowering.  Run LAST, once 1-2 are green and any
     bench numbers you care about are already recorded.
  4. (--span-dma) the span-DMA aggregation kernel — FIRST hardware compile
     of the in-kernel make_async_copy / ANY-memory-space / DMA-semaphore
     lowering (ops/pallas_segment.span_dma_aggregate).  Same crash-risk
     ordering as --span: run after everything else is recorded.  If Mosaic
     rejects it, set MMGNN_SPAN_DMA=0 (dispatch falls back to the paired
     tier) and record the failure in ROADMAP.
  5. (--shard-kernel) the per-shard windowed kernel under shard_map on a
     1-device mesh — validates the NON-interpret pallas-under-shard_map
     lowering (vma-carrying out_shape + Mosaic) that CPU tests emulate with
     the jnp reference.  MMGNN_SHARD_KERNEL=0 is the escape hatch.

Usage: python scripts/validate_tpu.py [--span] [--span-dma] [--shard-kernel]
       [--rate 0.2]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _problem(span: bool, rng_seed: int = 0):
    import numpy as np

    from multi_modal_gnn_tpu.graph.hetero import (
        WINDOW,
        GatherPlan,
        build_gather_plan,
        regroup_slots_by_lab_span,
    )
    import jax.numpy as jnp

    rng = np.random.default_rng(rng_seed)
    num_p, num_l, H0, H1, B = 3000, 500, 64, 32, 200_000
    p_idx = rng.integers(0, num_p, B).astype(np.int32)
    l_idx = rng.integers(0, num_l, B).astype(np.int32)
    plan = build_gather_plan(p_idx, num_p)
    win_src = np.asarray(plan.win_src)
    win_local = np.asarray(plan.win_local)
    real = win_local < WINDOW
    l_s = np.where(real, l_idx[win_src], 0).astype(np.int32)
    p_s = np.where(real, p_idx[win_src], 0).astype(np.int32)
    if span:
        moves, e2, local2, tmap2, bases = regroup_slots_by_lab_span(
            win_local, np.asarray(plan.win_tile_map), l_s, num_l, 256
        )

        def relay(a, fill):
            out = np.full(e2, fill, a.dtype)
            m = moves >= 0
            out[moves[m]] = a[m]
            return out

        p_s, l_s = relay(p_s, 0), relay(l_s, 0)
        plan = GatherPlan(
            win_src=jnp.zeros(e2, jnp.int32),
            win_local=jnp.asarray(local2),
            win_tile_map=jnp.asarray(tmap2),
            num_windows=plan.num_windows,
            num_rows=plan.num_rows,
            identity=True,
            lab_block_map=jnp.asarray(bases),
            lab_block_rows=256,
            lab_span_mode=True,
        )
        win_local = local2
        real = local2 < WINDOW
    params = dict(
        proj_p=rng.standard_normal((num_p, H0)).astype(np.float32),
        proj_l=rng.standard_normal((num_l, H0)).astype(np.float32),
        w1=(rng.standard_normal((H0, H1)) * 0.1).astype(np.float32),
        b1=(rng.standard_normal(H1) * 0.1).astype(np.float32),
        w2=(rng.standard_normal(H1) * 0.1).astype(np.float32),
        b2=np.float32(0.3),
    )
    return plan, p_s, l_s, real, params


def _fused(plan, l_s, params, rate, seed):
    import jax.numpy as jnp

    from multi_modal_gnn_tpu.ops.pallas_pairhead import fused_pair_head

    return fused_pair_head(
        *map(jnp.asarray, params.values()), jnp.asarray(l_s),
        plan.win_local, plan.win_tile_map, seed, None,
        getattr(plan, "lab_block_map", None),
        plan.num_windows, rate, False,
        getattr(plan, "lab_block_rows", 0),
        getattr(plan, "lab_span_mode", False),
    )


def _check_shard_kernel() -> None:
    """Per-shard windowed kernel under shard_map, 1-device mesh: the first
    NON-interpret compile of pallas_call inside shard_map (vma-carrying
    out_shape).  CPU tests route this through a jnp reference (the hlo
    interpreter cannot run it — ops/pallas_segment._windowed_segment_sum_ref),
    so the real lowering is hardware-only."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from multi_modal_gnn_tpu.graph.hetero import HeteroGraph, pad_edge_set
    from multi_modal_gnn_tpu.graph.schema import PATIENT_LAB
    from multi_modal_gnn_tpu.ops.segment import aggregate_neighbors
    from multi_modal_gnn_tpu.parallel.sharding import graph_pspecs, shard_graph

    rng = np.random.default_rng(0)
    num_src, num_dst, e = 5_000, 700, 200_000
    src = rng.integers(0, num_src, e).astype(np.int32)
    dst = rng.integers(0, num_dst, e).astype(np.int32)
    es, host = pad_edge_set(src, dst, num_src, num_dst, return_host=True)
    graph = HeteroGraph(
        edges={PATIENT_LAB: es},
        patient_lab_degree=jnp.zeros(num_src, jnp.int32),
        node_counts=(("lab", num_dst), ("patient", num_src)),
    )
    mesh = jax.make_mesh((1,), ("data",))
    g = shard_graph(graph, mesh, host_edges={PATIENT_LAB: host})
    x = jnp.asarray(rng.normal(size=(num_src, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(num_dst, 128)).astype(np.float32))

    def body(graph, xr):
        out = aggregate_neighbors(
            xr, graph.edges[PATIENT_LAB], "mean", impl="pallas", axis_name="data"
        )
        return jnp.sum(out * w)

    got = float(
        jax.jit(
            jax.shard_map(body, mesh=mesh, in_specs=(graph_pspecs(g), P()), out_specs=P())
        )(g, x)
    )
    want = float(jnp.sum(aggregate_neighbors(x, es, "mean", impl="xla") * w))
    print(f"5. shard_map windowed kernel on hardware: {got:.4f} vs xla {want:.4f}")
    assert abs(got - want) < 1e-2 * max(abs(want), 1.0)

    def grad_body(graph, xr):
        return jax.grad(lambda xv: body(graph, xv))(xr)

    gsh = jax.jit(
        jax.shard_map(grad_body, mesh=mesh, in_specs=(graph_pspecs(g), P()), out_specs=P())
    )(g, x)
    gref = jax.grad(
        lambda xv: jnp.sum(aggregate_neighbors(xv, es, "mean", impl="xla") * w)
    )(x)
    gerr = float(jnp.max(jnp.abs(gsh - gref)))
    print(f"5b. shard_map windowed kernel bwd parity: max err {gerr:.2e}")
    assert gerr < 1e-3


def _check_span_dma() -> None:
    """First hardware compile of the span-DMA aggregation kernel: forward
    + gradient parity vs the XLA segment path at scale-like density, plus a
    timing loop vs the paired windowed tier."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multi_modal_gnn_tpu.graph.hetero import pad_edge_set
    from multi_modal_gnn_tpu.ops.pallas_segment import (
        gather_segment_aggregate_paired,
        span_dma_aggregate,
    )
    from multi_modal_gnn_tpu.ops.segment import aggregate_neighbors

    rng = np.random.default_rng(0)
    num_src, num_dst, e = 50_000, 512, 2_000_000  # scale-like density
    src = rng.integers(0, num_src, size=e).astype(np.int32)
    dst = rng.integers(0, num_dst, size=e).astype(np.int32)
    fwd = pad_edge_set(src, dst, num_src, num_dst, src_span_rows=256)
    rev = pad_edge_set(dst, src, num_dst, num_src)
    assert fwd.span_src is not None, "span plan refused — density too low"
    x = jnp.asarray(rng.normal(size=(num_src, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(num_dst, 128)).astype(np.float32))

    got = span_dma_aggregate(x, fwd, rev, "mean", interpret=False)
    want = aggregate_neighbors(x, fwd, "mean", impl="xla")
    err = float(jnp.max(jnp.abs(got - want)))
    print(f"4. span-DMA fwd parity on hardware: max err {err:.2e}")
    assert err < 1e-3

    g = jax.grad(
        lambda a: jnp.sum(span_dma_aggregate(a, fwd, rev, "mean", interpret=False) * w)
    )(x)
    gw = jax.grad(
        lambda a: jnp.sum(aggregate_neighbors(a, fwd, "mean", impl="xla") * w)
    )(x)
    gerr = float(jnp.max(jnp.abs(g - gw)))
    print(f"4b. span-DMA bwd parity on hardware: max err {gerr:.2e}")
    assert gerr < 1e-3

    # relay-safe timing: reduce to a scalar, read 4 bytes (PERFORMANCE.md)
    span_step = jax.jit(lambda a: jnp.sum(span_dma_aggregate(a, fwd, rev, "mean", interpret=False)))
    paired_step = jax.jit(lambda a: jnp.sum(gather_segment_aggregate_paired(a, fwd, rev, "mean", interpret=False)))
    for name, fn in (("span-dma", span_step), ("paired(gather)", paired_step)):
        float(fn(x))  # compile + warm
        t0 = time.perf_counter()
        reps = 20
        acc = 0.0
        for _ in range(reps):
            acc += float(fn(x))
        dt = (time.perf_counter() - t0) / reps
        print(f"4c. {name}: {dt*1e3:.2f} ms per {e/1e6:.1f}M-edge traversal "
              f"({e/dt/1e6:.1f}M edges/s)")


def _check_attn() -> None:
    """First hardware compile of the flash-attention kernels
    (ops/pallas_attention.py): fwd + dq/dkv backward parity vs the XLA
    segment reference on (a) a both-sides-resident layout and (b) a
    both-sides-span scale-like layout, plus a timing loop vs the segment
    tier at the span shape.  Falling back to the segment tier
    (model.extras.hgt_flash: off) is the escape hatch.  Gather mode on
    this chip is "indicator" (tala is a hardware-measured negative —
    ops/pallas_attention._tala_supported; take 500s the remote
    compiler — PERFORMANCE.md "Mosaic lowering notes")."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multi_modal_gnn_tpu.graph.attn_plan import AttnGroupPlan, _build_side
    from multi_modal_gnn_tpu.ops.pallas_attention import (
        flash_attention_group,
        flash_attention_ref,
    )

    rng = np.random.default_rng(0)
    h, nh = 128, 4
    cases = (
        ("resident", 400, 480, 60_000),
        ("span (scale-like)", 4096, 50_000, 2_000_000),
    )
    for label, num_dst, num_src, e in cases:
        src = rng.integers(0, num_src, e).astype(np.int32)
        dst = rng.integers(0, num_dst, e).astype(np.int32)
        fwd_side = _build_side(src, dst, num_dst, num_src, 128, 512)
        rev_side = _build_side(dst, src, num_src, num_dst, 128, 512)
        assert fwd_side is not None and rev_side is not None, (
            f"attn plan refused for {label} — density gate")
        plan = AttnGroupPlan(
            fwd=fwd_side, rev=rev_side,
            num_src_total=num_src, num_dst=num_dst, num_edges=e,
        )
        q = jnp.asarray(rng.normal(size=(num_dst, h)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(num_src, h)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(num_src, h)).astype(np.float32))

        got = np.asarray(flash_attention_group(q, k, v, plan, nh, interpret=False))
        want = np.asarray(flash_attention_ref(q, k, v, plan, nh))
        # attention outputs are convex combos of N(0,1) values — O(1) scale;
        # two default-precision paths differ by ~1e-2 abs (PERFORMANCE.md
        # "Precision model"), softmax roughly preserves that family
        err = float(np.abs(got - want).max())
        print(f"6. flash-attn fwd parity [{label}]: max err {err:.2e}")
        assert err < 5e-2, "flash fwd out of family with the XLA reference"

        w = jnp.asarray(rng.normal(size=(num_dst, h)).astype(np.float32))
        gq, gk, gv = jax.grad(
            lambda q_, k_, v_: jnp.sum(
                flash_attention_group(q_, k_, v_, plan, nh, interpret=False) * w
            ),
            argnums=(0, 1, 2),
        )(q, k, v)
        rq, rk, rv = jax.grad(
            lambda q_, k_, v_: jnp.sum(
                flash_attention_ref(q_, k_, v_, plan, nh) * w
            ),
            argnums=(0, 1, 2),
        )(q, k, v)
        for name, a, b in (("dq", gq, rq), ("dk", gk, rk), ("dv", gv, rv)):
            ge = float(jnp.max(jnp.abs(a - b)))
            scale_ref = float(jnp.max(jnp.abs(b))) or 1.0
            print(f"6b. flash-attn {name} parity [{label}]: max err {ge:.2e} "
                  f"(ref scale {scale_ref:.1f})")
            assert ge < 5e-2 * max(scale_ref, 1.0), f"{name} out of family"

        if "span" in label:
            # relay-safe timing (scalar readback): flash vs segment tier
            def seg_fn(q_, k_, v_):
                out = flash_attention_ref(q_, k_, v_, plan, nh)
                return jnp.sum(out)

            flash_fn = jax.jit(
                lambda q_, k_, v_: jnp.sum(
                    flash_attention_group(q_, k_, v_, plan, nh, interpret=False)
                )
            )
            for name, fn in (("flash", flash_fn), ("segment(xla)", jax.jit(seg_fn))):
                float(fn(q, k, v))  # compile + warm
                t0 = time.perf_counter()
                reps = 20
                for _ in range(reps):
                    float(fn(q, k, v))
                dt = (time.perf_counter() - t0) / reps
                print(f"6c. {name}: {dt*1e3:.2f} ms per {e/1e6:.1f}M-edge "
                      f"attention fwd ({e/dt/1e6:.1f}M edges/s)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=float, default=0.2)
    ap.add_argument("--span", action="store_true",
                    help="ALSO compile the span-tile kernel (Mosaic "
                         "dynamic-slice lowering; run last)")
    ap.add_argument("--span-dma", action="store_true",
                    help="ALSO compile the span-DMA aggregation kernel "
                         "(in-kernel make_async_copy lowering; run last)")
    ap.add_argument("--shard-kernel", action="store_true",
                    help="ALSO run the per-shard windowed kernel under "
                         "shard_map on a 1-device mesh (non-interpret "
                         "pallas-under-shard_map lowering)")
    ap.add_argument("--attn", action="store_true",
                    help="ONLY run the flash-attention kernel checks "
                         "(fwd/dq/dkv parity + timing; round 5)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    assert jax.default_backend() == "tpu", (
        f"needs a live TPU, got {jax.default_backend()} — probe first "
        "(scripts/probe_tpu.py)"
    )

    if args.attn:
        _check_attn()
        return

    # --- 1. dropout keep-rate on hardware -------------------------------
    plan, p_s, l_s, real, params = _problem(span=False)
    seed = jnp.asarray(np.array([123, 456], np.uint32))
    base = np.asarray(_fused(plan, l_s, params, 0.0, jnp.zeros(2, jnp.uint32)))
    out = np.asarray(_fused(plan, l_s, params, args.rate, seed))
    # a dropped h1 column only zeroes the OUTPUT if all columns drop; instead
    # compare against rate statistically via the output's changed fraction:
    # every slot whose relu survived gets an output shifted by the mask, and
    # P(out == base) ~ P(no unit dropped changed the sum) ~ 0 — so use the
    # cheap invariant that outputs are finite and the mean |out| scales by
    # ~1 (inverted dropout), plus the direct helper-level check below.
    r = real & np.isfinite(base) & (np.abs(base) > 1e-6)
    scale = np.abs(out[r]).mean() / np.abs(base[r]).mean()
    # E[out] is preserved by inverted dropout but E[|out|] is not: the mask
    # inflates the variance of the H1-term sum by ~1/keep, so |out| grows by
    # ~sqrt(1/keep) (~1.12 at rate 0.2) plus relu asymmetry.  Measured 1.28
    # on v5e (2026-08) at rate 0.2; a THRESHOLD bug instead shows as
    # frac_same ~ 1 in 1c (nothing dropped -> pure deterministic rescale).
    # Bounds derive from the configured rate (not hardcoded for 0.2).
    exp_scale = (1.0 / max(1.0 - args.rate, 1e-6)) ** 0.5
    lo = 1.0 + 0.25 * (exp_scale - 1.0) - 0.02  # sampling-noise headroom
    hi = exp_scale * 1.30  # relu asymmetry inflates above sqrt(1/keep)
    print(f"1. dropout fwd: |out| scale vs rate=0: {scale:.3f} "
          f"(expect ~{exp_scale:.2f}, bounds [{lo:.2f}, {hi:.2f}] "
          f"at rate {args.rate})")
    assert lo < scale < hi, "inverted-dropout scaling off — threshold bug?"

    # helper-level exact keep-rate with REAL pltpu bits: a kernel that dumps
    # the dropout mask is overkill; instead run the forward twice with the
    # same seed (determinism) and different seeds (decorrelation)
    out2 = np.asarray(_fused(plan, l_s, params, args.rate, seed))
    np.testing.assert_array_equal(out, out2)
    print("1b. same-seed determinism: OK")
    seed3 = jnp.asarray(np.array([999, 7], np.uint32))
    out3 = np.asarray(_fused(plan, l_s, params, args.rate, seed3))
    frac_same = float((out[r] == out3[r]).mean())
    print(f"1c. cross-seed decorrelation: {frac_same:.4f} equal (expect ~0)")
    assert frac_same < 0.05

    # --- 2. compiled-kernel parity, rate=0 ------------------------------
    # Precision model (measured on v5e, 2026-08): f32 jnp.dot at DEFAULT
    # precision does one-pass bf16 multiplies with f32 accumulation — both
    # inside Pallas and in XLA (rel err ~2e-3 each, but along different
    # contraction orders, so two default-precision paths differ by ~1e-2
    # abs).  The kernel deliberately matches the model's ambient precision
    # (pass precision=None so jax.default_matmul_precision applies), so the
    # right check is SELF-CALIBRATED: both the kernel and the unfused XLA
    # default path are compared against an exact float64 host reference,
    # and the kernel's error must be in-family with XLA's.
    h0_64 = np.maximum(
        params["proj_p"].astype(np.float64)[p_s]
        + params["proj_l"].astype(np.float64)[l_s], 0.0)
    h1_64 = np.maximum(h0_64 @ params["w1"].astype(np.float64)
                       + params["b1"].astype(np.float64), 0.0)
    ref64 = np.where(real, h1_64 @ params["w2"].astype(np.float64)
                     + float(params["b2"]), 0.0)
    pp, pl_, w1, b1, w2, b2 = map(jnp.asarray, params.values())
    h0 = jnp.maximum(pp[p_s] + pl_[l_s], 0.0)
    h1 = jnp.maximum(h0 @ w1 + b1, 0.0)
    xla_def = np.asarray(jnp.where(jnp.asarray(real), h1 @ w2 + b2, 0.0))
    err_kernel = float(np.abs(base - ref64).max())
    err_xla = float(np.abs(xla_def - ref64).max())
    print(f"2. compiled fwd vs f64 reference: kernel err {err_kernel:.2e}, "
          f"xla-default err {err_xla:.2e}")
    assert err_kernel <= max(4.0 * err_xla, 1e-4), (
        "kernel error out of family with XLA default precision")
    print("2. compiled fwd parity (precision-calibrated): OK")

    if not args.span and not args.span_dma and not args.shard_kernel:
        print("done (safe checks). Re-run with --span / --span-dma / "
              "--shard-kernel for the remaining kernel compiles once bench "
              "numbers are recorded.")
        return

    if args.shard_kernel:
        _check_shard_kernel()
    if args.span_dma:
        _check_span_dma()
    if not args.span:
        return

    # --- 3. span-tile kernel: first hardware compile --------------------
    plan_s, p_s2, l_s2, real2, params2 = _problem(span=True)
    got = np.asarray(_fused(plan_s, l_s2, params2, 0.0, jnp.zeros(2, jnp.uint32)))
    # f64 host reference + precision-calibrated tolerance (see check 2)
    h0_64 = np.maximum(
        params2["proj_p"].astype(np.float64)[p_s2]
        + params2["proj_l"].astype(np.float64)[l_s2], 0.0)
    h1_64 = np.maximum(h0_64 @ params2["w1"].astype(np.float64)
                       + params2["b1"].astype(np.float64), 0.0)
    ref64 = np.where(real2, h1_64 @ params2["w2"].astype(np.float64)
                     + float(params2["b2"]), 0.0)
    # calibrate against the unfused XLA default path on the SAME problem
    # (check 2's pattern): the kernel must be in-family with XLA's own
    # default-precision error, not merely under a fixed absolute bound
    pp2, pl2, w12, b12, w22, b22 = map(jnp.asarray, params2.values())
    h0s = jnp.maximum(pp2[p_s2] + pl2[l_s2], 0.0)
    h1s = jnp.maximum(h0s @ w12 + b12, 0.0)
    xla_def2 = np.asarray(jnp.where(jnp.asarray(real2), h1s @ w22 + b22, 0.0))
    err_span = float(np.abs(got - ref64).max())
    err_xla2 = float(np.abs(xla_def2 - ref64).max())
    print(f"3. span-tile kernel fwd vs f64 reference: kernel err "
          f"{err_span:.2e}, xla-default err {err_xla2:.2e}")
    assert err_span <= max(4.0 * err_xla2, 1e-4), (
        "span-tile kernel error out of family with XLA default precision")
    print("3. span-tile kernel fwd parity (precision-calibrated): OK")

    g = jnp.asarray(
        np.random.default_rng(5).standard_normal(len(l_s2)).astype(np.float32)
        * real2
    )
    grads = jax.grad(
        lambda a, b: jnp.sum(
            _fused(plan_s, l_s2, dict(params2, proj_p=a, proj_l=b), 0.0,
                   jnp.zeros(2, jnp.uint32)) * g
        ),
        argnums=(0, 1),
    )(jnp.asarray(params2["proj_p"]), jnp.asarray(params2["proj_l"]))
    for name, got_g in zip(("proj_p", "proj_l"), grads):
        assert np.isfinite(np.asarray(got_g)).all(), name
    print("3b. span-tile kernel bwd compiles + finite grads: OK")


if __name__ == "__main__":
    main()
