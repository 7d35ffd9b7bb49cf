"""Host-side TPU-lowering smoke for every hardware-pending Pallas kernel.

``jax.export(..., platforms=['tpu'])`` runs the full jax->StableHLO lowering
for the TPU platform ON THE CPU HOST — including the Pallas->Mosaic pass
that builds and serializes each kernel's Mosaic module into its
``tpu_custom_call``.  That surfaces the whole class of *lowering-level*
Mosaic rejections (layout/reshape/alignment rules, unsupported ops — see
PERFORMANCE.md "Mosaic lowering notes") without touching the chip, which
matters here because the remote device claim can be wedged for hours and a
Mosaic *compiler* crash wedges it further.

This is necessary-but-not-sufficient: Mosaic's backend compile still runs
on-device at load time, and some failures only appear there (e.g. the
square-gather cases that pass lowering but 500 the remote compile helper).
The on-hardware sequence in ROADMAP.md stays the source of truth; run this
FIRST, and treat any failure here as a guaranteed failure there.

Usage: python scripts/lower_check_tpu.py   (exit 1 if any check fails)
"""

from __future__ import annotations

import sys
import traceback

sys.path.insert(0, ".")

from multi_modal_gnn_tpu.utils.platform import force_cpu_devices

force_cpu_devices(8)

import jax
import jax.numpy as jnp
import numpy as np

FAILURES: list[str] = []


def run(name: str, fn, *args) -> None:
    try:
        exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
        txt = exp.mlir_module()
        n_calls = txt.count("tpu_custom_call")
        status = f"OK ({n_calls} tpu_custom_call)"
        if n_calls == 0:
            status = "OK but NO tpu_custom_call — kernel not on the Mosaic path?"
            FAILURES.append(name)
    except Exception as e:  # noqa: BLE001 — diagnostic harness
        status = f"FAILED: {type(e).__name__}: {str(e)[:200]}"
        FAILURES.append(name)
        if "--verbose" in sys.argv:
            traceback.print_exc()
    print(f"  {name:55s} {status}")


def main() -> None:
    rng = np.random.default_rng(0)

    # ---- windowed segment kernel (the round-1 aggregation workhorse) ----
    from multi_modal_gnn_tpu.graph.hetero import (
        WINDOW,
        build_gather_plan,
        build_window_plan,
        pad_edge_set,
        regroup_slots_by_lab_block,
        regroup_slots_by_lab_span,
    )
    from multi_modal_gnn_tpu.ops.pallas_segment import (
        _windowed_segment_sum_fwd,
        fused_table_aggregate,
        span_dma_aggregate,
    )

    print("windowed segment kernel:")
    e, num_dst, d = 8192, 512, 128
    src = rng.integers(0, 4096, e).astype(np.int32)
    dst = np.sort(rng.integers(0, num_dst, e).astype(np.int32))
    w_src, w_local, w_tm, k = build_window_plan(src, dst, num_dst)
    gathered = jnp.asarray(rng.normal(size=(len(w_src), d)), jnp.float32)
    wl, wt = jnp.asarray(w_local), jnp.asarray(w_tm)
    run("fwd f32", lambda g: _windowed_segment_sum_fwd(g, wl, wt, k, False), gathered)
    run(
        "fwd bf16 input",
        lambda g: _windowed_segment_sum_fwd(g.astype(jnp.bfloat16), wl, wt, k, False),
        gathered,
    )

    # ---- fused-table tier (VMEM-resident source, in-kernel gather) ----
    # force the indicator-matmul gather: that is what the chip runs
    # (_vmem_take_supported probes False against the real Mosaic backend,
    # but keys off default_backend, which is cpu during a host-side export)
    print("fused-table tier (indicator mode, as probed on hardware):")
    import multi_modal_gnn_tpu.ops.pallas_segment as pseg

    orig_probe = pseg._vmem_take_supported
    pseg._vmem_take_supported = lambda: False
    try:
        src_s = rng.integers(0, 480, e).astype(np.int32)
        es_small = pad_edge_set(src_s, dst, 480, num_dst)
        x_small = jnp.asarray(rng.normal(size=(480, d)), jnp.float32)
        run("fwd", lambda x: fused_table_aggregate(x, es_small, "mean", interpret=False), x_small)
        run(
            "grad",
            jax.grad(
                lambda x: jnp.sum(fused_table_aggregate(x, es_small, "mean", interpret=False))
            ),
            x_small,
        )
    finally:
        pseg._vmem_take_supported = orig_probe

    # ---- span-DMA tier (HBM source table, in-kernel block DMA) ----
    print("span-DMA tier:")
    from multi_modal_gnn_tpu.graph.hetero import SPAN_MIN_SRC

    n_src = SPAN_MIN_SRC + 900
    e2 = 80_000
    src2 = rng.integers(0, n_src, e2).astype(np.int32)
    dst2 = rng.integers(0, 300, e2).astype(np.int32)
    fwd_es = pad_edge_set(src2, dst2, n_src, 300, src_span_rows=256)
    rev_es = pad_edge_set(dst2, src2, 300, n_src)
    x_big = jnp.asarray(rng.normal(size=(n_src, d)), jnp.float32)
    if fwd_es.span_src is None:
        print("  span plan refused (inflation gate) — SKIP")
    else:
        run(
            "fwd (make_async_copy lowering)",
            lambda x: span_dma_aggregate(x, fwd_es, rev_es, "mean", interpret=False),
            x_big,
        )
        run(
            "grad (reverse-plan backward)",
            jax.grad(
                lambda x: jnp.sum(
                    span_dma_aggregate(x, fwd_es, rev_es, "mean", interpret=False)
                )
            ),
            x_big,
        )

    # ---- fused pair-head kernel, every mode ----
    print("fused pair-head kernel:")
    from multi_modal_gnn_tpu.ops.pallas_pairhead import (
        fused_pair_head,
        fused_pair_head_dual,
    )

    num_p, num_l, H0, H1, B = 1024, 512, 64, 32, 6000
    p_idx = rng.integers(0, num_p, B).astype(np.int32)
    l_idx = rng.integers(0, num_l, B).astype(np.int32)
    plan = build_gather_plan(p_idx, num_p)
    win_src = np.asarray(plan.win_src)
    win_local = np.asarray(plan.win_local)
    real = win_local < WINDOW
    l_s = np.where(real, l_idx[win_src], 0).astype(np.int32)
    proj_p = jnp.asarray(rng.normal(size=(num_p, H0)), jnp.float32)
    proj_l = jnp.asarray(rng.normal(size=(num_l, H0)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(H0, H1)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(H1,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(H1,)) * 0.1, jnp.float32)
    b2 = jnp.float32(0.3)
    seed = jnp.zeros(2, jnp.uint32)
    n_tiles = len(np.asarray(plan.win_tile_map))

    def head(pp, pl, *, rate=0.0, tile_mask=None, lbm=None, lbr=0, span=False,
             local=None, tmap=None, labs=None, nw=None):
        return fused_pair_head(
            pp, pl, w1, b1, w2, b2,
            jnp.asarray(l_s if labs is None else labs),
            plan.win_local if local is None else jnp.asarray(local),
            plan.win_tile_map if tmap is None else jnp.asarray(tmap),
            seed, tile_mask, lbm,
            plan.num_windows if nw is None else nw,
            rate, False, lbr, span,
        )

    run("fwd", head, proj_p, proj_l)
    run("grad", jax.grad(lambda pp, pl: jnp.sum(head(pp, pl)), argnums=(0, 1)), proj_p, proj_l)
    run(
        "fwd dropout rate=0.3 (in-kernel PRNG)",
        lambda pp, pl: head(pp, pl, rate=0.3), proj_p, proj_l,
    )
    run(
        "grad dropout rate=0.3 (re-seeded recompute)",
        jax.grad(lambda pp, pl: jnp.sum(head(pp, pl, rate=0.3)), argnums=(0, 1)),
        proj_p, proj_l,
    )
    tm_arr = jnp.asarray((np.arange(n_tiles) % 2).astype(np.int32))
    run("fwd tile_mask (degree predication)",
        lambda pp, pl: head(pp, pl, tile_mask=tm_arr), proj_p, proj_l)

    for mode, fn_regroup in (("block", regroup_slots_by_lab_block),
                             ("span", regroup_slots_by_lab_span)):
        moves, new_len, local2, tmap2, base = fn_regroup(
            win_local, np.asarray(plan.win_tile_map), l_s, num_l, 128
        )
        m = moves >= 0
        l2 = np.zeros(new_len, np.int32)
        l2[moves[m]] = l_s[m]
        kwargs = dict(local=local2, tmap=tmap2, labs=l2, lbm=jnp.asarray(base),
                      lbr=128, span=(mode == "span"), nw=plan.num_windows)
        run(f"fwd narrow lab tiles ({mode} mode)",
            lambda pp, pl, kw=kwargs: head(pp, pl, **kw), proj_p, proj_l)
        run(f"grad narrow lab tiles ({mode} mode)",
            jax.grad(lambda pp, pl, kw=kwargs: jnp.sum(head(pp, pl, **kw)),
                     argnums=(0, 1)),
            proj_p, proj_l)

    seed4 = jnp.zeros(4, jnp.uint32)
    ones = jnp.ones(n_tiles, jnp.int32)
    run(
        "dual-head fwd",
        lambda pp, pl: fused_pair_head_dual(
            pp, pl, w1, b1, w2, b2, pp, pl, w1, b1, w2, b2,
            jnp.asarray(l_s), plan.win_local, plan.win_tile_map, seed4,
            ones, ones, plan.num_windows, 0.0, False,
        )[1],
        proj_p, proj_l,
    )

    # ---- per-shard kernel under shard_map (vma-carrying out_shape) ----
    print("per-shard kernel under shard_map:")
    from jax.sharding import PartitionSpec as P

    from multi_modal_gnn_tpu.graph.hetero import HeteroGraph
    from multi_modal_gnn_tpu.graph.schema import PATIENT_LAB
    from multi_modal_gnn_tpu.ops.segment import aggregate_neighbors
    from multi_modal_gnn_tpu.parallel.mesh import make_mesh
    from multi_modal_gnn_tpu.parallel.sharding import graph_pspecs, shard_graph

    es, host = pad_edge_set(src, dst, 4096, num_dst, return_host=True)
    graph = HeteroGraph(
        edges={PATIENT_LAB: es},
        patient_lab_degree=jnp.zeros(4096, jnp.int32),
        node_counts=(("lab", num_dst), ("patient", 4096)),
    )
    mesh = make_mesh(8)
    g = shard_graph(graph, mesh, host_edges={PATIENT_LAB: host})
    x = jnp.asarray(rng.normal(size=(4096, d)), jnp.float32)

    # the dispatch picks interpret (and the jnp fallback) off the default
    # backend; pretend to be on TPU for the lowering trace only
    orig_backend = jax.default_backend
    jax.default_backend = lambda: "tpu"
    try:
        def body(graph, xr):
            return aggregate_neighbors(
                xr, graph.edges[PATIENT_LAB], "mean", impl="pallas", axis_name="data"
            )

        sm = jax.shard_map(body, mesh=mesh, in_specs=(graph_pspecs(g), P()), out_specs=P())
        run("fwd (vma out_shape)", sm, g, x)
        run(
            # value_and_grad: the kernel is linear in x, so a grad-only trace
            # dead-code-eliminates the forward custom call entirely
            "value+grad",
            jax.shard_map(
                lambda graph, xr: jax.value_and_grad(
                    lambda xv: jnp.sum(body(graph, xv))
                )(xr),
                mesh=mesh, in_specs=(graph_pspecs(g), P()), out_specs=(P(), P()),
            ),
            g, x,
        )
    finally:
        jax.default_backend = orig_backend

    # ---- the FULL single-chip train step, all Pallas tiers engaged ----
    print("full train step (windowed aggregation + fused pair heads + adam):")
    import dataclasses

    from multi_modal_gnn_tpu.config import Config
    from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle
    from multi_modal_gnn_tpu.models.factory import build_model
    from multi_modal_gnn_tpu.training.masker import EdgeMasker
    from multi_modal_gnn_tpu.training.trainer import Trainer

    jax.default_backend = lambda: "tpu"
    try:
        cfg = Config()
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, use_pallas=True, dropout=0.2),
            graph=dataclasses.replace(cfg.graph, dense_adjacency_max_bytes=0),
            train=dataclasses.replace(cfg.train, donate_state=False),
        )
        bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=5), cfg)
        t = Trainer(
            build_model(cfg, bundle.graph),
            bundle.graph,
            EdgeMasker(
                bundle.graph, seed=0,
                host_edges=bundle.patient_lab_host(), slot_major_train=True,
            ),
            cfg,
        )
        batch = t._get_batch("train")
        key = jax.random.PRNGKey(0)
        sup = t._draw_sup_mask(key, batch.valid)
        run(
            "train step (no dense tier, slot-major, dropout)",
            t._train_step_impl, t.state, t.graph, batch, t.lab_weights, sup, key,
        )
    finally:
        jax.default_backend = orig_backend

    # ---- flash-attention kernels (HGT; round 5) ------------------------
    print("flash attention (windowed flash softmax, fwd + dq + dkv):")
    from multi_modal_gnn_tpu.graph.attn_plan import AttnGroupPlan, _build_side
    from multi_modal_gnn_tpu.ops import pallas_attention as pa

    from multi_modal_gnn_tpu.ops import pallas_segment as ps

    jax.default_backend = lambda: "tpu"
    try:
        h, nh = 128, 4
        num_dst, num_src, num_edges = 512, 300, 60_000
        src = rng.integers(0, num_src, num_edges).astype(np.int32)
        dstv = rng.integers(0, num_dst, num_edges).astype(np.int32)

        # pin the in-kernel gather mode the chip actually runs: indicator
        # (tala is a hardware-measured negative and take fails lowering —
        # ops/pallas_attention._tala_supported / _gather_mode)
        ps._VMEM_TAKE_SUPPORTED["tpu"] = False

        for label, res_max, span in (("resident", 4096, 128), ("span", 0, 128)):
            fwd_side = _build_side(src, dstv, num_dst, num_src, span, res_max)
            rev_side = _build_side(dstv, src, num_src, num_dst, span, res_max)
            if fwd_side is None or rev_side is None:
                print(f"  attention {label}: span plan unavailable (skipped)")
                continue
            plan = AttnGroupPlan(
                fwd=fwd_side, rev=rev_side,
                num_src_total=num_src, num_dst=num_dst, num_edges=num_edges,
            )
            q = jnp.asarray(rng.normal(size=(num_dst, h)), jnp.float32)
            k = jnp.asarray(rng.normal(size=(num_src, h)), jnp.float32)
            v = jnp.asarray(rng.normal(size=(num_src, h)), jnp.float32)

            def fwd_fn(q_, k_, v_, plan=plan):
                return pa.flash_attention_group(q_, k_, v_, plan, nh, interpret=False)

            run(f"attention fwd ({label})", fwd_fn, q, k, v)
            run(
                f"attention value+grad ({label})",
                jax.value_and_grad(
                    lambda q_, k_, v_, plan=plan: jnp.sum(
                        pa.flash_attention_group(q_, k_, v_, plan, nh, interpret=False) ** 2
                    ),
                    argnums=(0, 1, 2),
                ),
                q, k, v,
            )
    finally:
        jax.default_backend = orig_backend
        ps._VMEM_TAKE_SUPPORTED.pop("tpu", None)

    print()
    if FAILURES:
        print(f"{len(FAILURES)} LOWERING CHECK(S) FAILED: {FAILURES}")
        sys.exit(1)
    print("all TPU lowerings pass on the host (backend compile still pending hardware)")


if __name__ == "__main__":
    main()
