"""Host-side TPU lowering regression tests.

``jax.export(platforms=['tpu'])`` runs the Pallas->Mosaic lowering pass on
the CPU host, so the whole class of lowering-level Mosaic rejections
(layout/reshape/alignment rules — PERFORMANCE.md "Mosaic lowering notes")
is testable WITHOUT a chip.  The CPU interpret-mode tests pin numerics;
these pin that each kernel family still *lowers* for the real platform.
Backend compilation (tpu_compile_helper) remains hardware-only — the full
sweep lives in scripts/lower_check_tpu.py, run before the on-chip sequence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_gnn_tpu.graph.hetero import (
    SPAN_MIN_SRC,
    WINDOW,
    build_gather_plan,
    build_window_plan,
    pad_edge_set,
    regroup_slots_by_lab_span,
)


def _export_ok(fn, *args) -> str:
    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
    txt = exp.mlir_module()
    assert "tpu_custom_call" in txt, "kernel fell off the Mosaic path"
    return txt


def test_windowed_segment_kernel_lowers():
    rng = np.random.default_rng(0)
    from multi_modal_gnn_tpu.ops.pallas_segment import _windowed_segment_sum_fwd

    e, num_dst, d = 4096, 256, 64
    src = rng.integers(0, 1000, e).astype(np.int32)
    dst = np.sort(rng.integers(0, num_dst, e).astype(np.int32))
    _, w_local, w_tm, k = build_window_plan(src, dst, num_dst)
    g = jnp.asarray(rng.normal(size=(len(w_local), d)), jnp.float32)
    wl, wt = jnp.asarray(w_local), jnp.asarray(w_tm)
    _export_ok(lambda x: _windowed_segment_sum_fwd(x, wl, wt, k, False), g)


def test_span_dma_kernel_lowers():
    """The in-kernel make_async_copy double-buffered block DMA."""
    rng = np.random.default_rng(0)
    from multi_modal_gnn_tpu.ops.pallas_segment import span_dma_aggregate

    n_src, e = SPAN_MIN_SRC + 900, 80_000
    src = rng.integers(0, n_src, e).astype(np.int32)
    dst = rng.integers(0, 300, e).astype(np.int32)
    fwd = pad_edge_set(src, dst, n_src, 300, src_span_rows=256)
    rev = pad_edge_set(dst, src, 300, n_src)
    if fwd.span_src is None:
        pytest.skip("span plan refused at these shapes")
    x = jnp.asarray(rng.normal(size=(n_src, 64)), jnp.float32)
    _export_ok(lambda xv: span_dma_aggregate(xv, fwd, rev, "mean", interpret=False), x)


def test_pair_head_span_dropout_lowers():
    """The fused pair head in its riskiest mode: span-bounded lab tiles
    (arbitrary-base dynamic slice) + in-kernel dropout PRNG, fwd and bwd."""
    rng = np.random.default_rng(0)
    from multi_modal_gnn_tpu.ops.pallas_pairhead import fused_pair_head

    num_p, num_l, H0, H1, B = 512, 256, 64, 32, 3000
    p_idx = rng.integers(0, num_p, B).astype(np.int32)
    l_idx = rng.integers(0, num_l, B).astype(np.int32)
    plan = build_gather_plan(p_idx, num_p)
    win_src = np.asarray(plan.win_src)
    win_local = np.asarray(plan.win_local)
    real = win_local < WINDOW
    l_s = np.where(real, l_idx[win_src], 0).astype(np.int32)
    moves, new_len, local2, tmap2, base = regroup_slots_by_lab_span(
        win_local, np.asarray(plan.win_tile_map), l_s, num_l, 128
    )
    m = moves >= 0
    l2 = np.zeros(new_len, np.int32)
    l2[moves[m]] = l_s[m]

    proj_p = jnp.asarray(rng.normal(size=(num_p, H0)), jnp.float32)
    proj_l = jnp.asarray(rng.normal(size=(num_l, H0)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(H0, H1)) * 0.1, jnp.float32)
    b1 = jnp.zeros(H1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(H1,)) * 0.1, jnp.float32)
    seed = jnp.zeros(2, jnp.uint32)

    def loss(pp, pl):
        out = fused_pair_head(
            pp, pl, w1, b1, w2, jnp.float32(0.0), jnp.asarray(l2),
            jnp.asarray(local2), jnp.asarray(tmap2), seed, None,
            jnp.asarray(base), plan.num_windows, 0.3, False, 128, True,
        )
        return jnp.sum(out)

    _export_ok(jax.value_and_grad(loss, argnums=(0, 1)), proj_p, proj_l)


def test_sharded_kernel_under_shard_map_lowers():
    """pallas_call with a vma-carrying out_shape inside shard_map."""
    rng = np.random.default_rng(0)
    from jax.sharding import PartitionSpec as P

    from multi_modal_gnn_tpu.graph.hetero import HeteroGraph
    from multi_modal_gnn_tpu.graph.schema import PATIENT_LAB
    from multi_modal_gnn_tpu.ops.segment import aggregate_neighbors
    from multi_modal_gnn_tpu.parallel.mesh import make_mesh
    from multi_modal_gnn_tpu.parallel.sharding import graph_pspecs, shard_graph

    e, num_src, num_dst = 8192, 2048, 256
    src = rng.integers(0, num_src, e).astype(np.int32)
    dst = rng.integers(0, num_dst, e).astype(np.int32)
    es, host = pad_edge_set(src, dst, num_src, num_dst, return_host=True)
    graph = HeteroGraph(
        edges={PATIENT_LAB: es},
        patient_lab_degree=jnp.zeros(num_src, jnp.int32),
        node_counts=(("lab", num_dst), ("patient", num_src)),
    )
    mesh = make_mesh(8)
    g = shard_graph(graph, mesh, host_edges={PATIENT_LAB: host})
    x = jnp.asarray(rng.normal(size=(num_src, 64)), jnp.float32)

    orig = jax.default_backend
    jax.default_backend = lambda: "tpu"  # dispatch picks non-interpret
    try:
        def body(graph, xr):
            return aggregate_neighbors(
                xr, graph.edges[PATIENT_LAB], "mean", impl="pallas", axis_name="data"
            )

        _export_ok(
            jax.shard_map(body, mesh=mesh, in_specs=(graph_pspecs(g), P()), out_specs=P()),
            g, x,
        )
    finally:
        jax.default_backend = orig
