"""Span-DMA aggregation tier (ops/pallas_segment.span_dma_aggregate).

For relations whose SOURCE table exceeds VMEM (the patient axis at 10k+
rows), the graph build re-lays each destination window's edges sorted by
source so every TILE_E tile's real sources live in one ``span_rows``-row
contiguous span of the table; the kernel DMAs that block into VMEM scratch
(double-buffered) and gathers in-kernel — no E x D HBM gather exists in the
forward at all.  These tests pin, in interpret mode (exact numpy
semantics, incl. the DMA emulation):

  * plan invariants: slot conservation, 16-aligned bases, span containment,
    monotone window tiles;
  * forward parity (mean + sum) with the XLA segment path;
  * gradient parity through the custom VJP (reverse-plan backward);
  * dispatch: aggregate_neighbors(impl="pallas") routes big-src relations
    through the tier and the MMGNN_SPAN_DMA=0 escape hatch disables it;
  * serialization round-trip re-derives the plan.

No reference analogue: the reference's aggregation is PyG's torch-scatter
CUDA path (requirements.txt:13-22); this tier is TPU-native machinery.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_modal_gnn_tpu.graph.hetero import (
    SPAN_BASE_ALIGN,
    SPAN_MIN_SRC,
    TILE_E,
    WINDOW,
    build_src_span_plan,
    pad_edge_set,
)
from multi_modal_gnn_tpu.ops.pallas_segment import (
    span_dma_aggregate,
    span_dma_applicable,
)
from multi_modal_gnn_tpu.ops.segment import aggregate_neighbors

NUM_SRC = SPAN_MIN_SRC + 900  # over the plan-build gate
NUM_DST = 300
# the tier targets DENSE windows (edges per 128-dst window >> num_src, as in
# the 5M-edge scale configs): a 1024-slot tile then spans few source rows.
# 80k edges / 3 windows over ~5k sources -> ~190-row tile spans, inside 256.
NUM_EDGES = 80_000
SPAN_ROWS = 256


def _edge_sets(seed=0, num_src=NUM_SRC, num_dst=NUM_DST, num_edges=NUM_EDGES,
               span_rows=SPAN_ROWS):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, num_src, size=num_edges).astype(np.int32)
    dst = rng.integers(0, num_dst, size=num_edges).astype(np.int32)
    fwd = pad_edge_set(src, dst, num_src, num_dst, src_span_rows=span_rows)
    rev = pad_edge_set(dst, src, num_dst, num_src)
    return src, dst, fwd, rev


@pytest.fixture(scope="module")
def sets():
    return _edge_sets()


def test_plan_invariants(sets):
    src, dst, fwd, _ = sets
    assert fwd.span_rows == SPAN_ROWS and fwd.span_src is not None
    span_src = np.asarray(fwd.span_src)
    span_local = np.asarray(fwd.span_local)
    tile_map = np.asarray(fwd.span_tile_map)
    base = np.asarray(fwd.span_base)
    num_tiles = len(span_src) // TILE_E
    assert len(tile_map) == num_tiles == len(base)
    # bases sublane-aligned and in-bounds of the 128-padded table
    assert (base % SPAN_BASE_ALIGN == 0).all()
    rows_pad = -(-NUM_SRC // 128) * 128
    assert (base + SPAN_ROWS <= rows_pad).all()
    # window sequence monotone (the kernel zeroes on first tile of a window)
    assert (np.diff(tile_map) >= 0).all()
    # every real slot's source inside its tile's span; padding slots marked
    real = span_local < WINDOW
    slot_base = np.repeat(base, TILE_E)
    rel = span_src - slot_base
    assert (rel[real] >= 0).all() and (rel[real] < SPAN_ROWS).all()
    # slot conservation: the multiset of (src, global_dst) over real slots
    # is exactly the original edge list
    slot_window = np.repeat(tile_map, TILE_E)
    got = np.stack([span_src[real], slot_window[real] * WINDOW + span_local[real]])
    want = np.stack([src, dst])
    got = got[:, np.lexsort(got)]
    want = want[:, np.lexsort(want)]
    np.testing.assert_array_equal(got, want)


def test_small_src_builds_no_plan():
    _, _, es, _ = _edge_sets(num_src=512, num_edges=4_000)
    assert es.span_rows == 0 and es.span_src is None


def test_sparse_relation_rejected_by_inflation_guard():
    # 1 edge per destination, sources uniform over 40k rows: every window's
    # source span vastly exceeds span_rows, tiles split per edge run
    rng = np.random.default_rng(3)
    num_src, num_dst = 40_000, 20_000
    src = rng.integers(0, num_src, size=num_dst).astype(np.int32)
    dst = np.arange(num_dst, dtype=np.int32)
    es = pad_edge_set(src, dst, num_src, num_dst, src_span_rows=64)
    assert es.span_rows == 0  # guard refused the plan


@pytest.mark.parametrize("aggregation", ["mean", "sum"])
def test_forward_parity(sets, aggregation):
    _, _, fwd, rev = sets
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(NUM_SRC, 128)).astype(np.float32)
    )
    got = span_dma_aggregate(x, fwd, rev, aggregation)
    want = aggregate_neighbors(x, fwd, aggregation, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_gradient_parity(sets):
    _, _, fwd, rev = sets
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(NUM_SRC, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(NUM_DST, 128)).astype(np.float32))

    def loss_span(x):
        return jnp.sum(span_dma_aggregate(x, fwd, rev, "mean") * w)

    def loss_xla(x):
        return jnp.sum(aggregate_neighbors(x, fwd, "mean", impl="xla") * w)

    g_span = jax.grad(loss_span)(x)
    g_xla = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(
        np.asarray(g_span), np.asarray(g_xla), atol=1e-4, rtol=1e-4
    )


def test_dispatch_routes_and_env_gate(sets, monkeypatch):
    _, _, fwd, rev = sets
    assert span_dma_applicable(fwd, rev)
    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(NUM_SRC, 64)).astype(np.float32)
    )
    want = aggregate_neighbors(x, fwd, "mean", impl="xla")
    via_pallas = aggregate_neighbors(x, fwd, "mean", impl="pallas", edges_rev=rev)
    np.testing.assert_allclose(
        np.asarray(via_pallas), np.asarray(want), atol=1e-4, rtol=1e-4
    )
    # the escape hatch must re-route through the paired tier, same numbers
    monkeypatch.setenv("MMGNN_SPAN_DMA", "0")
    gated = aggregate_neighbors(x, fwd, "mean", impl="pallas", edges_rev=rev)
    np.testing.assert_allclose(
        np.asarray(gated), np.asarray(want), atol=1e-4, rtol=1e-4
    )


def test_duplicate_edges_accumulate(sets):
    # duplicate (src, dst) pairs must contribute multiplicity times, exactly
    # like segment_sum (the EdgeSet contract, graph/hetero.py)
    rng = np.random.default_rng(5)
    src = np.repeat(rng.integers(0, NUM_SRC, size=3_000).astype(np.int32), 8)
    dst = np.repeat(rng.integers(0, 64, size=3_000).astype(np.int32), 8)
    fwd = pad_edge_set(src, dst, NUM_SRC, 64, src_span_rows=SPAN_ROWS)
    rev = pad_edge_set(dst, src, 64, NUM_SRC)
    if fwd.span_src is None:
        pytest.skip("inflation guard refused this layout")
    x = jnp.asarray(rng.normal(size=(NUM_SRC, 128)).astype(np.float32))
    got = span_dma_aggregate(x, fwd, rev, "sum")
    want = aggregate_neighbors(x, fwd, "sum", impl="xla")
    # slot order differs from dst-sorted order, so f32 accumulation order
    # differs; duplicate multiplicities amplify it slightly
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3, rtol=2e-3)


def test_plan_builder_direct_roundtrip():
    # build_src_span_plan is deterministic and pure-numpy: same inputs, same
    # plan — the serialization layer depends on this (plans are derived, not
    # stored)
    src, dst, fwd, _ = _edge_sets(seed=7)
    a = build_src_span_plan(
        np.asarray(fwd.win_src), np.asarray(fwd.win_local),
        np.asarray(fwd.win_tile_map), NUM_SRC, SPAN_ROWS,
    )
    b = build_src_span_plan(
        np.asarray(fwd.win_src), np.asarray(fwd.win_local),
        np.asarray(fwd.win_tile_map), NUM_SRC, SPAN_ROWS,
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    np.testing.assert_array_equal(a[0], np.asarray(fwd.span_src))
