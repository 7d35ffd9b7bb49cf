"""Segment-reduction correctness vs a numpy oracle, including padding."""

import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_gnn_tpu.graph.hetero import pad_edge_set
from multi_modal_gnn_tpu.ops.segment import aggregate_neighbors, segment_softmax


def _numpy_aggregate(x_src, src, dst, num_dst, mode):
    out = np.zeros((num_dst, x_src.shape[1]), dtype=np.float64)
    counts = np.zeros(num_dst)
    for s, d in zip(src, dst):
        if mode == "max":
            out[d] = np.maximum(out[d], x_src[s]) if counts[d] else x_src[s]
        else:
            out[d] += x_src[s]
        counts[d] += 1
    if mode == "mean":
        out = out / np.maximum(counts, 1)[:, None]
    return out


@pytest.mark.parametrize("mode", ["mean", "sum", "max"])
def test_aggregate_matches_numpy(rng, mode):
    num_src, num_dst, e, d = 37, 23, 200, 16
    src = rng.integers(0, num_src, e).astype(np.int32)
    dst = rng.integers(0, num_dst, e).astype(np.int32)
    x = rng.standard_normal((num_src, d)).astype(np.float32)
    es = pad_edge_set(src, dst, num_src=num_src, num_dst=num_dst, pad_multiple=256)
    got = np.asarray(aggregate_neighbors(jnp.asarray(x), es, aggregation=mode))
    # oracle on the *sorted* edges (same set, order irrelevant for these ops)
    want = _numpy_aggregate(x, src, dst, num_dst, mode)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_isolated_destinations_zero(rng):
    src = np.array([0, 1], dtype=np.int32)
    dst = np.array([2, 2], dtype=np.int32)
    x = rng.standard_normal((3, 4)).astype(np.float32)
    es = pad_edge_set(src, dst, num_src=3, num_dst=5, pad_multiple=8)
    out = np.asarray(aggregate_neighbors(jnp.asarray(x), es, "mean"))
    np.testing.assert_allclose(out[[0, 1, 3, 4]], 0.0)
    np.testing.assert_allclose(out[2], (x[0] + x[1]) / 2, rtol=1e-6)


def test_padding_does_not_leak(rng):
    """Padded rows must not contribute to any real destination."""
    src = np.array([1], dtype=np.int32)
    dst = np.array([0], dtype=np.int32)
    x = rng.standard_normal((2, 3)).astype(np.float32) + 100.0  # big values
    es = pad_edge_set(src, dst, num_src=2, num_dst=2, pad_multiple=64)
    out = np.asarray(aggregate_neighbors(jnp.asarray(x), es, "sum"))
    np.testing.assert_allclose(out[0], x[1], rtol=1e-6)
    np.testing.assert_allclose(out[1], 0.0)


def test_segment_softmax(rng):
    n, num_seg = 50, 7
    ids = np.sort(rng.integers(0, num_seg, n)).astype(np.int32)
    logits = rng.standard_normal(n).astype(np.float32)
    out = np.asarray(segment_softmax(jnp.asarray(logits), jnp.asarray(ids), num_seg))
    for s in range(num_seg):
        m = ids == s
        if m.any():
            e = np.exp(logits[m] - logits[m].max())
            np.testing.assert_allclose(out[m], e / e.sum(), rtol=1e-5)
            assert out[m].sum() == pytest.approx(1.0, rel=1e-5)


def test_dense_adjacency_matches_segment(rng):
    """Dense-adjacency tier == XLA segment path (mean and sum), incl. grads."""
    import jax

    num_src, num_dst, e, d = 37, 23, 300, 16
    src = rng.integers(0, num_src, e).astype(np.int32)
    dst = rng.integers(0, num_dst, e).astype(np.int32)
    es = pad_edge_set(src, dst, num_src=num_src, num_dst=num_dst, pad_multiple=64,
                      dense_max_bytes=1 << 20)
    assert es.dense_adj is not None
    x = jnp.asarray(rng.standard_normal((num_src, d)).astype(np.float32))

    for mode in ("mean", "sum"):
        want = np.asarray(aggregate_neighbors(x, es, mode, impl="xla"))
        got = np.asarray(aggregate_neighbors(x, es, mode, impl="pallas"))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    w = jnp.asarray(rng.standard_normal((num_dst, d)).astype(np.float32))
    g_dense = np.asarray(jax.grad(lambda x: (aggregate_neighbors(x, es, "mean", impl="pallas") * w).sum())(x))
    g_xla = np.asarray(jax.grad(lambda x: (aggregate_neighbors(x, es, "mean", impl="xla") * w).sum())(x))
    np.testing.assert_allclose(g_dense, g_xla, rtol=1e-4, atol=1e-5)


def test_dense_adjacency_respects_budget(rng):
    es = pad_edge_set(np.array([0]), np.array([0]), num_src=100, num_dst=100,
                      pad_multiple=64, dense_max_bytes=100)  # 100x100x4 > 100 bytes
    assert es.dense_adj is None
