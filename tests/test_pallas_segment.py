"""Pallas windowed segment kernel vs the XLA path (interpret mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_gnn_tpu.graph.hetero import TILE_E, WINDOW, build_window_plan, pad_edge_set
from multi_modal_gnn_tpu.ops.pallas_segment import gather_segment_aggregate
from multi_modal_gnn_tpu.ops.segment import aggregate_neighbors


def _random_edges(rng, num_src, num_dst, e):
    src = rng.integers(0, num_src, e).astype(np.int32)
    dst = np.sort(rng.integers(0, num_dst, e)).astype(np.int32)
    return src, dst


class TestWindowPlan:
    def test_plan_invariants(self, rng):
        num_src, num_dst, e = 50, 300, 2000
        src, dst = _random_edges(rng, num_src, num_dst, e)
        win_src, win_local, tile_map, num_windows = build_window_plan(src, dst, num_dst)
        assert num_windows == (num_dst + WINDOW - 1) // WINDOW
        assert len(win_src) % TILE_E == 0
        assert len(tile_map) == len(win_src) // TILE_E
        # every window owns at least one tile and tiles are window-contiguous
        assert set(tile_map.tolist()) == set(range(num_windows))
        assert np.all(np.diff(tile_map) >= 0)
        # every real edge appears exactly once with correct local offset
        valid = win_local < WINDOW
        assert valid.sum() == e
        window_of_edge = np.repeat(tile_map, TILE_E)
        recon_dst = window_of_edge[valid] * WINDOW + win_local[valid]
        np.testing.assert_array_equal(np.sort(recon_dst), np.sort(dst))

    def test_empty_window_gets_tile(self):
        # all edges land in window 0; window 1 must still own a tile
        src = np.zeros(4, np.int32)
        dst = np.array([0, 1, 2, 3], np.int32)
        _, _, tile_map, num_windows = build_window_plan(src, dst, num_dst=256)
        assert num_windows == 2
        assert 1 in set(tile_map.tolist())


@pytest.mark.parametrize("aggregation", ["mean", "sum"])
@pytest.mark.parametrize("shape", [(40, 90, 700, 128), (10, 10, 50, 128), (64, 500, 3000, 64)])
def test_pallas_matches_xla(rng, aggregation, shape):
    num_src, num_dst, e, d = shape
    src, dst = _random_edges(rng, num_src, num_dst, e)
    es = pad_edge_set(src, dst, num_src=num_src, num_dst=num_dst, pad_multiple=512)
    x = jnp.asarray(rng.standard_normal((num_src, d)).astype(np.float32))

    want = np.asarray(aggregate_neighbors(x, es, aggregation, impl="xla"))
    got = np.asarray(gather_segment_aggregate(x, es, aggregation, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_gradient_matches_xla(rng):
    num_src, num_dst, e, d = 30, 70, 400, 32
    src, dst = _random_edges(rng, num_src, num_dst, e)
    es = pad_edge_set(src, dst, num_src=num_src, num_dst=num_dst, pad_multiple=512)
    x = jnp.asarray(rng.standard_normal((num_src, d)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((num_dst, d)).astype(np.float32))

    def loss_pallas(x):
        return (gather_segment_aggregate(x, es, "mean", interpret=True) * w).sum()

    def loss_xla(x):
        return (aggregate_neighbors(x, es, "mean", impl="xla") * w).sum()

    g_pallas = np.asarray(jax.grad(loss_pallas)(x))
    g_xla = np.asarray(jax.grad(loss_xla)(x))
    np.testing.assert_allclose(g_pallas, g_xla, rtol=1e-4, atol=1e-5)


def test_model_with_pallas_impl(tiny_graph):
    """Full model forward with impl='pallas' (interpret) == impl='xla'."""
    from multi_modal_gnn_tpu.config import Config
    from multi_modal_gnn_tpu.models.factory import build_model, init_model_variables

    cfg = Config()
    cfg_p = cfg.replace(model=dataclasses.replace(cfg.model, hidden_dim=32, use_pallas=True))
    cfg_x = cfg.replace(model=dataclasses.replace(cfg.model, hidden_dim=32, use_pallas=False))

    model_x = build_model(cfg_x, tiny_graph)
    variables = init_model_variables(model_x, tiny_graph, jax.random.key(0))
    model_p = build_model(cfg_p, tiny_graph)

    p = jnp.arange(16, dtype=jnp.int32) % tiny_graph.num_nodes("patient")
    l = jnp.arange(16, dtype=jnp.int32) % tiny_graph.num_nodes("lab")
    out_x = model_x.apply(variables, tiny_graph, p, l, train=False,
                          method=model_x.predict_lab_values)
    out_p = model_p.apply(variables, tiny_graph, p, l, train=False,
                          method=model_p.predict_lab_values)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=1e-4, atol=1e-5)


def test_paired_backward_matches_xla(rng):
    """Paired fwd/bwd kernel (reverse-plan backward) matches XLA gradients."""
    from multi_modal_gnn_tpu.ops.pallas_segment import gather_segment_aggregate_paired

    num_a, num_b, e, d = 40, 70, 900, 32
    src = rng.integers(0, num_a, e).astype(np.int32)
    dst = np.sort(rng.integers(0, num_b, e)).astype(np.int32)
    es_fwd = pad_edge_set(src, dst, num_src=num_a, num_dst=num_b, pad_multiple=512)
    es_rev = pad_edge_set(dst, src, num_src=num_b, num_dst=num_a, pad_multiple=512)
    x = jnp.asarray(rng.standard_normal((num_a, d)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((num_b, d)).astype(np.float32))

    for aggregation in ("mean", "sum"):
        def loss_paired(x):
            return (gather_segment_aggregate_paired(
                x, es_fwd, es_rev, aggregation, interpret=True) * w).sum()

        def loss_xla(x):
            return (aggregate_neighbors(x, es_fwd, aggregation, impl="xla") * w).sum()

        np.testing.assert_allclose(
            np.asarray(loss_paired(x)), np.asarray(loss_xla(x)), rtol=1e-5
        )
        g_p = np.asarray(jax.grad(loss_paired)(x))
        g_x = np.asarray(jax.grad(loss_xla)(x))
        np.testing.assert_allclose(g_p, g_x, rtol=1e-4, atol=1e-5)


def test_model_training_with_paired_kernel(tiny_graph):
    """End-to-end training step with use_pallas (paired bwd) stays finite and
    matches the XLA path's loss on epoch 0."""
    from multi_modal_gnn_tpu.config import Config
    from multi_modal_gnn_tpu.models.factory import build_model
    from multi_modal_gnn_tpu.training.masker import EdgeMasker
    from multi_modal_gnn_tpu.training.trainer import Trainer

    losses = {}
    for use_pallas in (False, True):
        cfg = Config()
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, hidden_dim=32, dropout=0.0, use_pallas=use_pallas))
        masker = EdgeMasker(tiny_graph, seed=0)
        trainer = Trainer(build_model(cfg, tiny_graph), tiny_graph, masker, cfg)
        run = [trainer.train_epoch()]
        trainer.epoch += 1
        run.append(trainer.train_epoch())
        losses[use_pallas] = run
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-4)


# ---------------------------------------------------------------------------
# Fused small-table kernels (gather/scatter moved in-kernel)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["take", "indicator"])
@pytest.mark.parametrize("aggregation", ["mean", "sum"])
def test_fused_table_matches_xla(rng, mode, aggregation, monkeypatch):
    from multi_modal_gnn_tpu.ops import pallas_segment as ps

    num_src, num_dst, e, d = 60, 700, 5000, 128
    src, dst = _random_edges(rng, num_src, num_dst, e)
    es = pad_edge_set(src, dst, num_src=num_src, num_dst=num_dst, pad_multiple=512)
    x = jnp.asarray(rng.standard_normal((num_src, d)).astype(np.float32))

    monkeypatch.setattr(ps, "_vmem_take_supported", lambda: mode == "take")
    want = np.asarray(aggregate_neighbors(x, es, aggregation, impl="xla"))
    got = np.asarray(ps.fused_table_aggregate(x, es, aggregation, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["take", "indicator"])
def test_fused_table_gradient_matches_xla(rng, mode, monkeypatch):
    from multi_modal_gnn_tpu.ops import pallas_segment as ps

    num_src, num_dst, e, d = 40, 300, 2000, 32
    src, dst = _random_edges(rng, num_src, num_dst, e)
    es = pad_edge_set(src, dst, num_src=num_src, num_dst=num_dst, pad_multiple=512)
    x = jnp.asarray(rng.standard_normal((num_src, d)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((num_dst, d)).astype(np.float32))

    monkeypatch.setattr(ps, "_vmem_take_supported", lambda: mode == "take")

    def loss_fused(x):
        return (ps.fused_table_aggregate(x, es, "mean", interpret=True) * w).sum()

    def loss_xla(x):
        return (aggregate_neighbors(x, es, "mean", impl="xla") * w).sum()

    g_fused = np.asarray(jax.grad(loss_fused)(x))
    g_xla = np.asarray(jax.grad(loss_xla)(x))
    np.testing.assert_allclose(g_fused, g_xla, rtol=1e-4, atol=1e-5)


def test_fused_table_indicator_bf16_high_multiplicity(rng, monkeypatch):
    """Indicator mode on bf16 data with >256 duplicate edges per tile stays
    exact: the in-kernel gather must run table-first ((P @ T) then S @ ·) so
    no integer-valued count matrix is ever rounded to bf16 (601 -> 600)."""
    from multi_modal_gnn_tpu.ops import pallas_segment as ps

    mult = 601  # exceeds bf16's exact-integer range; one TILE_E tile holds it
    src = np.zeros(mult, np.int32)
    dst = np.zeros(mult, np.int32)
    es = pad_edge_set(src, dst, num_src=8, num_dst=8, pad_multiple=512)
    x = jnp.ones((8, 128), jnp.bfloat16)

    monkeypatch.setattr(ps, "_vmem_take_supported", lambda: False)
    # mean exposes the in-kernel rounding before the output cast back to
    # bf16: an exact count gives 601/601 == 1.0; the rounded count matrix
    # of the old (S @ P) @ T order gave 600/601 -> bf16 0.996
    got = np.asarray(ps.fused_table_aggregate(x, es, "mean", interpret=True))
    assert got[0, 0].astype(np.float32) == 1.0


def test_paired_degrades_without_window_plans(rng):
    """gather_segment_aggregate_paired on EdgeSets missing windowed layouts
    (e.g. distributed-loader shards) falls back instead of raising."""
    from multi_modal_gnn_tpu.ops.pallas_segment import gather_segment_aggregate_paired

    num_a, num_b, e, d = 30, 50, 400, 16
    src = rng.integers(0, num_a, e).astype(np.int32)
    dst = np.sort(rng.integers(0, num_b, e)).astype(np.int32)
    es_fwd = pad_edge_set(src, dst, num_src=num_a, num_dst=num_b, pad_multiple=512)
    es_rev = pad_edge_set(dst, src, num_src=num_b, num_dst=num_a, pad_multiple=512)
    x = jnp.asarray(rng.standard_normal((num_a, d)).astype(np.float32))
    want = np.asarray(aggregate_neighbors(x, es_fwd, "mean", impl="xla"))

    no_plan_fwd = es_fwd.replace(win_src=None, win_local=None, win_tile_map=None)
    got = np.asarray(gather_segment_aggregate_paired(x, no_plan_fwd, es_rev, "mean"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    no_plan_rev = es_rev.replace(win_src=None, win_local=None, win_tile_map=None)
    got = np.asarray(gather_segment_aggregate_paired(
        x, es_fwd, no_plan_rev, "mean", interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_table_byte_budget_gates_wide_features(rng):
    """A feature axis wide enough to blow the VMEM byte budget disables the
    fused-table tier even when the row count alone would allow it."""
    from multi_modal_gnn_tpu.ops import pallas_segment as ps

    src, dst = _random_edges(rng, 50, 200, 1000)
    es = pad_edge_set(src, dst, num_src=50, num_dst=200, pad_multiple=512)
    assert ps.fused_table_applicable(es, feature_dim=128)
    too_wide = ps.FUSED_TABLE_MAX_BYTES // (4 * es.num_src) + 1
    assert not ps.fused_table_applicable(es, feature_dim=too_wide)


def test_fused_table_dispatch(rng):
    """aggregate_neighbors(impl='pallas') routes small-src relations to the
    fused tier (no dense adjacency, windowed layout present)."""
    from multi_modal_gnn_tpu.ops import pallas_segment as ps

    num_src, num_dst, e, d = 50, 400, 3000, 64
    src, dst = _random_edges(rng, num_src, num_dst, e)
    es = pad_edge_set(src, dst, num_src=num_src, num_dst=num_dst, pad_multiple=512)
    assert es.dense_adj is None and ps.fused_table_applicable(es)
    x = jnp.asarray(rng.standard_normal((num_src, d)).astype(np.float32))
    want = np.asarray(aggregate_neighbors(x, es, "mean", impl="xla"))
    got = np.asarray(aggregate_neighbors(x, es, "mean", impl="pallas"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
