"""Fused pair-head kernel (ops/pallas_pairhead.py): forward + all six
gradients match an unfused jnp reference in interpret mode (dropout off —
the in-kernel PRNG only lowers on real TPU; the TPU-side training parity is
exercised by bench/diagnostics and the slot-major integration tests)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multi_modal_gnn_tpu.graph.hetero import WINDOW, build_gather_plan
from multi_modal_gnn_tpu.ops.pallas_pairhead import fused_pair_head


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    num_p, num_l, H0, H1, B = 300, 37, 64, 32, 2000
    p_idx = rng.integers(0, num_p, B).astype(np.int32)
    l_idx = rng.integers(0, num_l, B).astype(np.int32)
    plan = build_gather_plan(p_idx, num_p)
    win_src = np.asarray(plan.win_src)
    win_local = np.asarray(plan.win_local)
    real = win_local < WINDOW
    l_s = np.where(real, l_idx[win_src], 0).astype(np.int32)
    p_s = np.where(real, p_idx[win_src], 0).astype(np.int32)
    params = dict(
        proj_p=rng.standard_normal((num_p, H0)).astype(np.float32),
        proj_l=rng.standard_normal((num_l, H0)).astype(np.float32),
        w1=(rng.standard_normal((H0, H1)) * 0.1).astype(np.float32),
        b1=(rng.standard_normal(H1) * 0.1).astype(np.float32),
        w2=(rng.standard_normal(H1) * 0.1).astype(np.float32),
        b2=np.float32(0.3),
    )
    return plan, p_s, l_s, real, params


def _ref(plan, p_s, l_s, real, proj_p, proj_l, w1, b1, w2, b2):
    h0 = jnp.maximum(proj_p[p_s] + proj_l[l_s], 0.0)
    h1 = jnp.maximum(h0 @ w1 + b1, 0.0)
    return jnp.where(jnp.asarray(real), h1 @ w2 + b2, 0.0)


def _fused(plan, p_s, l_s, real, proj_p, proj_l, w1, b1, w2, b2, tile_mask=None):
    seed = jnp.zeros(2, jnp.uint32)
    return fused_pair_head(
        proj_p, proj_l, w1, b1, w2, b2, jnp.asarray(l_s),
        plan.win_local, plan.win_tile_map, seed, tile_mask,
        getattr(plan, "lab_block_map", None),
        plan.num_windows, 0.0, True,
        getattr(plan, "lab_block_rows", 0),
        getattr(plan, "lab_span_mode", False),
    )


def test_forward_parity(problem):
    plan, p_s, l_s, real, params = problem
    args = tuple(map(jnp.asarray, params.values()))
    np.testing.assert_allclose(
        _fused(plan, p_s, l_s, real, *args),
        _ref(plan, p_s, l_s, real, *args),
        atol=1e-5,
    )


def test_gradient_parity(problem):
    plan, p_s, l_s, real, params = problem
    args = tuple(map(jnp.asarray, params.values()))
    g = jnp.asarray(
        np.random.default_rng(1).standard_normal(plan.win_local.shape[0]).astype(np.float32)
    )
    argnums = tuple(range(6))
    gr_ref = jax.grad(
        lambda *a: jnp.sum(_ref(plan, p_s, l_s, real, *a) * g), argnums=argnums
    )(*args)
    gr_f = jax.grad(
        lambda *a: jnp.sum(_fused(plan, p_s, l_s, real, *a) * g), argnums=argnums
    )(*args)
    for name, a, b in zip(params.keys(), gr_ref, gr_f):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4, err_msg=f"grad({name})"
        )


def test_tile_mask_predication(problem):
    """Masked tiles output zero and contribute zero gradient; unmasked tiles
    are bit-identical to the unmasked call (the degree-predication fast
    path: HeteroRGCN skips whole head tiles the gate provably discards)."""
    plan, p_s, l_s, real, params = problem
    args = tuple(map(jnp.asarray, params.values()))
    num_tiles = plan.win_local.shape[0] // 1024
    rng = np.random.default_rng(7)
    mask = jnp.asarray(rng.integers(0, 2, num_tiles).astype(np.int32))
    slot_keep = jnp.repeat(mask, 1024).astype(jnp.float32)

    full = _fused(plan, p_s, l_s, real, *args)
    masked = _fused(plan, p_s, l_s, real, *args, tile_mask=mask)
    np.testing.assert_array_equal(np.asarray(masked), np.asarray(full * slot_keep))

    # gradients: a loss that only reads unmasked slots must match exactly
    g = jnp.asarray(rng.standard_normal(plan.win_local.shape[0]).astype(np.float32))
    g_kept = g * slot_keep
    argnums = tuple(range(6))
    gr_full = jax.grad(
        lambda *a: jnp.sum(_fused(plan, p_s, l_s, real, *a) * g_kept), argnums=argnums
    )(*args)
    gr_mask = jax.grad(
        lambda *a: jnp.sum(_fused(plan, p_s, l_s, real, *a, tile_mask=mask) * g_kept),
        argnums=argnums,
    )(*args)
    for name, a, b in zip(params.keys(), gr_full, gr_mask):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5, err_msg=f"grad({name})"
        )


def _block_problem(block_rows=128):
    """A slot-major + lab-block-regrouped problem (the production layout)."""
    from multi_modal_gnn_tpu.graph.hetero import (
        GatherPlan,
        regroup_slots_by_lab_block,
    )

    rng = np.random.default_rng(3)
    num_p, num_l, H0, H1, B = 300, 300, 64, 32, 4000
    p_idx = rng.integers(0, num_p, B).astype(np.int32)
    l_idx = rng.integers(0, num_l, B).astype(np.int32)
    plan = build_gather_plan(p_idx, num_p)
    win_src = np.asarray(plan.win_src)
    win_local = np.asarray(plan.win_local)
    real = win_local < WINDOW
    l_s = np.where(real, l_idx[win_src], 0).astype(np.int32)
    p_s = np.where(real, p_idx[win_src], 0).astype(np.int32)

    moves, e2, local2, tmap2, lbm = regroup_slots_by_lab_block(
        win_local, np.asarray(plan.win_tile_map), l_s, num_l, block_rows
    )

    def relay(a, fill):
        out = np.full(e2, fill, a.dtype)
        m = moves >= 0
        out[moves[m]] = a[m]
        return out

    p2, l2 = relay(p_s, 0), relay(l_s, 0)
    real2 = local2 < WINDOW
    plan2 = GatherPlan(
        win_src=jnp.zeros(e2, jnp.int32),
        win_local=jnp.asarray(local2),
        win_tile_map=jnp.asarray(tmap2),
        num_windows=plan.num_windows,
        num_rows=plan.num_rows,
        identity=True,
        lab_block_map=jnp.asarray(lbm),
        lab_block_rows=block_rows,
    )
    params = dict(
        proj_p=rng.standard_normal((num_p, 64)).astype(np.float32),
        proj_l=rng.standard_normal((num_l, 64)).astype(np.float32),
        w1=(rng.standard_normal((64, 32)) * 0.1).astype(np.float32),
        b1=(rng.standard_normal(32) * 0.1).astype(np.float32),
        w2=(rng.standard_normal(32) * 0.1).astype(np.float32),
        b2=np.float32(0.3),
    )
    return plan2, p2, l2, real2, params


def test_lab_block_regroup_contract():
    """Every tile's REAL labs live in one 128-row block; windows stay
    monotone.  (All-blocks-visited padding tiles and first-visit flags were
    removed with the resident-accumulator backward — the full dprojl table
    zeroes once at tile 0.)"""
    plan2, p2, l2, real2, _ = _block_problem()
    lbm = np.asarray(plan2.lab_block_map)
    tmap = np.asarray(plan2.win_tile_map)
    local = np.asarray(plan2.win_local)
    T = len(l2) // 1024
    for t in range(T):
        sl = slice(t * 1024, (t + 1) * 1024)
        r = local[sl] < WINDOW
        if r.any():
            assert (l2[sl][r] // 128 == lbm[t]).all()
    assert set(np.asarray(lbm)) >= set(range(3))  # 300 labs -> blocks 0..2 used
    assert (np.diff(tmap) >= 0).all()


def test_lab_block_mode_parity():
    """Narrow-lab-block kernel == unfused reference, forward and all grads."""
    plan2, p2, l2, real2, params = _block_problem()
    args = tuple(map(jnp.asarray, params.values()))
    ref = _ref(plan2, p2, l2, real2, *args)
    got = _fused(plan2, p2, l2, real2, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    g = jnp.asarray(
        np.random.default_rng(5).standard_normal(len(l2)).astype(np.float32)
        * real2
    )
    argnums = tuple(range(6))
    gr_ref = jax.grad(
        lambda *a: jnp.sum(_ref(plan2, p2, l2, real2, *a) * g), argnums=argnums
    )(*args)
    gr_f = jax.grad(
        lambda *a: jnp.sum(_fused(plan2, p2, l2, real2, *a) * g), argnums=argnums
    )(*args)
    for name, a, b in zip(params.keys(), gr_ref, gr_f):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4, err_msg=f"grad({name})"
        )


def _span_problem(block_rows=128):
    """A slot-major + arbitrary-base span-regrouped problem (the narrow-lab
    mode that avoids the block regroup's slot inflation)."""
    from multi_modal_gnn_tpu.graph.hetero import (
        GatherPlan,
        regroup_slots_by_lab_span,
    )

    rng = np.random.default_rng(13)
    num_p, num_l, H0, H1, B = 300, 300, 64, 32, 4000
    p_idx = rng.integers(0, num_p, B).astype(np.int32)
    l_idx = rng.integers(0, num_l, B).astype(np.int32)
    plan = build_gather_plan(p_idx, num_p)
    win_src = np.asarray(plan.win_src)
    win_local = np.asarray(plan.win_local)
    real = win_local < WINDOW
    l_s = np.where(real, l_idx[win_src], 0).astype(np.int32)
    p_s = np.where(real, p_idx[win_src], 0).astype(np.int32)

    moves, e2, local2, tmap2, bases = regroup_slots_by_lab_span(
        win_local, np.asarray(plan.win_tile_map), l_s, num_l, block_rows
    )

    def relay(a, fill):
        out = np.full(e2, fill, a.dtype)
        m = moves >= 0
        out[moves[m]] = a[m]
        return out

    p2, l2 = relay(p_s, 0), relay(l_s, 0)
    real2 = local2 < WINDOW
    plan2 = GatherPlan(
        win_src=jnp.zeros(e2, jnp.int32),
        win_local=jnp.asarray(local2),
        win_tile_map=jnp.asarray(tmap2),
        num_windows=plan.num_windows,
        num_rows=plan.num_rows,
        identity=True,
        lab_block_map=jnp.asarray(bases),
        lab_block_rows=block_rows,
        lab_span_mode=True,
    )
    params = dict(
        proj_p=rng.standard_normal((num_p, 64)).astype(np.float32),
        proj_l=rng.standard_normal((num_l, 64)).astype(np.float32),
        w1=(rng.standard_normal((64, 32)) * 0.1).astype(np.float32),
        b1=(rng.standard_normal(32) * 0.1).astype(np.float32),
        w2=(rng.standard_normal(32) * 0.1).astype(np.float32),
        b2=np.float32(0.3),
    )
    return plan2, p2, l2, real2, params


@pytest.mark.parametrize("block_rows", [128, 256])
def test_lab_span_mode_parity(block_rows):
    """Arbitrary-base narrow-lab kernel == unfused reference, forward and
    all six gradients (interpret mode; hardware lowering of the in-kernel
    dynamic slice is validated separately on real TPU)."""
    plan2, p2, l2, real2, params = _span_problem(block_rows)
    args = tuple(map(jnp.asarray, params.values()))
    ref = _ref(plan2, p2, l2, real2, *args)
    got = _fused(plan2, p2, l2, real2, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    g = jnp.asarray(
        np.random.default_rng(5).standard_normal(len(l2)).astype(np.float32)
        * real2
    )
    argnums = tuple(range(6))
    gr_ref = jax.grad(
        lambda *a: jnp.sum(_ref(plan2, p2, l2, real2, *a) * g), argnums=argnums
    )(*args)
    gr_f = jax.grad(
        lambda *a: jnp.sum(_fused(plan2, p2, l2, real2, *a) * g), argnums=argnums
    )(*args)
    for name, a, b in zip(params.keys(), gr_ref, gr_f):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4, err_msg=f"grad({name})"
        )


def test_lab_span_no_inflation_vs_block():
    """On the same problem, the span regroup must not add more padding than
    the aligned-block regroup (its reason to exist)."""
    plan_b, *_ = _block_problem(128)
    plan_s, *_ = _span_problem(128)
    assert plan_s.win_local.shape[0] <= plan_b.win_local.shape[0]


# ---------------------------------------------------------------------------
# Dual-head fusion (fused_pair_head_dual): both degree-gated heads in one
# call must match two independent single-head calls exactly (rate=0).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def dual_problem(problem):
    plan, p_s, l_s, real, params_t = problem
    rng = np.random.default_rng(11)
    num_p, num_l, H0, H1 = 300, 37, 64, 32
    params_g = dict(
        proj_p=rng.standard_normal((num_p, H0)).astype(np.float32),
        proj_l=rng.standard_normal((num_l, H0)).astype(np.float32),
        w1=(rng.standard_normal((H0, H1)) * 0.1).astype(np.float32),
        b1=(rng.standard_normal(H1) * 0.1).astype(np.float32),
        w2=(rng.standard_normal(H1) * 0.1).astype(np.float32),
        b2=np.float32(-0.2),
    )
    return plan, p_s, l_s, real, params_t, params_g


def _dual(plan, l_s, params_t, params_g, tab_mask=None, gnn_mask=None):
    from multi_modal_gnn_tpu.ops.pallas_pairhead import fused_pair_head_dual

    at = tuple(map(jnp.asarray, params_t.values()))
    ag = tuple(map(jnp.asarray, params_g.values()))
    return fused_pair_head_dual(
        *at, *ag, jnp.asarray(l_s), plan.win_local, plan.win_tile_map,
        jnp.zeros(4, jnp.uint32), tab_mask, gnn_mask,
        plan.num_windows, 0.0, True,
    )


def test_dual_forward_matches_two_single_calls(dual_problem):
    plan, p_s, l_s, real, params_t, params_g = dual_problem
    out_t, out_g = _dual(plan, l_s, params_t, params_g)
    ref_t = _fused(plan, p_s, l_s, real, *map(jnp.asarray, params_t.values()))
    ref_g = _fused(plan, p_s, l_s, real, *map(jnp.asarray, params_g.values()))
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref_t), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref_g), atol=1e-5)


def test_dual_gradient_matches_two_single_calls(dual_problem):
    plan, p_s, l_s, real, params_t, params_g = dual_problem
    rng = np.random.default_rng(5)
    g_t = jnp.asarray(rng.standard_normal(plan.win_local.shape[0]).astype(np.float32))
    g_g = jnp.asarray(rng.standard_normal(plan.win_local.shape[0]).astype(np.float32))

    def loss_dual(at, ag):
        from multi_modal_gnn_tpu.ops.pallas_pairhead import fused_pair_head_dual

        out_t, out_g = fused_pair_head_dual(
            *at, *ag, jnp.asarray(l_s), plan.win_local, plan.win_tile_map,
            jnp.zeros(4, jnp.uint32), None, None, plan.num_windows, 0.0, True,
        )
        return jnp.sum(out_t * g_t) + jnp.sum(out_g * g_g)

    def loss_single(at, ag):
        out_t = _fused(plan, p_s, l_s, real, *at)
        out_g = _fused(plan, p_s, l_s, real, *ag)
        return jnp.sum(out_t * g_t) + jnp.sum(out_g * g_g)

    at = tuple(map(jnp.asarray, params_t.values()))
    ag = tuple(map(jnp.asarray, params_g.values()))
    gr_dual = jax.grad(loss_dual, argnums=(0, 1))(at, ag)
    gr_single = jax.grad(loss_single, argnums=(0, 1))(at, ag)
    for side, names in ((0, params_t.keys()), (1, params_g.keys())):
        for name, a, b in zip(names, gr_single[side], gr_dual[side]):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4,
                err_msg=f"side {side} grad({name})",
            )


def test_dual_per_head_masks(dual_problem):
    """Each head's mask zeroes its own output tiles independently."""
    plan, p_s, l_s, real, params_t, params_g = dual_problem
    num_tiles = plan.win_local.shape[0] // 1024
    rng = np.random.default_rng(9)
    m_t = jnp.asarray(rng.integers(0, 2, num_tiles).astype(np.int32))
    m_g = jnp.asarray(rng.integers(0, 2, num_tiles).astype(np.int32))
    keep_t = jnp.repeat(m_t, 1024).astype(jnp.float32)
    keep_g = jnp.repeat(m_g, 1024).astype(jnp.float32)

    full_t, full_g = _dual(plan, l_s, params_t, params_g)
    out_t, out_g = _dual(plan, l_s, params_t, params_g, tab_mask=m_t, gnn_mask=m_g)
    np.testing.assert_array_equal(np.asarray(out_t), np.asarray(full_t * keep_t))
    np.testing.assert_array_equal(np.asarray(out_g), np.asarray(full_g * keep_g))


def test_lab_block_parity_nondivisible_pad():
    """block_rows=256 with 300 labs: labs_pad(128)=384 is NOT a multiple of
    256 — the kernel must extend the table pad so the last block stays
    in-bounds (regression for an out-of-bounds BlockSpec window)."""
    plan2, p2, l2, real2, params = _block_problem(block_rows=256)
    args = tuple(map(jnp.asarray, params.values()))
    ref = _ref(plan2, p2, l2, real2, *args)
    got = _fused(plan2, p2, l2, real2, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    g = jnp.asarray(
        np.random.default_rng(6).standard_normal(len(l2)).astype(np.float32) * real2
    )
    gr_ref = jax.grad(lambda *a: jnp.sum(_ref(plan2, p2, l2, real2, *a) * g),
                      argnums=(0, 1))(*args)
    gr_f = jax.grad(lambda *a: jnp.sum(_fused(plan2, p2, l2, real2, *a) * g),
                    argnums=(0, 1))(*args)
    for a, b in zip(gr_ref, gr_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4)
