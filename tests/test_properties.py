"""Property-based tests (hypothesis) for the structural invariants the whole
compute path rests on: padding/CSR construction, window plans, splits."""

import numpy as np
from hypothesis import given, settings, strategies as st

from multi_modal_gnn_tpu.graph.hetero import (
    TILE_E,
    WINDOW,
    build_gather_plan,
    build_window_plan,
    pad_edge_set,
)
from multi_modal_gnn_tpu.graph.indexer import NodeIndexer


edge_case = st.tuples(
    st.integers(min_value=1, max_value=40),   # num_src
    st.integers(min_value=1, max_value=300),  # num_dst
    st.integers(min_value=0, max_value=500),  # num edges
    st.integers(min_value=0, max_value=2**31 - 1),  # seed
)


@settings(max_examples=25, deadline=None)
@given(edge_case)
def test_pad_edge_set_invariants(case):
    num_src, num_dst, e, seed = case
    rng = np.random.default_rng(seed)
    src = rng.integers(0, num_src, e).astype(np.int32)
    dst = rng.integers(0, num_dst, e).astype(np.int32)
    val = rng.standard_normal(e).astype(np.float32)
    es = pad_edge_set(src, dst, num_src=num_src, num_dst=num_dst, val=val, pad_multiple=64)

    s, d, m, v = (np.asarray(a) for a in (es.src, es.dst, es.mask, es.val))
    valid = m > 0
    # counts and CSR match, valid region sorted, padding at the dummy segment
    assert valid.sum() == e
    assert np.all(np.diff(d[valid]) >= 0) if e else True
    assert np.all(d[~valid] == num_dst)
    np.testing.assert_array_equal(
        np.asarray(es.dst_count), np.bincount(dst, minlength=num_dst)
    )
    rp = np.asarray(es.row_ptr)
    assert rp[0] == 0 and rp[-1] == e and np.all(np.diff(rp) >= 0)
    # the multiset of (src, dst, val) triples survives the sort exactly
    got = sorted(zip(s[valid].tolist(), d[valid].tolist(), v[valid].tolist()))
    want = sorted(zip(src.tolist(), dst.tolist(), val.tolist()))
    assert got == want


@settings(max_examples=25, deadline=None)
@given(edge_case)
def test_window_plan_reconstructs_edges(case):
    num_src, num_dst, e, seed = case
    rng = np.random.default_rng(seed)
    src = rng.integers(0, num_src, e).astype(np.int32)
    dst = np.sort(rng.integers(0, num_dst, e)).astype(np.int32)
    win_src, win_local, tile_map, num_windows = build_window_plan(src, dst, num_dst)

    assert len(win_src) % TILE_E == 0
    assert len(tile_map) == len(win_src) // TILE_E
    assert set(tile_map.tolist()) == set(range(num_windows))  # every window owns a tile
    valid = win_local < WINDOW
    # reconstruct (src, dst) multiset exactly
    window_of_slot = np.repeat(tile_map, TILE_E)
    recon_dst = window_of_slot[valid] * WINDOW + win_local[valid]
    got = sorted(zip(win_src[valid].tolist(), recon_dst.tolist()))
    want = sorted(zip(src.tolist(), dst.tolist()))
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=200),  # num_rows
    st.integers(min_value=0, max_value=400),  # n indices
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gather_plan_scatter_equivalence(num_rows, n, seed):
    """Backward-through-plan == dense scatter-add, for any index multiset."""
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, num_rows, n).astype(np.int32)
    plan = build_gather_plan(idx, num_rows)
    g = rng.standard_normal((n, 4)).astype(np.float64)

    # numpy oracle: dx[r] = sum of g rows whose idx == r
    want = np.zeros((num_rows, 4))
    np.add.at(want, idx, g)

    # reconstruct what the kernel computes from the plan (host-side mirror)
    win_src = np.asarray(plan.win_src)
    win_local = np.asarray(plan.win_local)
    tile_map = np.asarray(plan.win_tile_map)
    valid = win_local < WINDOW
    rows = np.repeat(tile_map, TILE_E)[valid] * WINDOW + win_local[valid]
    got = np.zeros((plan.num_windows * WINDOW, 4))
    np.add.at(got, rows, g[win_src[valid]])
    np.testing.assert_allclose(got[:num_rows], want, rtol=1e-12)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.one_of(
    st.integers(min_value=-10**6, max_value=10**6),
    st.text(max_size=8),
), max_size=60))
def test_indexer_bijection(ids):
    ix = NodeIndexer()
    codes = [ix.add(i) for i in ids]
    # dense, contiguous codes
    assert set(ix.id_to_index.values()) == set(range(len(ix)))
    # round trip through canonicalization
    for i, c in zip(ids, codes):
        assert ix.index_of(i) == c


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=1, max_value=60),    # num patients
    st.integers(min_value=1, max_value=400),   # num labs
    st.integers(min_value=0, max_value=3000),  # num pairs
    st.sampled_from([128, 256]),               # block_rows
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_regroup_slots_by_lab_block_invariants(num_p, num_l, n, block_rows, seed):
    """The span-bounded-lab-tile regroup (pair-head kernel narrow mode) must
    be a pure permutation-with-padding: every real slot relayed exactly once,
    every tile's real labs inside the single block lab_block_map assigns it,
    window ids monotone per the original plan."""
    from multi_modal_gnn_tpu.graph.hetero import regroup_slots_by_lab_block

    rng = np.random.default_rng(seed)
    p_idx = rng.integers(0, num_p, n).astype(np.int32)
    l_idx = rng.integers(0, num_l, n).astype(np.int32)
    plan = build_gather_plan(p_idx, num_p)
    win_src = np.asarray(plan.win_src)
    win_local = np.asarray(plan.win_local)
    real = win_local < WINDOW
    if n:
        l_s = np.where(real, l_idx[np.clip(win_src, 0, n - 1)], 0).astype(np.int32)
    else:
        l_s = np.zeros(len(win_local), np.int32)

    moves, e2, local2, tmap2, lbm = regroup_slots_by_lab_block(
        win_local, np.asarray(plan.win_tile_map), l_s, num_l, block_rows
    )

    assert e2 % TILE_E == 0 and len(local2) == e2 and len(tmap2) == e2 // TILE_E
    assert len(lbm) == len(tmap2)

    # bijection: real slots map to distinct new slots; padding maps nowhere
    m = moves >= 0
    np.testing.assert_array_equal(m, real)
    assert len(np.unique(moves[m])) == int(m.sum())

    # relay labs + locals and check per-tile single-block + window identity
    l2 = np.zeros(e2, np.int32)
    l2[moves[m]] = l_s[m]
    real2 = np.zeros(e2, bool)
    real2[moves[m]] = True
    # new padding slots must carry local == WINDOW (excluded from output)
    assert (local2[~real2] == WINDOW).all()
    assert (local2[real2] < WINDOW).all()
    for t in range(e2 // TILE_E):
        sl = slice(t * TILE_E, (t + 1) * TILE_E)
        tr = real2[sl]
        if tr.any():
            blocks = l2[sl][tr] // block_rows
            assert (blocks == lbm[t]).all(), (t, lbm[t], np.unique(blocks))

    # relayed slots keep their window: local index encodes the same window
    # row as before (the move may not cross windows)
    w_old = np.repeat(np.asarray(plan.win_tile_map), TILE_E)
    w_new = np.repeat(tmap2, TILE_E)
    np.testing.assert_array_equal(w_new[moves[m]], w_old[m])


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=1, max_value=60),    # num patients
    st.integers(min_value=1, max_value=400),   # num labs
    st.integers(min_value=0, max_value=3000),  # num pairs
    st.sampled_from([64, 128, 256]),           # block_rows
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_regroup_slots_by_lab_span_invariants(num_p, num_l, n, block_rows, seed):
    """The arbitrary-base span regroup must be a permutation-with-padding
    whose tiles each cover a single [base, base+block_rows) lab span with an
    8-aligned in-bounds base, windows monotone, window identity preserved."""
    from multi_modal_gnn_tpu.graph.hetero import regroup_slots_by_lab_span

    rng = np.random.default_rng(seed)
    p_idx = rng.integers(0, num_p, n).astype(np.int32)
    l_idx = rng.integers(0, num_l, n).astype(np.int32)
    plan = build_gather_plan(p_idx, num_p)
    win_src = np.asarray(plan.win_src)
    win_local = np.asarray(plan.win_local)
    real = win_local < WINDOW
    if n:
        l_s = np.where(real, l_idx[np.clip(win_src, 0, n - 1)], 0).astype(np.int32)
    else:
        l_s = np.zeros(len(win_local), np.int32)

    moves, e2, local2, tmap2, bases = regroup_slots_by_lab_span(
        win_local, np.asarray(plan.win_tile_map), l_s, num_l, block_rows
    )

    assert e2 % TILE_E == 0 and len(local2) == e2 and len(tmap2) == e2 // TILE_E
    assert len(bases) == len(tmap2)

    # bijection: real slots map to distinct new slots; padding maps nowhere
    m = moves >= 0
    np.testing.assert_array_equal(m, real)
    assert len(np.unique(moves[m])) == int(m.sum())

    labs_pad = max(-(-max(num_l, 1) // 128) * 128, block_rows)
    assert (bases % 16 == 0).all()  # SPAN_BASE_ALIGN: sublane-safe for f32+bf16
    assert (bases >= 0).all() and (bases + block_rows <= labs_pad).all()

    l2 = np.zeros(e2, np.int32)
    l2[moves[m]] = l_s[m]
    real2 = np.zeros(e2, bool)
    real2[moves[m]] = True
    assert (local2[~real2] == WINDOW).all()
    assert (local2[real2] < WINDOW).all()
    for t in range(e2 // TILE_E):
        sl = slice(t * TILE_E, (t + 1) * TILE_E)
        tr = real2[sl]
        if tr.any():
            labs = l2[sl][tr]
            assert (labs >= bases[t]).all() and (labs < bases[t] + block_rows).all()

    assert (np.diff(tmap2) >= 0).all()
    w_old = np.repeat(np.asarray(plan.win_tile_map), TILE_E)
    w_new = np.repeat(tmap2, TILE_E)
    np.testing.assert_array_equal(w_new[moves[m]], w_old[m])

    # the whole point: span packing may not inflate more than block packing
    from multi_modal_gnn_tpu.graph.hetero import regroup_slots_by_lab_block

    _, e2_block, *_ = regroup_slots_by_lab_block(
        win_local, np.asarray(plan.win_tile_map), l_s, num_l, block_rows
    )
    assert e2 <= e2_block


@settings(max_examples=20, deadline=None)
@given(
    edge_case,
    st.integers(min_value=1, max_value=9),  # n_shards
)
def test_build_sharded_window_plans_invariants(case, n_shards):
    """Per-shard plan invariants the shard_map kernel tier rests on: every
    shard has identical slot/tile counts; window sequences are monotone and
    initialize every local window 0..k_max-1; each real slot's reconstructed
    global destination (offset + tile window)*128 + local matches a valid
    edge, and the union over shards is EXACTLY the valid edge multiset."""
    from multi_modal_gnn_tpu.graph.hetero import build_sharded_window_plans

    num_src, num_dst, e, seed = case
    rng = np.random.default_rng(seed)
    src = rng.integers(0, num_src, e).astype(np.int32)
    dst = np.sort(rng.integers(0, num_dst, e).astype(np.int32))
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]

    sh_src, sh_local, sh_tm, sh_off, k_max = build_sharded_window_plans(
        src, dst, num_dst, n_shards
    )
    assert k_max >= 1
    assert len(sh_src) == len(sh_local)
    assert len(sh_src) % (n_shards * TILE_E) == 0
    assert len(sh_tm) % n_shards == 0
    slot_len = len(sh_src) // n_shards
    tile_len = len(sh_tm) // n_shards
    assert slot_len == tile_len * TILE_E

    rec = []
    for s in range(n_shards):
        local = sh_local[s * slot_len : (s + 1) * slot_len]
        srcs = sh_src[s * slot_len : (s + 1) * slot_len]
        tm = sh_tm[s * tile_len : (s + 1) * tile_len]
        # monotone window sequence covering 0..k_max-1 (padding tiles
        # initialize every block the kernel's revisit pattern would skip)
        assert (np.diff(tm) >= 0).all()
        assert set(range(k_max)) <= set(tm.tolist())
        assert tm.min() == 0 and tm.max() == k_max - 1
        real = local < WINDOW
        assert (local[~real] == WINDOW).all()
        w_of_slot = np.repeat(tm, TILE_E)
        g_dst = (int(sh_off[s]) + w_of_slot[real]) * WINDOW + local[real]
        rec += list(zip(srcs[real].tolist(), g_dst.tolist()))
        assert (np.asarray(g_dst) < num_dst).all() if real.any() else True

    assert sorted(rec) == sorted(zip(src.tolist(), dst.tolist()))
