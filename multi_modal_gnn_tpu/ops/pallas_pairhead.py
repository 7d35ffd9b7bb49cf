"""Fused pair-head kernel: the factored edge head without HBM intermediates.

Device tracing (PERFORMANCE.md "Device trace") showed the scale epoch
dominated by the head pair path: every stage of

    h0 = dropout(relu(proj_p[p_idx] + proj_l[l_idx]))      # [B, H0]
    h1 = dropout(relu(h0 @ W1 + b1))                       # [B, H1]
    out = h1 @ w2 + b2                                     # [B]

materializes a B x H0 (~1 GB at B=3.5M) array in HBM, and the backward
re-reads each.  With slot-major train batches (training/masker.py) the
structure collapses into VMEM tiles:

  * each TILE_E-slot tile's patients live in ONE 128-row window of the
    (window-padded) ``proj_p`` — a (WINDOW, H0) block streamed per window;
  * the whole ``proj_l`` table (num_labs x H0) is VMEM-resident via a
    constant index map (EHR lab vocabularies are a few hundred rows);
  * the MLP runs tile-at-a-time on the MXU; only the scalar outputs [E_win]
    ever touch HBM;
  * dropout draws from the in-kernel PRNG (pltpu.prng_*), seeded
    (seed, tile) — the backward re-seeds identically and recomputes the
    masks, so nothing is stored;
  * backward accumulates d_proj_p per window block, d_proj_l / dW1 / db1 /
    dw2 / db2 VMEM-resident across the whole grid (same revisit pattern as
    ops/pallas_segment.py), and emits NO B-sized arrays at all.

Traffic per epoch drops from ~6 passes of B x H0 to: indices (B x 8 bytes)
+ one pass of proj_p windows + outputs.  Numerical parity with the unfused
path (dropout off) is pinned by tests/test_pairhead_kernel.py.

No reference analogue: the reference's head is a plain torch MLP over
gathered pairs (src/model.py:342-396).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_modal_gnn_tpu.graph.hetero import SPAN_BASE_ALIGN, TILE_E, WINDOW
from multi_modal_gnn_tpu.ops.pallas_segment import _zero_out_on_new_window

_LAB_PAD = 128  # pad the lab table's row count to a multiple of this

# dw2 implementation toggle (ROADMAP "dw2 drift", resolved round 3):
# measured at production scale shapes on the v5e (scripts/bench_dw2.py,
# 20-iter medians): VPU masked sum 39.12 ms vs MXU dot_general 39.93 ms
# per backward — the M=1 dot_general wastes an MXU pass while the VPU sum
# overlaps with the surrounding matmuls.  Both kernels now use the VPU
# form (True); the toggle remains only so bench_dw2.py can re-measure on
# other chips (read at trace time, NOT a jit key — callers must
# jax.clear_caches() after flipping).
_DW2_VPU = True


def _dropout(x, bits, rate):
    """Inverted dropout from raw PRNG bits (VPU compare, no HBM mask).

    ``pltpu.prng_random_bits`` yields **int32**; the threshold compare must
    be unsigned or every negative bit pattern (half of all draws) reads as
    below-threshold and gets dropped — keep would be 0.5 - rate instead of
    1 - rate.  Bitcast to uint32 first (free; signless in Mosaic)."""
    threshold = np.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    keep = pltpu.bitcast(bits, jnp.uint32) >= threshold
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _gather_rows(table, idx, dtype):
    """table[idx] as an indicator matmul (Mosaic's gather rule requires
    128-aligned row widths; the indicator form always lowers and rides the
    MXU).  Out-of-range idx rows (padding) come out all-zero."""
    n_rows = table.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_E, n_rows), 1)
    p = (idx.reshape(TILE_E, 1) == cols).astype(dtype)
    return jnp.dot(p, table.astype(dtype), preferred_element_type=jnp.float32)


def _single_seed(seed_ref, t):
    return seed_ref[0] ^ (jnp.uint32(t) * jnp.uint32(2654435761)), seed_ref[1]


def _mlp_forward(pre0, w1_ref, b1_ref, in_dt, rate, seed_fn):
    """The head MLP chain shared by all four kernels:
    relu -> dropout -> linear(+b1) -> relu -> dropout.

    ``seed_fn`` is called lazily (only when rate > 0, a static Python
    branch) so the PRNG seeding ops trace exactly where they always did.
    Returns (h0, pre1, h1_d, bits0, bits1); the bits let a backward caller
    re-apply identical dropout masks, and are None when rate == 0."""
    h0 = jnp.maximum(pre0, 0.0)
    bits0 = bits1 = None
    if rate > 0.0:
        pltpu.prng_seed(*seed_fn())
        bits0 = pltpu.prng_random_bits(h0.shape)
        h0 = _dropout(h0, bits0, rate)
    pre1 = (
        jnp.dot(h0.astype(in_dt), w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[:]
    )
    h1 = jnp.maximum(pre1, 0.0)
    if rate > 0.0:
        bits1 = pltpu.prng_random_bits(h1.shape)
        h1_d = _dropout(h1, bits1, rate)
    else:
        h1_d = h1
    return h0, pre1, h1_d, bits0, bits1


def _mlp_backward(dh1, h0, pre0, pre1, valid, w1_ref, dw1_ref, db1_ref,
                  in_dt, rate, bits0, bits1):
    """Backward of :func:`_mlp_forward` from the h1 cotangent down to the
    pre-activation slot gradient dpre0 (shared by both backward kernels);
    accumulates dw1/db1 into their VMEM-resident refs in place."""
    if rate > 0.0:
        dh1 = _dropout(dh1, bits1, rate)
    dpre1 = jnp.where(pre1 > 0.0, dh1, 0.0)
    db1_ref[:] += jnp.sum(dpre1, axis=0, keepdims=True)
    dw1_ref[:] += jax.lax.dot_general(  # h0^T @ dpre1 without materializing h0^T
        h0.astype(in_dt), dpre1.astype(in_dt),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dh0 = jax.lax.dot_general(  # dpre1 @ W1^T: contract both on the H1 axis
        dpre1.astype(in_dt), w1_ref[:],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    if rate > 0.0:
        dh0 = _dropout(dh0, bits0, rate)
    dpre0 = jnp.where(pre0 > 0.0, dh0, 0.0)
    return jnp.where(valid, dpre0, 0.0).astype(in_dt)


def _scatter_dpre0_to_window(local_ref, dpre0, dprojp_ref, in_dt):
    """d_proj_p: segment-sum this tile's slot gradients into its window
    block (rows by win_local; padding slots match no indicator row)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, TILE_E), 0)
    s_local = (local_ref[:].reshape(1, TILE_E) == rows).astype(in_dt)
    dprojp_ref[:] += jnp.dot(s_local, dpre0, preferred_element_type=jnp.float32)


def _lab_operand(projl_ref, lab_ref, lb_ref, t, lbr: int, span: bool):
    """The (narrow) lab-table operand and block-local lab ids for one tile.

    Three static modes: full table (lbr == 0); aligned-block mode (the
    BlockSpec streamed ``lb[t]``-th ``lbr``-row block, local = lab - lb*lbr);
    span mode (the whole table is VMEM-resident and the tile's ``lbr``-row
    slice starts at the ARBITRARY sublane-aligned row base ``lb[t]`` — an
    in-VMEM dynamic slice, no extra DMA).  Ids outside the slice (only
    padding slots, by the regroup contract) match no indicator column ->
    zero rows.  SPAN_BASE_ALIGN (16 rows) is a whole number of sublanes for
    both f32 (8 rows/sublane-tile) and bf16 (16) tables.
    """
    if lbr and span:
        base = pl.multiple_of(lb_ref[t], SPAN_BASE_ALIGN)
        return projl_ref[pl.ds(base, lbr), :], lab_ref[:] - base
    if lbr:
        return projl_ref[:], lab_ref[:] - lb_ref[t] * lbr
    return projl_ref[:], lab_ref[:]


def _fwd_kernel(
    tm_ref, seed_ref, mask_ref, lb_ref, local_ref, lab_ref,
    projp_ref, projl_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    out_ref,
    *, rate: float, lbr: int, span: bool,
):
    t = pl.program_id(0)

    # degree-predicated tiles (mask == 0): every real slot's gated prediction
    # ignores this head, so the whole tile body is skipped — only the zero
    # output is materialized.  Exactness argument in FactoredEdgeHead.
    @pl.when(mask_ref[t] == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(mask_ref[t] != 0)
    def _():
        valid = local_ref[:].reshape(TILE_E, 1) < WINDOW  # i32 reshape, then compare (i1 reshape won't lower)
        dt = projp_ref.dtype
        # in-window patient gather: [TILE_E, H0] rows of the (WINDOW, H0) block;
        # padding slots (local == WINDOW) match no indicator column -> zero rows
        p_rows = _gather_rows(projp_ref[:], local_ref[:], dt)
        # span-bounded lab tiles (lbr > 0): gather from this tile's single
        # lbr-row slice of the lab table by block-local id (_lab_operand)
        tbl, lab_local = _lab_operand(projl_ref, lab_ref, lb_ref, t, lbr, span)
        l_rows = _gather_rows(tbl, lab_local, dt)
        _, _, h1, _, _ = _mlp_forward(
            p_rows + l_rows, w1_ref, b1_ref, dt, rate,
            lambda: _single_seed(seed_ref, t),
        )
        out = jnp.sum(h1 * w2_ref[:].astype(jnp.float32), axis=1, keepdims=True) + b2_ref[0, 0]
        # 1-D block: dropping the size-1 minor dim is a no-op relayout
        out_ref[:] = jnp.where(valid, out, 0.0).reshape(TILE_E)


def _bwd_kernel(
    tm_ref, seed_ref, mask_ref, lb_ref, local_ref, lab_ref, go_ref,
    projp_ref, projl_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    dprojp_ref, dprojl_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    *, rate: float, lbr: int, span: bool,
):
    t = pl.program_id(0)

    # window-block output: zero on first tile of each window.  This (and the
    # grid-wide zeroing below) must run even for predicated tiles, so skipped
    # tiles leave exact zeros rather than garbage in their output blocks.
    _zero_out_on_new_window(tm_ref, dprojp_ref)

    # grid-wide accumulators: zero once
    @pl.when(t == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    # d_proj_l is a SINGLE full-table block in both modes (index map constant)
    # — in lbr mode tiles revisit lab blocks non-consecutively (windows are
    # the outer grouping, blocks cycle inside each window), and Mosaic's
    # output pipeline only preserves a block's VMEM contents across
    # CONSECUTIVE same-index steps; a blocked-by-lb output would lose every
    # window's contribution but the last.  The resident table costs
    # labs_pad x H0 f32 (the non-lbr mode's footprint) and the FLOP saving
    # is kept by accumulating the narrow product into a dynamic row slice.
    @pl.when(t == 0)
    def _():
        dprojl_ref[:] = jnp.zeros_like(dprojl_ref)

    # degree-predicated tiles contribute exactly zero gradient (their real
    # slots' cotangents are zero through the gate), so the body is skipped
    @pl.when(mask_ref[t] != 0)
    def _():
        valid = local_ref[:].reshape(TILE_E, 1) < WINDOW  # i32 reshape, then compare (i1 reshape won't lower)
        in_dt = projp_ref.dtype
        # --- recompute forward (same PRNG stream as _fwd_kernel) ---
        p_rows = _gather_rows(projp_ref[:], local_ref[:], in_dt)
        tbl, lab_local = _lab_operand(projl_ref, lab_ref, lb_ref, t, lbr, span)
        l_rows = _gather_rows(tbl, lab_local, in_dt)
        pre0 = p_rows + l_rows
        h0, pre1, h1_d, bits0, bits1 = _mlp_forward(
            pre0, w1_ref, b1_ref, in_dt, rate,
            lambda: _single_seed(seed_ref, t),
        )

        # --- backward ---
        # (TILE_E,) block; adding a size-1 minor dim is the supported 32-bit no-op
        go = jnp.where(valid, go_ref[:].reshape(TILE_E, 1), 0.0)  # [TILE_E, 1] f32
        db2_ref[:] += jnp.sum(go).reshape(1, 1)
        # dw2[h] = sum_e go[e] * h1_d[e, h] — contract over the slot axis.
        # VPU masked sum, unified with the dual kernel (measured faster
        # than the M=1 MXU dot_general — see _DW2_VPU above).
        if _DW2_VPU:
            dw2_ref[:] += jnp.sum(go * h1_d.astype(jnp.float32), axis=0, keepdims=True)
        else:
            dw2_ref[:] += jax.lax.dot_general(
                go.astype(in_dt), h1_d.astype(in_dt),
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
        dh1 = go * w2_ref[:].astype(jnp.float32)  # [TILE_E, H1] broadcast of [1, H1]
        dpre0 = _mlp_backward(
            dh1, h0, pre0, pre1, valid, w1_ref, dw1_ref, db1_ref,
            in_dt, rate, bits0, bits1,
        )
        _scatter_dpre0_to_window(local_ref, dpre0, dprojp_ref, in_dt)

        # d_proj_l: scatter-by-lab into the full-table accumulator.  In lbr
        # mode the indicator stays NARROW ([lbr, TILE_E] — the FLOP saving)
        # and the product lands in the tile's block via a dynamic row slice.
        s_pad = lbr if lbr else dprojl_ref.shape[0]
        p_lab_t = (
            lab_local.reshape(1, TILE_E)
            == jax.lax.broadcasted_iota(jnp.int32, (s_pad, TILE_E), 0)
        ).astype(in_dt)
        dblock = jnp.dot(p_lab_t, dpre0, preferred_element_type=jnp.float32)
        if lbr and span:
            base = pl.multiple_of(lb_ref[t], SPAN_BASE_ALIGN)
            dprojl_ref[pl.ds(base, lbr), :] += dblock
        elif lbr:
            base = pl.multiple_of(lb_ref[t] * lbr, lbr)
            dprojl_ref[pl.ds(base, lbr), :] += dblock
        else:
            dprojl_ref[:] += dblock


def _pad_rows(x, rows):
    return x if x.shape[0] == rows else jnp.pad(x, ((0, rows - x.shape[0]), (0, 0)))


@functools.partial(
    jax.jit, static_argnames=("num_windows", "rate", "interpret", "lbr", "span")
)
def _fused_fwd(
    proj_p, proj_l, w1, b1, w2, b2, lab_idx, win_local, win_tile_map, seed,
    tile_mask, lab_block_map, num_windows, rate, interpret, lbr, span,
):
    e_win = win_local.shape[0]
    num_tiles = e_win // TILE_E
    if tile_mask is None:
        tile_mask = jnp.ones((num_tiles,), jnp.int32)
    if lab_block_map is None:
        lab_block_map = jnp.zeros((num_tiles,), jnp.int32)
    h0 = proj_p.shape[1]
    h1 = w1.shape[1]
    labs_pad = ((proj_l.shape[0] + _LAB_PAD - 1) // _LAB_PAD) * _LAB_PAD
    if lbr and span:
        # arbitrary-base mode: the table stays resident; any 8-aligned base
        # with base + lbr <= labs_pad is sliceable (clamped below for safety)
        labs_pad = max(labs_pad, lbr)
        lab_block_map = jnp.clip(lab_block_map, 0, labs_pad - lbr)
    elif lbr:
        # aligned-block mode tiles the table in lbr-row blocks; the LAST block
        # must lie fully inside the padded table (labs_pad=384, lbr=256 would
        # otherwise make block 1 read rows 256..511 of a 384-row array)
        labs_pad = -(-labs_pad // lbr) * lbr
    proj_p = _pad_rows(proj_p, num_windows * WINDOW)
    proj_l = _pad_rows(proj_l, labs_pad)
    # aligned-block mode (lbr, not span): per-tile narrow lab-table block
    # streamed by BlockSpec — cuts the dominant one-hot gather FLOPs by
    # labs_pad / lbr.  Span mode keeps the FULL table resident and slices
    # in-kernel (same FLOP cut, no per-tile DMA, arbitrary 8-aligned bases).
    l_rows_spec = (
        pl.BlockSpec((lbr, h0), lambda t, tm, sd, mk, lb: (lb[t], 0))
        if lbr and not span
        else pl.BlockSpec((labs_pad, h0), lambda t, tm, sd, mk, lb: (0, 0))
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # win_tile_map, seed, tile_mask, lab_block_map
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_E,), lambda t, tm, sd, mk, lb: (t,)),
            pl.BlockSpec((TILE_E,), lambda t, tm, sd, mk, lb: (t,)),
            pl.BlockSpec((WINDOW, h0), lambda t, tm, sd, mk, lb: (tm[t], 0)),
            l_rows_spec,
            pl.BlockSpec((h0, h1), lambda t, tm, sd, mk, lb: (0, 0)),
            pl.BlockSpec((1, h1), lambda t, tm, sd, mk, lb: (0, 0)),
            pl.BlockSpec((1, h1), lambda t, tm, sd, mk, lb: (0, 0)),
            pl.BlockSpec((1, 1), lambda t, tm, sd, mk, lb: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_E,), lambda t, tm, sd, mk, lb: (t,)),
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate, lbr=lbr, span=span),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e_win,), jnp.float32),
        interpret=interpret,
    )(
        win_tile_map, seed, tile_mask, lab_block_map, win_local, lab_idx,
        proj_p, proj_l, w1, b1.reshape(1, -1), w2.reshape(1, -1),
        b2.reshape(1, 1),
    )
    return out.reshape(e_win)


@functools.partial(
    jax.jit, static_argnames=("num_windows", "rate", "interpret", "lbr", "span")
)
def _fused_bwd(
    proj_p, proj_l, w1, b1, w2, b2, lab_idx, win_local, win_tile_map, seed,
    tile_mask, lab_block_map, g_out,
    num_windows, rate, interpret, lbr, span,
):
    e_win = win_local.shape[0]
    num_tiles = e_win // TILE_E
    if tile_mask is None:
        tile_mask = jnp.ones((num_tiles,), jnp.int32)
    if lab_block_map is None:
        lab_block_map = jnp.zeros((num_tiles,), jnp.int32)
    h0 = proj_p.shape[1]
    h1 = w1.shape[1]
    num_p = proj_p.shape[0]
    num_l = proj_l.shape[0]
    labs_pad = ((num_l + _LAB_PAD - 1) // _LAB_PAD) * _LAB_PAD
    if lbr and span:
        labs_pad = max(labs_pad, lbr)
        lab_block_map = jnp.clip(lab_block_map, 0, labs_pad - lbr)
    elif lbr:
        labs_pad = -(-labs_pad // lbr) * lbr  # last lbr block fully in-bounds
    proj_p_pad = _pad_rows(proj_p, num_windows * WINDOW)
    proj_l_pad = _pad_rows(proj_l, labs_pad)
    l_in_spec = (
        pl.BlockSpec((lbr, h0), lambda t, tm, sd, mk, lb: (lb[t], 0))
        if lbr and not span
        else pl.BlockSpec((labs_pad, h0), lambda t, tm, sd, mk, lb: (0, 0))
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_E,), lambda t, tm, sd, mk, lb: (t,)),
            pl.BlockSpec((TILE_E,), lambda t, tm, sd, mk, lb: (t,)),
            pl.BlockSpec((TILE_E,), lambda t, tm, sd, mk, lb: (t,)),
            pl.BlockSpec((WINDOW, h0), lambda t, tm, sd, mk, lb: (tm[t], 0)),
            l_in_spec,
            pl.BlockSpec((h0, h1), lambda t, tm, sd, mk, lb: (0, 0)),
            pl.BlockSpec((1, h1), lambda t, tm, sd, mk, lb: (0, 0)),
            pl.BlockSpec((1, h1), lambda t, tm, sd, mk, lb: (0, 0)),
            pl.BlockSpec((1, 1), lambda t, tm, sd, mk, lb: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((WINDOW, h0), lambda t, tm, sd, mk, lb: (tm[t], 0)),
            # full table, constant index: lbr-mode lab blocks are revisited
            # NON-consecutively, which blocked outputs do not support (see
            # _bwd_kernel); the narrow-indicator FLOP saving happens in-kernel
            pl.BlockSpec((labs_pad, h0), lambda t, tm, sd, mk, lb: (0, 0)),
            pl.BlockSpec((h0, h1), lambda t, tm, sd, mk, lb: (0, 0)),
            pl.BlockSpec((1, h1), lambda t, tm, sd, mk, lb: (0, 0)),
            pl.BlockSpec((1, h1), lambda t, tm, sd, mk, lb: (0, 0)),
            pl.BlockSpec((1, 1), lambda t, tm, sd, mk, lb: (0, 0)),
        ],
    )
    douts = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate, lbr=lbr, span=span),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_windows * WINDOW, h0), jnp.float32),
            jax.ShapeDtypeStruct((labs_pad, h0), jnp.float32),
            jax.ShapeDtypeStruct((h0, h1), jnp.float32),
            jax.ShapeDtypeStruct((1, h1), jnp.float32),
            jax.ShapeDtypeStruct((1, h1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        win_tile_map, seed, tile_mask, lab_block_map,
        win_local, lab_idx,
        g_out,
        proj_p_pad, proj_l_pad, w1, b1.reshape(1, -1), w2.reshape(1, -1),
        b2.reshape(1, 1),
    )
    d_projp, d_projl, dw1, db1, dw2, db2 = douts
    dt = proj_p.dtype
    return (
        d_projp[:num_p].astype(dt),
        d_projl[:num_l].astype(dt),
        dw1.astype(w1.dtype),
        db1.reshape(b1.shape).astype(b1.dtype),
        dw2.reshape(w2.shape).astype(w2.dtype),
        db2.reshape(b2.shape).astype(b2.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15, 16))
def fused_pair_head(
    proj_p, proj_l, w1, b1, w2, b2, lab_idx, win_local, win_tile_map, seed,
    tile_mask, lab_block_map,
    num_windows, rate=0.0, interpret=False, lab_block_rows=0,
    lab_span_mode=False,
):
    """out[slot] = MLP(relu(proj_p[patient(slot)] + proj_l[lab(slot)])).

    Slot-major contract: slot ``e`` of tile ``t`` addresses patient
    ``win_tile_map[t] * 128 + win_local[e]`` (padding slots carry
    ``win_local == 128`` and output 0).  ``seed`` (uint32[2]) drives the
    in-kernel dropout PRNG; rate=0 disables dropout (eval / parity tests).

    ``tile_mask`` (int32[num_tiles] or None): degree-predication.  Tiles with
    mask 0 skip the whole body — output 0, gradient 0.  CALLER CONTRACT: a
    masked tile must contain only slots whose downstream consumer ignores
    this head's value (the degree gate in HeteroRGCN.predict_lab_values) or
    padding slots; the kernel does not check this.

    ``lab_block_rows > 0`` (with ``lab_block_map`` from the span-bounded
    plan, graph/hetero.py regroup_slots_by_lab_block): every tile's real
    labs live in lab-table block ``lab_block_map[t]``, so the dominant
    one-hot lab gather narrows from [TILE_E, labs_pad] to
    [TILE_E, lab_block_rows] — num_labs/lab_block_rows x fewer MXU FLOPs.

    ``lab_span_mode=True`` (with ``lab_block_map`` holding per-tile
    SPAN_BASE_ALIGN-aligned ROW BASES from graph/hetero.py
    regroup_slots_by_lab_span): the same narrowing, but each tile's rows
    come from an in-kernel dynamic slice of the VMEM-resident table at an
    arbitrary sublane-aligned base — no per-tile DMA and (almost) no
    regroup slot inflation.
    """
    if lab_block_rows and lab_block_map is None:
        # a zeros-default map would silently gather every tile from block 0
        # (all labs >= lab_block_rows match nothing and predict/backprop 0)
        raise ValueError(
            "lab_block_rows > 0 requires the span-bounded plan's "
            "lab_block_map (graph/hetero.py regroup_slots_by_lab_block / "
            "regroup_slots_by_lab_span)"
        )
    return _fused_fwd(
        proj_p, proj_l, w1, b1, w2, b2, lab_idx, win_local, win_tile_map, seed,
        tile_mask, lab_block_map, num_windows, rate, interpret, lab_block_rows,
        lab_span_mode,
    )


def _fph_fwd(
    proj_p, proj_l, w1, b1, w2, b2, lab_idx, win_local, win_tile_map, seed,
    tile_mask, lab_block_map,
    num_windows, rate, interpret, lab_block_rows, lab_span_mode,
):
    out = _fused_fwd(
        proj_p, proj_l, w1, b1, w2, b2, lab_idx, win_local, win_tile_map, seed,
        tile_mask, lab_block_map, num_windows, rate, interpret, lab_block_rows,
        lab_span_mode,
    )
    return out, (
        proj_p, proj_l, w1, b1, w2, b2, lab_idx, win_local, win_tile_map, seed,
        tile_mask, lab_block_map,
    )


def _fph_bwd(num_windows, rate, interpret, lab_block_rows, lab_span_mode, res, g_out):
    (proj_p, proj_l, w1, b1, w2, b2, lab_idx, win_local, win_tile_map, seed,
     tile_mask, lab_block_map) = res
    grads = _fused_bwd(
        proj_p, proj_l, w1, b1, w2, b2, lab_idx, win_local, win_tile_map, seed,
        tile_mask, lab_block_map, g_out,
        num_windows, rate, interpret, lab_block_rows, lab_span_mode,
    )
    zero_i = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)  # noqa: E731
    zopt = lambda a: None if a is None else zero_i(a)  # noqa: E731
    return (
        *grads, zero_i(lab_idx), zero_i(win_local), zero_i(win_tile_map),
        zero_i(seed), zopt(tile_mask), zopt(lab_block_map),
    )


fused_pair_head.defvjp(_fph_fwd, _fph_bwd)


# ---------------------------------------------------------------------------
# Dual-head fusion: both degree-gated heads in ONE kernel call.
#
# The model's dual heads (HeteroRGCN.predict_lab_values: tabular head over
# initial embeddings, GNN head over propagated features) share the SAME slot
# layout, window map and lab ids — only the projection tables and MLP weights
# differ.  With H0 = 64 the single-head gather matmuls
# ([TILE_E, src] x [src, 64]) fill only HALF of each 128-wide MXU output
# pass; concatenating the two heads' tables to [src, 128] makes the second
# head's gathers ride the SAME passes — the dominant indicator FLOPs and the
# one-hot construction are paid once for both heads.  The two MLPs run as one
# block-diagonal [2*H0, 2*H1] matmul (off-diagonal zeros keep per-head
# gradients exact), and the two scalar outputs separate by column masks —
# no lane-slicing anywhere.
#
# Dropout note: the dual kernel draws ONE PRNG stream over the concatenated
# [TILE_E, 2*H0] activations (seeded from both heads' seeds), so its dropout
# realization differs from two single calls — same distribution, and the
# backward recomputes identical masks.  Parity tests run rate=0.
# ---------------------------------------------------------------------------


def _dual_seed(seed_ref, t):
    return (
        seed_ref[0] ^ seed_ref[2] ^ (jnp.uint32(t) * jnp.uint32(2654435761)),
        seed_ref[1] ^ seed_ref[3],
    )


def _dual_colmasks(h1):
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * h1), 1)
    mt = (cols < h1).astype(jnp.float32)
    return mt, 1.0 - mt


def _dual_fwd_kernel(
    tm_ref, seed_ref, tmask_ref, gmask_ref, local_ref, lab_ref,
    projp_ref, projl_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    outt_ref, outg_ref,
    *, rate: float,
):
    t = pl.program_id(0)
    active = jnp.logical_or(tmask_ref[t] != 0, gmask_ref[t] != 0)

    @pl.when(jnp.logical_not(active))
    def _():
        outt_ref[:] = jnp.zeros_like(outt_ref)
        outg_ref[:] = jnp.zeros_like(outg_ref)

    @pl.when(active)
    def _():
        valid = local_ref[:].reshape(TILE_E, 1) < WINDOW
        dt = projp_ref.dtype
        h1 = w1_ref.shape[1] // 2
        p2 = _gather_rows(projp_ref[:], local_ref[:], dt)  # [TILE_E, 2*H0]
        l2 = _gather_rows(projl_ref[:], lab_ref[:], dt)
        _, _, h1v, _, _ = _mlp_forward(
            p2 + l2, w1_ref, b1_ref, dt, rate,
            lambda: _dual_seed(seed_ref, t),
        )
        prod = h1v * w2_ref[:].astype(jnp.float32)  # [TILE_E, 2*H1]
        mt, mg = _dual_colmasks(h1)
        out_t = jnp.sum(prod * mt, axis=1, keepdims=True) + b2_ref[0, 0]
        out_g = jnp.sum(prod * mg, axis=1, keepdims=True) + b2_ref[0, 1]
        keep_t = jnp.logical_and(valid, tmask_ref[t] != 0)
        keep_g = jnp.logical_and(valid, gmask_ref[t] != 0)
        outt_ref[:] = jnp.where(keep_t, out_t, 0.0).reshape(TILE_E)
        outg_ref[:] = jnp.where(keep_g, out_g, 0.0).reshape(TILE_E)


def _dual_bwd_kernel(
    tm_ref, seed_ref, tmask_ref, gmask_ref, local_ref, lab_ref,
    got_ref, gog_ref,
    projp_ref, projl_ref, w1_ref, b1_ref, w2_ref,
    dprojp_ref, dprojl_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    *, rate: float,
):
    t = pl.program_id(0)
    _zero_out_on_new_window(tm_ref, dprojp_ref)

    @pl.when(t == 0)
    def _():
        dprojl_ref[:] = jnp.zeros_like(dprojl_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    active = jnp.logical_or(tmask_ref[t] != 0, gmask_ref[t] != 0)

    @pl.when(active)
    def _():
        valid = local_ref[:].reshape(TILE_E, 1) < WINDOW
        dt = projp_ref.dtype
        h1 = w1_ref.shape[1] // 2
        # --- recompute forward (same PRNG stream as _dual_fwd_kernel) ---
        p2 = _gather_rows(projp_ref[:], local_ref[:], dt)
        l2 = _gather_rows(projl_ref[:], lab_ref[:], dt)
        pre0 = p2 + l2
        h0, pre1, h1_d, bits0, bits1 = _mlp_forward(
            pre0, w1_ref, b1_ref, dt, rate,
            lambda: _dual_seed(seed_ref, t),
        )

        # --- backward ---
        keep_t = jnp.logical_and(valid, tmask_ref[t] != 0)
        keep_g = jnp.logical_and(valid, gmask_ref[t] != 0)
        go_t = jnp.where(keep_t, got_ref[:].reshape(TILE_E, 1), 0.0)
        go_g = jnp.where(keep_g, gog_ref[:].reshape(TILE_E, 1), 0.0)
        db2_ref[:] += jnp.concatenate(
            [jnp.sum(go_t).reshape(1, 1), jnp.sum(go_g).reshape(1, 1)], axis=1
        )
        mt, mg = _dual_colmasks(h1)
        # per-head output cotangent spread over the concatenated H1 columns
        go_cols = go_t * mt + go_g * mg  # [TILE_E, 2*H1]
        # dw2 as a VPU masked sum — the measured winner, unified with the
        # single kernel (see _DW2_VPU at the top of this file)
        dw2_ref[:] += jnp.sum(go_cols * h1_d, axis=0, keepdims=True)
        dh1 = go_cols * w2_ref[:].astype(jnp.float32)
        dpre0 = _mlp_backward(
            dh1, h0, pre0, pre1, valid, w1_ref, dw1_ref, db1_ref,
            dt, rate, bits0, bits1,
        )
        _scatter_dpre0_to_window(local_ref, dpre0, dprojp_ref, dt)

        s_pad = dprojl_ref.shape[0]
        p_lab_t = (
            lab_ref[:].reshape(1, TILE_E)
            == jax.lax.broadcasted_iota(jnp.int32, (s_pad, TILE_E), 0)
        ).astype(dt)
        dprojl_ref[:] += jnp.dot(p_lab_t, dpre0, preferred_element_type=jnp.float32)


def _dual_pack(proj_p_t, proj_p_g, proj_l_t, proj_l_g, w1_t, w1_g,
               b1_t, b1_g, w2_t, w2_g, b2_t, b2_g, num_windows):
    """Concatenate the two heads' operands (features side-by-side; W1 block-
    diagonal so each head's MLP half stays independent)."""
    h0 = proj_p_t.shape[1]
    h1 = w1_t.shape[1]
    labs_pad = ((proj_l_t.shape[0] + _LAB_PAD - 1) // _LAB_PAD) * _LAB_PAD
    projp2 = jnp.concatenate(
        [_pad_rows(proj_p_t, num_windows * WINDOW),
         _pad_rows(proj_p_g, num_windows * WINDOW)], axis=1
    )
    projl2 = jnp.concatenate(
        [_pad_rows(proj_l_t, labs_pad), _pad_rows(proj_l_g, labs_pad)], axis=1
    )
    dt = projp2.dtype
    w1bd = jnp.zeros((2 * h0, 2 * h1), dt)
    w1bd = w1bd.at[:h0, :h1].set(w1_t.astype(dt)).at[h0:, h1:].set(w1_g.astype(dt))
    b1cat = jnp.concatenate(
        [b1_t.reshape(1, -1), b1_g.reshape(1, -1)], axis=1
    ).astype(jnp.float32)
    w2cat = jnp.concatenate(
        [w2_t.reshape(1, -1), w2_g.reshape(1, -1)], axis=1
    ).astype(jnp.float32)
    b2pair = jnp.stack([b2_t, b2_g]).reshape(1, 2).astype(jnp.float32)
    return projp2, projl2, w1bd, b1cat, w2cat, b2pair, h0, h1, labs_pad


@functools.partial(jax.jit, static_argnames=("num_windows", "rate", "interpret"))
def _dual_fused_fwd(
    proj_p_t, proj_l_t, w1_t, b1_t, w2_t, b2_t,
    proj_p_g, proj_l_g, w1_g, b1_g, w2_g, b2_g,
    lab_idx, win_local, win_tile_map, seed4, tab_mask, gnn_mask,
    num_windows, rate, interpret,
):
    e_win = win_local.shape[0]
    num_tiles = e_win // TILE_E
    if tab_mask is None:
        tab_mask = jnp.ones((num_tiles,), jnp.int32)
    if gnn_mask is None:
        gnn_mask = jnp.ones((num_tiles,), jnp.int32)
    projp2, projl2, w1bd, b1cat, w2cat, b2pair, h0, h1, labs_pad = _dual_pack(
        proj_p_t, proj_p_g, proj_l_t, proj_l_g, w1_t, w1_g,
        b1_t, b1_g, w2_t, w2_g, b2_t, b2_g, num_windows,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # win_tile_map, seed4, tab_mask, gnn_mask
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_E,), lambda t, tm, sd, mt, mg: (t,)),
            pl.BlockSpec((TILE_E,), lambda t, tm, sd, mt, mg: (t,)),
            pl.BlockSpec((WINDOW, 2 * h0), lambda t, tm, sd, mt, mg: (tm[t], 0)),
            pl.BlockSpec((labs_pad, 2 * h0), lambda t, tm, sd, mt, mg: (0, 0)),
            pl.BlockSpec((2 * h0, 2 * h1), lambda t, tm, sd, mt, mg: (0, 0)),
            pl.BlockSpec((1, 2 * h1), lambda t, tm, sd, mt, mg: (0, 0)),
            pl.BlockSpec((1, 2 * h1), lambda t, tm, sd, mt, mg: (0, 0)),
            pl.BlockSpec((1, 2), lambda t, tm, sd, mt, mg: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TILE_E,), lambda t, tm, sd, mt, mg: (t,)),
            pl.BlockSpec((TILE_E,), lambda t, tm, sd, mt, mg: (t,)),
        ],
    )
    out_t, out_g = pl.pallas_call(
        functools.partial(_dual_fwd_kernel, rate=rate),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((e_win,), jnp.float32),
            jax.ShapeDtypeStruct((e_win,), jnp.float32),
        ],
        interpret=interpret,
    )(
        win_tile_map, seed4, tab_mask, gnn_mask, win_local, lab_idx,
        projp2, projl2, w1bd, b1cat, w2cat, b2pair,
    )
    return out_t, out_g


@functools.partial(jax.jit, static_argnames=("num_windows", "rate", "interpret"))
def _dual_fused_bwd(
    proj_p_t, proj_l_t, w1_t, b1_t, w2_t, b2_t,
    proj_p_g, proj_l_g, w1_g, b1_g, w2_g, b2_g,
    lab_idx, win_local, win_tile_map, seed4, tab_mask, gnn_mask,
    g_out_t, g_out_g,
    num_windows, rate, interpret,
):
    e_win = win_local.shape[0]
    num_tiles = e_win // TILE_E
    if tab_mask is None:
        tab_mask = jnp.ones((num_tiles,), jnp.int32)
    if gnn_mask is None:
        gnn_mask = jnp.ones((num_tiles,), jnp.int32)
    projp2, projl2, w1bd, b1cat, w2cat, b2pair, h0, h1, labs_pad = _dual_pack(
        proj_p_t, proj_p_g, proj_l_t, proj_l_g, w1_t, w1_g,
        b1_t, b1_g, w2_t, w2_g, b2_t, b2_g, num_windows,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_E,), lambda t, tm, sd, mt, mg: (t,)),
            pl.BlockSpec((TILE_E,), lambda t, tm, sd, mt, mg: (t,)),
            pl.BlockSpec((TILE_E,), lambda t, tm, sd, mt, mg: (t,)),
            pl.BlockSpec((TILE_E,), lambda t, tm, sd, mt, mg: (t,)),
            pl.BlockSpec((WINDOW, 2 * h0), lambda t, tm, sd, mt, mg: (tm[t], 0)),
            pl.BlockSpec((labs_pad, 2 * h0), lambda t, tm, sd, mt, mg: (0, 0)),
            pl.BlockSpec((2 * h0, 2 * h1), lambda t, tm, sd, mt, mg: (0, 0)),
            pl.BlockSpec((1, 2 * h1), lambda t, tm, sd, mt, mg: (0, 0)),
            pl.BlockSpec((1, 2 * h1), lambda t, tm, sd, mt, mg: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((WINDOW, 2 * h0), lambda t, tm, sd, mt, mg: (tm[t], 0)),
            pl.BlockSpec((labs_pad, 2 * h0), lambda t, tm, sd, mt, mg: (0, 0)),
            pl.BlockSpec((2 * h0, 2 * h1), lambda t, tm, sd, mt, mg: (0, 0)),
            pl.BlockSpec((1, 2 * h1), lambda t, tm, sd, mt, mg: (0, 0)),
            pl.BlockSpec((1, 2 * h1), lambda t, tm, sd, mt, mg: (0, 0)),
            pl.BlockSpec((1, 2), lambda t, tm, sd, mt, mg: (0, 0)),
        ],
    )
    douts = pl.pallas_call(
        functools.partial(_dual_bwd_kernel, rate=rate),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_windows * WINDOW, 2 * h0), jnp.float32),
            jax.ShapeDtypeStruct((labs_pad, 2 * h0), jnp.float32),
            jax.ShapeDtypeStruct((2 * h0, 2 * h1), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * h1), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * h1), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ],
        interpret=interpret,
    )(
        win_tile_map, seed4, tab_mask, gnn_mask, win_local, lab_idx,
        g_out_t, g_out_g,
        projp2, projl2, w1bd, b1cat, w2cat,
    )
    dprojp2, dprojl2, dw1bd, db1cat, dw2cat, db2pair = douts
    num_p = proj_p_t.shape[0]
    num_l = proj_l_t.shape[0]
    dt = proj_p_t.dtype
    return (
        dprojp2[:num_p, :h0].astype(dt),
        dprojl2[:num_l, :h0].astype(dt),
        dw1bd[:h0, :h1].astype(w1_t.dtype),
        db1cat[0, :h1].reshape(b1_t.shape).astype(b1_t.dtype),
        dw2cat[0, :h1].reshape(w2_t.shape).astype(w2_t.dtype),
        db2pair[0, 0].reshape(b2_t.shape).astype(b2_t.dtype),
        dprojp2[:num_p, h0:].astype(dt),
        dprojl2[:num_l, h0:].astype(dt),
        dw1bd[h0:, h1:].astype(w1_g.dtype),
        db1cat[0, h1:].reshape(b1_g.shape).astype(b1_g.dtype),
        dw2cat[0, h1:].reshape(w2_g.shape).astype(w2_g.dtype),
        db2pair[0, 1].reshape(b2_g.shape).astype(b2_g.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(18, 19, 20))
def fused_pair_head_dual(
    proj_p_t, proj_l_t, w1_t, b1_t, w2_t, b2_t,
    proj_p_g, proj_l_g, w1_g, b1_g, w2_g, b2_g,
    lab_idx, win_local, win_tile_map, seed4, tab_mask, gnn_mask,
    num_windows, rate=0.0, interpret=False,
):
    """Both degree-gated heads in one kernel call: returns (out_tab, out_gnn).

    Same slot-major contract as :func:`fused_pair_head`.  ``seed4``
    (uint32[4]) carries both heads' dropout seeds; the kernel draws one
    stream over the concatenated activations (see module note).  ``tab_mask``
    / ``gnn_mask`` predicate per head: a head's output is exact zero on its
    masked tiles, and tiles masked for BOTH heads skip the body entirely.
    Requires both heads to share (H0, H1) and no span-bounded lab blocks.
    """
    return _dual_fused_fwd(
        proj_p_t, proj_l_t, w1_t, b1_t, w2_t, b2_t,
        proj_p_g, proj_l_g, w1_g, b1_g, w2_g, b2_g,
        lab_idx, win_local, win_tile_map, seed4, tab_mask, gnn_mask,
        num_windows, rate, interpret,
    )


def _fphd_fwd(
    proj_p_t, proj_l_t, w1_t, b1_t, w2_t, b2_t,
    proj_p_g, proj_l_g, w1_g, b1_g, w2_g, b2_g,
    lab_idx, win_local, win_tile_map, seed4, tab_mask, gnn_mask,
    num_windows, rate, interpret,
):
    out = _dual_fused_fwd(
        proj_p_t, proj_l_t, w1_t, b1_t, w2_t, b2_t,
        proj_p_g, proj_l_g, w1_g, b1_g, w2_g, b2_g,
        lab_idx, win_local, win_tile_map, seed4, tab_mask, gnn_mask,
        num_windows, rate, interpret,
    )
    return out, (
        proj_p_t, proj_l_t, w1_t, b1_t, w2_t, b2_t,
        proj_p_g, proj_l_g, w1_g, b1_g, w2_g, b2_g,
        lab_idx, win_local, win_tile_map, seed4, tab_mask, gnn_mask,
    )


def _fphd_bwd(num_windows, rate, interpret, res, g):
    (proj_p_t, proj_l_t, w1_t, b1_t, w2_t, b2_t,
     proj_p_g, proj_l_g, w1_g, b1_g, w2_g, b2_g,
     lab_idx, win_local, win_tile_map, seed4, tab_mask, gnn_mask) = res
    g_out_t, g_out_g = g
    grads = _dual_fused_bwd(
        proj_p_t, proj_l_t, w1_t, b1_t, w2_t, b2_t,
        proj_p_g, proj_l_g, w1_g, b1_g, w2_g, b2_g,
        lab_idx, win_local, win_tile_map, seed4, tab_mask, gnn_mask,
        g_out_t, g_out_g,
        num_windows, rate, interpret,
    )
    zero_i = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)  # noqa: E731
    zopt = lambda a: None if a is None else zero_i(a)  # noqa: E731
    return (
        *grads,
        zero_i(lab_idx), zero_i(win_local), zero_i(win_tile_map),
        zero_i(seed4), zopt(tab_mask), zopt(gnn_mask),
    )


fused_pair_head_dual.defvjp(_fphd_fwd, _fphd_bwd)
