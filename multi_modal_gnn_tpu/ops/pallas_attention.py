"""Windowed flash-attention kernels for HGT (Pallas TPU).

The HGT segment tier's per-edge q/k/v gathers and two segment-softmax passes
are the same latency-bound random-access pattern the RGCN path eliminated
with windowed indicator matmuls (round-4 verdict; PERFORMANCE.md "HGT
throughput": ~87 of 88.75 ms in gathers).  This module gives grouped
attention the identical kernel treatment, on the COMBINED per-destination
edge layouts of graph/attn_plan.py:

  * the grid walks TILE_E-edge tiles whose destinations share one 128-row
    window (graph/hetero.py build_window_plan) — consecutive tiles of a
    window revisit the same VMEM output block;
  * attention is computed FLASH-style per window row: a running max and
    normalizer live in VMEM scratch across a window's tiles, the output
    block accumulates unnormalized weighted values and is normalized on the
    window's last tile, and the log-sum-exp lands in a stats output that
    the backward reuses (so no second softmax pass ever runs);
  * per tile the only large operands are MXU matmuls: the [WINDOW, TILE_E]
    masked logits via ``dot_general(q_window, k_tile)`` per head, and the
    [WINDOW, TILE_E] x [TILE_E, dh] probability-weighted value accumulation
    — no [edges, heads, dh] tensor ever exists in HBM (the structure that
    made full-batch HGT RESOURCE_EXHAUSTED at 5M edges);
  * gather sides ride either a VMEM-resident packed table (small side —
    labs/diagnoses/medications) or a double-buffered span DMA
    (build_src_span_plan re-lays each window's edges so a tile's sources
    live in one contiguous [span_rows, width] block — the patient side);
  * the BACKWARD is two more window walks, not a scatter: dq accumulates in
    the forward layout (dq rows ARE destination windows), and dk/dv
    accumulate in the REVERSE layout (windows over the virtual source), with
    q/dO/lse/delta gathered from the destination side.  XLA's serialized
    scatter never appears (CLAUDE.md invariant).

Numerics match the segment tier exactly (same grouped softmax over all
relations into a destination, duplicate edges each carrying their own
slot); pinned in tests/test_attention_kernel.py.

Reference parity surface: attention message passing of the reference's
``HGTConv`` alternative (src/model.py:403-516).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_modal_gnn_tpu.graph.attn_plan import AttnGroupPlan, AttnSidePlan
from multi_modal_gnn_tpu.graph.hetero import TILE_E, WINDOW, _round_up

# stats/side-data lane width: cols [0, nh) hold the per-head log-sum-exp,
# cols [nh, 2 nh) the per-head delta (backward); 128 keeps Mosaic lane tiling
STATS_W = 128
# exp-argument clamp: mathematically the argument is <= 0 for real entries
# (log of a probability); garbage lanes (masked by the indicator) could
# otherwise produce inf, and inf * 0 = NaN inside the masking multiply
_EXP_CLAMP = 60.0


def _first_last(tm_ref):
    """Whether this grid step enters / leaves its output window."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    cur = tm_ref[t]
    prev = jnp.where(t > 0, tm_ref[jnp.maximum(t - 1, 0)], -1)
    nxt = jnp.where(t + 1 < nt, tm_ref[jnp.minimum(t + 1, nt - 1)], -1)
    return prev != cur, nxt != cur


def _gather_rows(block: jax.Array, idx: jax.Array, mode: str) -> jax.Array:
    """rows = block[idx] inside the kernel.

    "tala": ``take_along_axis`` with shape-matched indices — Mosaic's
    dynamic-gather lowers exactly when the block's sublane count equals the
    tile length (probed per backend), making the gather a VPU/memory op
    instead of FLOPs.  "take": plain ``jnp.take`` (rejected by this chip's
    Mosaic).  "indicator": the gather as one MXU matmul — always lowers,
    O(T * rows) FLOPs (the measured fallback cost is ~60% of the kernels'
    MACs, which is why tala matters)."""
    if mode == "tala":
        idx2 = jnp.broadcast_to(
            jnp.clip(idx, 0, block.shape[0] - 1).reshape(-1, 1),
            (idx.shape[0], block.shape[1]),
        )
        return jnp.take_along_axis(block, idx2, axis=0)
    if mode == "take":
        return jnp.take(block, idx, axis=0)
    rows = block.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], rows), 1)
    p = (idx.reshape(-1, 1) == cols).astype(block.dtype)
    return jnp.dot(p, block, preferred_element_type=jnp.float32).astype(block.dtype)


def _indicator(local: jax.Array) -> jax.Array:
    """S[w, e] = 1 where tile edge e lands on window row w (pad = no row)."""
    t = local.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, t), 0)
    return (local.reshape(1, t) == rows).astype(jnp.float32)


# ---------------------------------------------------------------------------
# forward: out[d] = softmax-weighted mean of v over d's incoming edges
# ---------------------------------------------------------------------------


def _fwd_compute(local_ref, q_ref, out_ref, stats_ref, m_scr, d_scr, kv, idx, *, nh, mode, first, last, bound=None):
    """Shared flash-forward tile body.  ``kv`` is the gather block
    ([rows, 2h]: k | v packed), ``idx`` the block-relative source rows.
    ``bound`` clamps the gather to the block's INITIALIZED rows — a span-DMA
    scratch taller than span_rows (the tala layout) carries uninitialized
    VMEM above it, and a pad slot's clipped index reading a garbage NaN/Inf
    row poisons the accumulation through 0 * garbage (hardware-observed:
    epoch-0 NaN at scale; interpret scratch is zeroed, which is why CPU
    parity never saw it)."""
    h = q_ref.shape[1]
    dh = h // nh

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        d_scr[:] = jnp.zeros_like(d_scr)

    idx_c = jnp.clip(idx, 0, (kv.shape[0] if bound is None else bound) - 1)
    kv_tile = _gather_rows(kv, idx_c, mode)  # [TILE_E, 2h]
    s = _indicator(local_ref[:])  # [WINDOW, TILE_E]
    q = q_ref[:]
    for head in range(nh):
        sl = slice(head * dh, (head + 1) * dh)
        slv = slice(h + head * dh, h + (head + 1) * dh)
        # L[w, e] = q[w] . k[e]  — MXU, rhs-transposed contraction
        logits = jax.lax.dot_general(
            q[:, sl], kv_tile[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        masked = jnp.where(s > 0, logits, -1e30)
        tile_max = jnp.max(masked, axis=1, keepdims=True)  # [W, 1]
        m_old = m_scr[:, head : head + 1]
        m_new = jnp.maximum(m_old, tile_max)
        p = jnp.exp(masked - m_new) * s  # <= 0 argument: no overflow
        corr = jnp.exp(m_old - m_new)
        d_scr[:, head : head + 1] = d_scr[:, head : head + 1] * corr + jnp.sum(
            p, axis=1, keepdims=True
        )
        out_ref[:, sl] = out_ref[:, sl] * corr + jnp.dot(
            p, kv_tile[:, slv], preferred_element_type=jnp.float32
        )
        m_scr[:, head : head + 1] = m_new

    @pl.when(last)
    def _():
        for head in range(nh):
            sl = slice(head * dh, (head + 1) * dh)
            out_ref[:, sl] = out_ref[:, sl] / jnp.maximum(
                d_scr[:, head : head + 1], 1e-20
            )
        # lse = m + log d; empty rows -> +1e30 so exp(x - lse) == 0 downstream
        stats_ref[:] = jnp.where(
            d_scr[:] > 0,
            m_scr[:] + jnp.log(jnp.maximum(d_scr[:], 1e-30)),
            1e30,
        )


def _fwd_kernel_resident(tm_ref, local_ref, src_ref, q_ref, kv_ref, out_ref, stats_ref, m_scr, d_scr, *, nh, mode):
    first, last = _first_last(tm_ref)
    _fwd_compute(
        local_ref, q_ref, out_ref, stats_ref, m_scr, d_scr,
        kv_ref[:], src_ref[:], nh=nh, mode=mode, first=first, last=last,
    )


def _fwd_kernel_span(
    tm_ref, base_ref, local_ref, src_ref, q_ref, kv_hbm, out_ref, stats_ref,
    m_scr, d_scr, kv_scr, sems, *, nh, mode, span_rows,
):
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    def _copy(tile, slot):
        base = pl.multiple_of(base_ref[tile], 16)  # SPAN_BASE_ALIGN
        return pltpu.make_async_copy(
            kv_hbm.at[pl.ds(base, span_rows)],
            kv_scr.at[slot, pl.ds(0, span_rows)],
            sems.at[slot],
        )

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        _copy(0, 0).start()

    @pl.when(t + 1 < nt)
    def _():
        _copy(t + 1, jax.lax.rem(t + 1, 2)).start()

    _copy(t, slot).wait()
    first, last = _first_last(tm_ref)
    _fwd_compute(
        local_ref, q_ref, out_ref, stats_ref, m_scr, d_scr,
        kv_scr[slot], src_ref[:] - base_ref[t], nh=nh, mode=mode,
        first=first, last=last, bound=span_rows,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_windows", "nh", "span_rows", "mode", "interpret"),
)
def _flash_fwd_call(
    q_pad, kv_pack, local, src, tile_map, base, num_windows, nh, span_rows,
    mode, interpret,
):
    h = q_pad.shape[1]
    num_tiles = local.shape[0] // TILE_E
    out_shapes = [
        jax.ShapeDtypeStruct((num_windows * WINDOW, h), jnp.float32),
        jax.ShapeDtypeStruct((num_windows * WINDOW, STATS_W), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((WINDOW, STATS_W), jnp.float32),
        pltpu.VMEM((WINDOW, STATS_W), jnp.float32),
    ]
    if span_rows:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # tile_map, base
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((TILE_E,), lambda t, tm, sb: (t,)),
                pl.BlockSpec((TILE_E,), lambda t, tm, sb: (t,)),
                pl.BlockSpec((WINDOW, h), lambda t, tm, sb: (tm[t], 0)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ],
            out_specs=[
                pl.BlockSpec((WINDOW, h), lambda t, tm, sb: (tm[t], 0)),
                pl.BlockSpec((WINDOW, STATS_W), lambda t, tm, sb: (tm[t], 0)),
            ],
            scratch_shapes=scratch + [
                pltpu.VMEM(
                    (2, _scratch_rows(span_rows, mode), kv_pack.shape[1]),
                    kv_pack.dtype,
                ),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        # scratch order in kernel signature: m, d then kv_scr, sems — match
        def _kernel(tm, sb, local_r, src_r, q_r, kv_r, out_r, st_r, m_s, d_s, kv_s, sem_s):
            _fwd_kernel_span(
                tm, sb, local_r, src_r, q_r, kv_r, out_r, st_r, m_s, d_s,
                kv_s, sem_s, nh=nh, mode=mode, span_rows=span_rows,
            )
        return pl.pallas_call(
            _kernel, grid_spec=grid_spec, out_shape=out_shapes, interpret=interpret
        )(tile_map, base, local, src, q_pad, kv_pack)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_E,), lambda t, tm: (t,)),
            pl.BlockSpec((TILE_E,), lambda t, tm: (t,)),
            pl.BlockSpec((WINDOW, h), lambda t, tm: (tm[t], 0)),
            # constant index map: packed k|v table VMEM-resident
            pl.BlockSpec(kv_pack.shape, lambda t, tm: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((WINDOW, h), lambda t, tm: (tm[t], 0)),
            pl.BlockSpec((WINDOW, STATS_W), lambda t, tm: (tm[t], 0)),
        ],
        scratch_shapes=scratch,
    )
    kernel = functools.partial(_fwd_kernel_resident, nh=nh, mode=mode)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes, interpret=interpret
    )(tile_map, local, src, q_pad, kv_pack)


# ---------------------------------------------------------------------------
# backward pass A (forward layout): dq accumulated per destination window
# ---------------------------------------------------------------------------


def _dq_compute(local_ref, qds_ref, dq_ref, kv, idx, *, nh, mode, first, bound=None):
    h = dq_ref.shape[1]
    dh = h // nh

    @pl.when(first)
    def _():
        dq_ref[:] = jnp.zeros_like(dq_ref)

    idx_c = jnp.clip(idx, 0, (kv.shape[0] if bound is None else bound) - 1)
    kv_tile = _gather_rows(kv, idx_c, mode)  # [TILE_E, 2h]
    s = _indicator(local_ref[:])
    qds = qds_ref[:]  # [WINDOW, 2h + STATS_W]: q | dO | (lse, delta)
    for head in range(nh):
        sl = slice(head * dh, (head + 1) * dh)
        sld = slice(h + head * dh, h + (head + 1) * dh)
        logits = jax.lax.dot_general(
            qds[:, sl], kv_tile[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        lse = qds[:, 2 * h + head : 2 * h + head + 1]
        delta = qds[:, 2 * h + nh + head : 2 * h + nh + head + 1]
        p = jnp.exp(jnp.minimum(logits - lse, _EXP_CLAMP)) * s
        d_attn = jax.lax.dot_general(
            qds[:, sld], kv_tile[:, h + head * dh : h + (head + 1) * dh],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [W, T] = dO[w] . v[e]
        dl = p * (d_attn - delta)
        dq_ref[:, sl] += jnp.dot(
            dl, kv_tile[:, sl], preferred_element_type=jnp.float32
        )


def _dq_kernel_resident(tm_ref, local_ref, src_ref, qds_ref, kv_ref, dq_ref, *, nh, mode):
    first, _ = _first_last(tm_ref)
    _dq_compute(local_ref, qds_ref, dq_ref, kv_ref[:], src_ref[:], nh=nh, mode=mode, first=first)


def _dq_kernel_span(
    tm_ref, base_ref, local_ref, src_ref, qds_ref, kv_hbm, dq_ref, kv_scr, sems,
    *, nh, mode, span_rows,
):
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    def _copy(tile, slot):
        base = pl.multiple_of(base_ref[tile], 16)
        return pltpu.make_async_copy(
            kv_hbm.at[pl.ds(base, span_rows)],
            kv_scr.at[slot, pl.ds(0, span_rows)],
            sems.at[slot],
        )

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        _copy(0, 0).start()

    @pl.when(t + 1 < nt)
    def _():
        _copy(t + 1, jax.lax.rem(t + 1, 2)).start()

    _copy(t, slot).wait()
    first, _ = _first_last(tm_ref)
    _dq_compute(
        local_ref, qds_ref, dq_ref, kv_scr[slot], src_ref[:] - base_ref[t],
        nh=nh, mode=mode, first=first, bound=span_rows,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_windows", "nh", "h", "span_rows", "mode", "interpret"),
)
def _flash_dq_call(
    qds_pad, kv_pack, local, src, tile_map, base, num_windows, nh, h, span_rows,
    mode, interpret,
):
    num_tiles = local.shape[0] // TILE_E
    w_qds = qds_pad.shape[1]
    out_shape = jax.ShapeDtypeStruct((num_windows * WINDOW, h), jnp.float32)
    if span_rows:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((TILE_E,), lambda t, tm, sb: (t,)),
                pl.BlockSpec((TILE_E,), lambda t, tm, sb: (t,)),
                pl.BlockSpec((WINDOW, w_qds), lambda t, tm, sb: (tm[t], 0)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ],
            out_specs=pl.BlockSpec((WINDOW, h), lambda t, tm, sb: (tm[t], 0)),
            scratch_shapes=[
                pltpu.VMEM(
                    (2, _scratch_rows(span_rows, mode), kv_pack.shape[1]),
                    kv_pack.dtype,
                ),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )

        def _kernel(tm, sb, local_r, src_r, qds_r, kv_r, dq_r, kv_s, sem_s):
            _dq_kernel_span(
                tm, sb, local_r, src_r, qds_r, kv_r, dq_r, kv_s, sem_s,
                nh=nh, mode=mode, span_rows=span_rows,
            )

        return pl.pallas_call(
            _kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret
        )(tile_map, base, local, src, qds_pad, kv_pack)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_E,), lambda t, tm: (t,)),
            pl.BlockSpec((TILE_E,), lambda t, tm: (t,)),
            pl.BlockSpec((WINDOW, w_qds), lambda t, tm: (tm[t], 0)),
            pl.BlockSpec(kv_pack.shape, lambda t, tm: (0, 0)),
        ],
        out_specs=pl.BlockSpec((WINDOW, h), lambda t, tm: (tm[t], 0)),
    )
    kernel = functools.partial(_dq_kernel_resident, nh=nh, mode=mode)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret
    )(tile_map, local, src, qds_pad, kv_pack)


# ---------------------------------------------------------------------------
# backward pass B (reverse layout): dk/dv accumulated per source window
# ---------------------------------------------------------------------------


def _dkv_compute(local_ref, kv_ref, dk_ref, dv_ref, qds, idx, *, nh, mode, first, bound=None):
    h = dk_ref.shape[1]
    dh = h // nh

    @pl.when(first)
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    idx_c = jnp.clip(idx, 0, (qds.shape[0] if bound is None else bound) - 1)
    qds_tile = _gather_rows(qds, idx_c, mode)  # [TILE_E, 2h + STATS_W]
    local = local_ref[:]
    s = _indicator(local)
    valid = (local < WINDOW).astype(jnp.float32).reshape(-1, 1)  # [T, 1]
    kv_blk = kv_ref[:]  # [WINDOW, 2h] window block of the packed k|v table
    # per-edge k and v rows of THIS window: k_e = S^T @ k_block  (MXU)
    k_e = jax.lax.dot_general(
        s, kv_blk[:, :h], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, h]
    v_e = jax.lax.dot_general(
        s, kv_blk[:, h:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for head in range(nh):
        sl = slice(head * dh, (head + 1) * dh)
        sld = slice(h + head * dh, h + (head + 1) * dh)
        logit = jnp.sum(qds_tile[:, sl] * k_e[:, sl], axis=1, keepdims=True)  # [T,1]
        lse_e = qds_tile[:, 2 * h + head : 2 * h + head + 1]
        delta_e = qds_tile[:, 2 * h + nh + head : 2 * h + nh + head + 1]
        p_e = jnp.exp(jnp.minimum(logit - lse_e, _EXP_CLAMP)) * valid
        d_attn_e = jnp.sum(qds_tile[:, sld] * v_e[:, sl], axis=1, keepdims=True)
        dl_e = p_e * (d_attn_e - delta_e)
        dk_ref[:, sl] += jnp.dot(
            s, dl_e * qds_tile[:, sl], preferred_element_type=jnp.float32
        )
        dv_ref[:, sl] += jnp.dot(
            s, p_e * qds_tile[:, sld], preferred_element_type=jnp.float32
        )


def _dkv_kernel_resident(tm_ref, local_ref, src_ref, kv_ref, qds_ref, dk_ref, dv_ref, *, nh, mode):
    first, _ = _first_last(tm_ref)
    _dkv_compute(
        local_ref, kv_ref, dk_ref, dv_ref, qds_ref[:], src_ref[:],
        nh=nh, mode=mode, first=first,
    )


def _dkv_kernel_span(
    tm_ref, base_ref, local_ref, src_ref, kv_ref, qds_hbm, dk_ref, dv_ref,
    qds_scr, sems, *, nh, mode, span_rows,
):
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    def _copy(tile, slot):
        base = pl.multiple_of(base_ref[tile], 16)
        return pltpu.make_async_copy(
            qds_hbm.at[pl.ds(base, span_rows)],
            qds_scr.at[slot, pl.ds(0, span_rows)],
            sems.at[slot],
        )

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        _copy(0, 0).start()

    @pl.when(t + 1 < nt)
    def _():
        _copy(t + 1, jax.lax.rem(t + 1, 2)).start()

    _copy(t, slot).wait()
    first, _ = _first_last(tm_ref)
    _dkv_compute(
        local_ref, kv_ref, dk_ref, dv_ref, qds_scr[slot],
        src_ref[:] - base_ref[t], nh=nh, mode=mode, first=first,
        bound=span_rows,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_windows", "nh", "h", "span_rows", "mode", "interpret"),
)
def _flash_dkv_call(
    kv_pack_pad, qds_pad, local, src, tile_map, base, num_windows, nh, h,
    span_rows, mode, interpret,
):
    num_tiles = local.shape[0] // TILE_E
    w_qds = qds_pad.shape[1]
    out_shapes = [
        jax.ShapeDtypeStruct((num_windows * WINDOW, h), jnp.float32),
        jax.ShapeDtypeStruct((num_windows * WINDOW, h), jnp.float32),
    ]
    if span_rows:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((TILE_E,), lambda t, tm, sb: (t,)),
                pl.BlockSpec((TILE_E,), lambda t, tm, sb: (t,)),
                pl.BlockSpec((WINDOW, 2 * h), lambda t, tm, sb: (tm[t], 0)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ],
            out_specs=[
                pl.BlockSpec((WINDOW, h), lambda t, tm, sb: (tm[t], 0)),
                pl.BlockSpec((WINDOW, h), lambda t, tm, sb: (tm[t], 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, _scratch_rows(span_rows, mode), w_qds), qds_pad.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )

        def _kernel(tm, sb, local_r, src_r, kv_r, qds_r, dk_r, dv_r, qds_s, sem_s):
            _dkv_kernel_span(
                tm, sb, local_r, src_r, kv_r, qds_r, dk_r, dv_r, qds_s, sem_s,
                nh=nh, mode=mode, span_rows=span_rows,
            )

        return pl.pallas_call(
            _kernel, grid_spec=grid_spec, out_shape=out_shapes, interpret=interpret
        )(tile_map, base, local, src, kv_pack_pad, qds_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_E,), lambda t, tm: (t,)),
            pl.BlockSpec((TILE_E,), lambda t, tm: (t,)),
            pl.BlockSpec((WINDOW, 2 * h), lambda t, tm: (tm[t], 0)),
            pl.BlockSpec(qds_pad.shape, lambda t, tm: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((WINDOW, h), lambda t, tm: (tm[t], 0)),
            pl.BlockSpec((WINDOW, h), lambda t, tm: (tm[t], 0)),
        ],
    )
    kernel = functools.partial(_dkv_kernel_resident, nh=nh, mode=mode)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes, interpret=interpret
    )(tile_map, local, src, kv_pack_pad, qds_pad)


# ---------------------------------------------------------------------------
# host-level wrapper with custom VJP
# ---------------------------------------------------------------------------


def _pad_rows(x: jax.Array, rows: int) -> jax.Array:
    if x.shape[0] == rows:
        return x
    return jnp.pad(x, ((0, rows - x.shape[0]), (0, 0)))


def _side_arrays(side: AttnSidePlan):
    """(local, src, tile_map, base, span_rows) — span layout when present."""
    if side.use_span:
        return side.span_local, side.span_src, side.span_tile_map, side.span_base, side.span_rows
    zero_base = jnp.zeros((side.win_tile_map.shape[0],), jnp.int32)
    return side.win_local, side.win_src, side.win_tile_map, zero_base, 0


def _tala_supported() -> bool:
    """Whether the in-kernel shape-matched ``take_along_axis`` gather may be
    used on this backend.

    HARDWARE-MEASURED NEGATIVE (v5e, 2026-08-21): the tala gather LOWERS
    cleanly (scripts/lower_check_tpu.py — Pallas->Mosaic accepts it at
    TILE_E sublanes), but the Mosaic BACKEND compile rejects it:
    ``tpu.dynamic_gather`` on a [1024, 256] f32 table fails with
    "Not implemented: Multiple source vregs along gather dimension" — the
    v5e gather primitive cannot cross vregs along the sublane (row) axis,
    and a TILE_E-row table spans 128 of them.  A lowering-only probe
    therefore over-approximates on tpu, so tala defaults OFF there;
    ``MMGNN_ATTN_TALA=1`` re-enables it for backends whose Mosaic
    implements multi-vreg gathers (the kernels themselves are
    mode-agnostic, tests/test_attention_kernel.py runs all modes in
    interpret)."""
    import os

    env = os.environ.get("MMGNN_ATTN_TALA", "auto")
    if env == "0":
        return False
    if jax.default_backend() != "tpu":
        return True  # interpret mode executes numpy semantics
    return env == "1"


def _gather_mode() -> str:
    """Pick the in-kernel gather implementation (see :func:`_gather_rows`).
    tala (where a backend supports it) wants TILE_E-sublane blocks — the
    row-sizing helpers below pad for it; in the other modes blocks stay at
    their natural height (span_rows / padded table rows), which is what
    keeps the indicator gather's FLOPs proportional to the SPAN height
    rather than TILE_E (8x at span_rows 128)."""
    if _tala_supported():
        return "tala"
    from multi_modal_gnn_tpu.ops.pallas_segment import _vmem_take_supported

    return "take" if _vmem_take_supported() else "indicator"


def _scratch_rows(span_rows: int, mode: str) -> int:
    """Physical span-DMA scratch height: exactly the DMA'd span except
    under tala (shape-matched gather needs TILE_E sublanes; the gather is
    then clamped to ``bound`` = span_rows so the uninitialized rows above
    the DMA are never read)."""
    return max(span_rows, TILE_E) if mode == "tala" else span_rows


def _kv_rows(plan: AttnGroupPlan, mode: str) -> int:
    rows = _round_up(max(plan.num_src_total, 1), WINDOW)
    rows = max(rows, plan.rev.num_windows * WINDOW)
    if plan.fwd.use_span:
        rows = max(rows, plan.fwd.span_rows)
    elif mode == "tala":
        # resident gather block: pad to TILE_E sublanes so the tala gather
        # (shape-matched take_along_axis — _gather_rows doc) applies
        rows = max(rows, TILE_E)
    return rows


def _qds_rows(plan: AttnGroupPlan, mode: str) -> int:
    rows = plan.fwd.num_windows * WINDOW
    if plan.rev.use_span:
        rows = max(rows, plan.rev.span_rows)
    elif mode == "tala":
        rows = max(rows, TILE_E)  # resident: tala needs TILE_E sublanes
    return rows


def _flash_fwd_pair(q_s, k, v, plan: AttnGroupPlan, nh, interpret):
    mode = _gather_mode()
    q_pad = _pad_rows(q_s.astype(jnp.float32), plan.fwd.num_windows * WINDOW)
    kv = _pad_rows(
        jnp.concatenate([k, v], axis=1).astype(jnp.float32), _kv_rows(plan, mode)
    )
    local, src, tm, base, span_rows = _side_arrays(plan.fwd)
    out_pad, stats = _flash_fwd_call(
        q_pad, kv, local, src, tm, base,
        plan.fwd.num_windows, nh, span_rows, mode, interpret,
    )
    return out_pad[: plan.num_dst], (out_pad, stats)


def flash_attention_group(
    q: jax.Array,  # [num_dst, h] UNSCALED query projections
    k: jax.Array,  # [num_src_total, h] per-relation key projections, stacked
    v: jax.Array,  # [num_src_total, h] value projections, stacked
    plan: AttnGroupPlan,
    num_heads: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Grouped multi-head attention aggregate per destination node.

    Equals the segment tier (``segment_softmax`` over all relations into the
    destination) exactly: softmax over each destination's incoming edges of
    ``q[dst] . k[src] / sqrt(dh)`` per head, weighting ``v[src]``.  Returns
    ``[num_dst, h]`` (head outputs concatenated; empty destinations -> 0).

    The custom VJP closes over ``plan`` (which may hold traced arrays under
    jit — the same closure pattern as fused_table_aggregate), so the plan
    never needs a cotangent and the backward runs the two window-walk
    kernels instead of XLA scatters.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    interpret = bool(interpret)
    nh = int(num_heads)
    h = q.shape[1]
    dh = h // nh

    @jax.custom_vjp
    def attn(q_s, k_t, v_t):
        out, _ = _flash_fwd_pair(q_s, k_t, v_t, plan, nh, interpret)
        return out

    def fwd(q_s, k_t, v_t):
        out, (out_pad, stats) = _flash_fwd_pair(q_s, k_t, v_t, plan, nh, interpret)
        return out, (q_s, k_t, v_t, out_pad, stats)

    def bwd(res, g):
        q_s, k_t, v_t, out_pad, stats = res
        rows_fwd = plan.fwd.num_windows * WINDOW
        do_pad = _pad_rows(g.astype(jnp.float32), rows_fwd)
        # delta[d, head] = dO[d] . out[d] per head — flash-backward constant
        delta = (do_pad * out_pad).reshape(rows_fwd, nh, dh).sum(-1)
        sd = jnp.concatenate(
            [stats[:, :nh], delta,
             jnp.zeros((rows_fwd, STATS_W - 2 * nh), jnp.float32)],
            axis=1,
        )
        qds = jnp.concatenate(
            [_pad_rows(q_s.astype(jnp.float32), rows_fwd), do_pad, sd], axis=1
        )
        mode = _gather_mode()
        qds = _pad_rows(qds, _qds_rows(plan, mode))
        kv = _pad_rows(
            jnp.concatenate([k_t, v_t], axis=1).astype(jnp.float32),
            _kv_rows(plan, mode),
        )
        # pass A: dq in the forward layout (dq rows ARE destination windows)
        local, src, tm, base, span_rows = _side_arrays(plan.fwd)
        dq = _flash_dq_call(
            qds, kv, local, src, tm, base,
            plan.fwd.num_windows, nh, h, span_rows, mode, interpret,
        )[: plan.num_dst]
        # pass B: dk/dv in the reverse layout (windows over virtual source)
        local_r, src_r, tm_r, base_r, span_rows_r = _side_arrays(plan.rev)
        dk_pad, dv_pad = _flash_dkv_call(
            kv[: plan.rev.num_windows * WINDOW], qds, local_r, src_r, tm_r,
            base_r, plan.rev.num_windows, nh, h, span_rows_r, mode, interpret,
        )
        n_src = plan.num_src_total
        return (
            dq.astype(q_s.dtype),
            dk_pad[:n_src].astype(k_t.dtype),
            dv_pad[:n_src].astype(v_t.dtype),
        )

    attn.defvjp(fwd, bwd)
    return attn(q / math.sqrt(float(dh)), k, v)


def flash_attention_ref(
    q: jax.Array, k: jax.Array, v: jax.Array, plan: AttnGroupPlan, num_heads: int
) -> jax.Array:
    """Pure-jnp reference (segment ops over the plan's window arrays) —
    the oracle for the kernel parity tests."""
    h = q.shape[1]
    dh = h // num_heads
    side = plan.fwd
    e = side.win_src.shape[0]
    window_of_slot = jnp.repeat(
        side.win_tile_map[: e // TILE_E], TILE_E, total_repeat_length=e
    )
    rows = side.num_windows * WINDOW
    valid = side.win_local < WINDOW
    dst = jnp.where(
        valid, window_of_slot * WINDOW + jnp.minimum(side.win_local, WINDOW - 1), rows
    )
    q_pad = _pad_rows(q, rows)
    q_e = jnp.take(q_pad, jnp.minimum(dst, rows - 1), axis=0).reshape(e, num_heads, dh)
    k_e = jnp.take(k, side.win_src, axis=0).reshape(e, num_heads, dh)
    v_e = jnp.take(v, side.win_src, axis=0).reshape(e, num_heads, dh)
    logit = (q_e * k_e).sum(-1) / math.sqrt(float(dh))  # [e, nh]
    logit = jnp.where(valid[:, None], logit, -jnp.inf)
    from multi_modal_gnn_tpu.ops.segment import segment_softmax

    attn = segment_softmax(logit, dst, num_segments=rows + 1)
    attn = jnp.where(jnp.isfinite(logit), attn, 0.0)
    agg = jax.ops.segment_sum(
        (v_e * attn[..., None]).reshape(e, h), dst, num_segments=rows + 1
    )[: plan.num_dst]
    return agg
