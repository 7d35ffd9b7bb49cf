"""Fused segment reduction as MXU matmuls (Pallas TPU kernel).

The neighbor-aggregation scatter-add — the one place the reference leans on
compiled CUDA (torch-scatter, via PyG's SAGEConv; reference
requirements.txt:13-22) — reformulated for the TPU systolic array:

  * edges are dst-sorted and regrouped at graph-build time into a *windowed*
    layout (graph/hetero.py:build_window_plan): every fixed TILE_E=1024-edge
    tile's destinations fall inside one 128-row output window, and each
    window owns a whole number of tiles;
  * per grid step the kernel builds a segment-indicator matrix
    ``S[w, e] = (win_local[e] == w)`` (128 x 1024, VPU compare against a
    broadcasted iota) and accumulates ``S @ G_tile`` (128x1024 @ 1024xD)
    straight on the MXU into the window's VMEM-resident output block;
  * consecutive tiles of the same window revisit the same output block
    (index map reads the tile->window table via scalar prefetch), so
    accumulation happens in VMEM and each output row is written to HBM once;
  * padding slots carry ``win_local == 128`` — the indicator compare kills
    them, no masking multiplies needed.

The gather ``G = x_src[win_src]`` stays an XLA gather (TPU lowers it to
efficient dynamic-slice DMA streams), and the backward pass is just the
transpose gather ``dG[e] = g_out[dst[e]]`` — wired up via custom_vjp.
"""

from __future__ import annotations

import functools
import logging
from typing import Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_modal_gnn_tpu.graph.hetero import TILE_E, WINDOW, EdgeSet

logger = logging.getLogger(__name__)


def _zero_out_on_new_window(tile_map_ref, out_ref):
    """Zero the output block when this grid step enters a new window.

    Consecutive tiles of one window revisit the same VMEM output block (the
    out index map reads the tile->window table); the first tile of each
    window must initialize it."""
    t = pl.program_id(0)
    prev_same = jnp.where(t > 0, tile_map_ref[jnp.maximum(t - 1, 0)], -1)

    @pl.when(jnp.logical_or(t == 0, prev_same != tile_map_ref[t]))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


def _window_indicator(local_ref, dtype):
    """S[w, e] = 1 where this tile's edge e lands on window row w.

    [WINDOW, TILE_E]; padding slots carry ``local == WINDOW`` so the compare
    kills them — no masking multiplies needed anywhere downstream."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, TILE_E), 0)
    return (local_ref[:].reshape(1, TILE_E) == rows).astype(dtype)


def _src_indicator_t(src_ref, s_pad, dtype):
    """P^T[s, e] = 1 where edge e reads source row s ([s_pad, TILE_E]) —
    the scatter-by-src of a backward pass as one MXU matmul operand."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (s_pad, TILE_E), 0)
    return (src_ref[:].reshape(1, TILE_E) == cols).astype(dtype)


def _segment_kernel(tile_map_ref, local_ref, g_ref, out_ref):
    """One grid step: out[window] += indicator(local) @ g_tile.

    The matmul runs at the input dtype (bf16 inputs hit the MXU at 4x the
    f32 rate) and ALWAYS accumulates in f32 — strictly better numerics than
    XLA's segment_sum on bf16 data, which accumulates in bf16.
    """
    _zero_out_on_new_window(tile_map_ref, out_ref)
    s = _window_indicator(local_ref, g_ref.dtype)
    out_ref[:] += jnp.dot(s, g_ref[:], preferred_element_type=jnp.float32)


def _out_struct(shape, dtype, like) -> jax.ShapeDtypeStruct:
    """ShapeDtypeStruct carrying the caller's varying-mesh-axes set: under
    shard_map (the per-shard DP kernel path) pallas_call outputs must declare
    which mesh axes they vary over; outside shard_map vma is empty."""
    vma = getattr(jax.typeof(like), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def _windowed_segment_sum_ref(gathered, win_local, win_tile_map, num_windows):
    """Mathematically identical jnp form of the windowed kernel (f32
    accumulation, padding slots to a dropped dummy segment).  Used under
    shard_map in interpret mode, where the hlo interpreter's block-index
    dynamic_slices trip the vma consistency check (the index map's jaxpr is
    traced outside the vma context, so it cannot be repaired in user code);
    the real TPU path still runs the Pallas kernel."""
    e_win = win_local.shape[0]
    tiles = e_win // TILE_E
    window_of_slot = jnp.repeat(
        win_tile_map[:tiles], TILE_E, total_repeat_length=e_win
    )
    rows = num_windows * WINDOW
    idx = jnp.where(
        win_local < WINDOW, window_of_slot * WINDOW + win_local, rows
    )
    return jax.ops.segment_sum(
        gathered.astype(jnp.float32), idx, num_segments=rows + 1
    )[:rows]


@functools.partial(jax.jit, static_argnames=("num_windows", "interpret"))
def _windowed_segment_sum_fwd(
    gathered: jax.Array,  # [E_win, D] f32/bf16 — x_src rows in windowed edge order
    win_local: jax.Array,  # [E_win] int32 — dst offset within window (128 = pad)
    win_tile_map: jax.Array,  # [E_win / TILE_E] int32 — window of each tile
    num_windows: int,
    interpret: bool = False,
) -> jax.Array:
    e_win, d = gathered.shape
    num_tiles = e_win // TILE_E

    if interpret and getattr(jax.typeof(gathered), "vma", None):
        return _windowed_segment_sum_ref(gathered, win_local, win_tile_map, num_windows)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # win_tile_map drives the output index map
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_E,), lambda t, tm: (t,)),
            pl.BlockSpec((TILE_E, d), lambda t, tm: (t, 0)),
        ],
        out_specs=pl.BlockSpec((WINDOW, d), lambda t, tm: (tm[t], 0)),
    )
    return pl.pallas_call(
        _segment_kernel,
        grid_spec=grid_spec,
        out_shape=_out_struct((num_windows * WINDOW, d), jnp.float32, gathered),
        interpret=interpret,
    )(win_tile_map, win_local, gathered)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def windowed_segment_sum(gathered, win_local, win_tile_map, num_windows, interpret=False):
    """sum of ``gathered`` rows per destination; output [num_windows*128, D]."""
    return _windowed_segment_sum_fwd(
        gathered, win_local, win_tile_map, num_windows, interpret
    )


def _wss_fwd(gathered, win_local, win_tile_map, num_windows, interpret):
    out = _windowed_segment_sum_fwd(
        gathered, win_local, win_tile_map, num_windows, interpret
    )
    # dtype token: residuals must be jax types, so carry an empty array
    return out, (win_local, win_tile_map, jnp.zeros((0,), gathered.dtype))


def _wss_bwd(num_windows, interpret, res, g_out):
    # dG[e] = g_out[global_dst[e]]; padding rows hit a zero contribution
    win_local, win_tile_map, dtype_token = res
    in_dtype = dtype_token.dtype
    tiles = win_local.shape[0] // TILE_E
    window_of_edge = jnp.repeat(win_tile_map[:tiles], TILE_E)
    global_dst = window_of_edge * WINDOW + jnp.minimum(win_local, WINDOW - 1)
    is_pad = win_local >= WINDOW
    grad = jnp.take(g_out, global_dst, axis=0).astype(in_dtype)
    grad = jnp.where(is_pad[:, None], jnp.zeros((), in_dtype), grad)
    # int32 inputs have float0 tangents
    zero_local = np.zeros(win_local.shape, dtype=jax.dtypes.float0)
    zero_map = np.zeros(win_tile_map.shape, dtype=jax.dtypes.float0)
    return (grad, zero_local, zero_map)


windowed_segment_sum.defvjp(_wss_fwd, _wss_bwd)


# ---------------------------------------------------------------------------
# Fused small-table kernels: the gather moves INSIDE the kernel
# ---------------------------------------------------------------------------
#
# For a relation whose SOURCE side is small (labs/diagnoses/medications: the
# EHR graph is bipartite, so every relation has one small side), the whole
# source feature table fits VMEM.  The XLA row-gather that materializes
# G = x_src[win_src] in HBM (~E*D*4 bytes written + re-read; the measured
# bottleneck of the windowed tier, PERFORMANCE.md "Roofline") disappears:
# the table is pinned VMEM-resident via a constant index map and rows are
# picked up in-kernel.  Traffic drops from O(E*D) to O(E + table + out).
#
# Two in-kernel gather strategies:
#   * "take": jnp.take on the VMEM-resident table (Mosaic dynamic-gather);
#   * "indicator": G_tile = P @ T with P[e, s] = (src[e] == s) — pure MXU,
#     always lowers, costs TILE_E*S*D MACs per tile (worth it below ~1k rows).
# `_vmem_take_supported()` probes the current backend once and picks.
#
# The BACKWARD of the mirrored direction fuses the same way: for a relation
# with small DESTINATION side, dT[s] = sum_e (src[e]==s) g[dst[e]] streams
# the large-side gradient in window blocks (the tile map already groups each
# tile's destinations into one 128-row window) and accumulates the small dT
# block VMEM-resident — so neither direction of a small x large relation
# touches an HBM gather or scatter, forward or backward.


def _fused_table_kernel_take(tile_map_ref, local_ref, src_ref, table_ref, out_ref):
    """out[window] += indicator(local) @ table[src_tile] (gather via take)."""
    _zero_out_on_new_window(tile_map_ref, out_ref)
    g_tile = jnp.take(table_ref[:], src_ref[:], axis=0)  # [TILE_E, D] from VMEM
    s = _window_indicator(local_ref, g_tile.dtype)
    out_ref[:] += jnp.dot(s, g_tile, preferred_element_type=jnp.float32)


def _fused_table_kernel_indicator(tile_map_ref, local_ref, src_ref, table_ref, out_ref):
    """out[window] += S_local @ (P_src @ table) — gather as an MXU indicator
    matmul; P[e, s] = 1 where edge e reads source row s."""
    _zero_out_on_new_window(tile_map_ref, out_ref)
    table = table_ref[:]
    s_pad = table.shape[0]
    s_ind = _window_indicator(local_ref, table.dtype)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_E, s_pad), 1)
    p_src = (src_ref[:].reshape(TILE_E, 1) == cols).astype(table.dtype)
    # gather first, THEN segment-sum: the (window row, src) count matrix of
    # the (S @ P) @ T order is integer-valued and overflows bf16's exact
    # range at multiplicity > 256 (duplicate edges accumulate by contract,
    # graph/hetero.py).  P @ T rows are exact table-row copies in any dtype
    # and both accumulations stay f32.
    gathered = jnp.dot(p_src, table, preferred_element_type=jnp.float32)
    out_ref[:] += jnp.dot(
        s_ind, gathered.astype(table.dtype), preferred_element_type=jnp.float32
    )


_VMEM_TAKE_SUPPORTED: dict[str, bool] = {}


def _vmem_take_supported() -> bool:
    """Probe (once per backend) whether Mosaic lowers jnp.take on a
    VMEM-resident array — if not, the indicator-matmul gather is used.

    The probe compiles the REAL take kernel at representative shapes (one
    TILE_E tile, gridded PrefetchScalarGridSpec, (512, 128) table): a toy
    kernel can pass or fail lowering for layout reasons that do not transfer
    to the production geometry."""
    backend = jax.default_backend()
    if backend != "tpu":
        return True  # interpret mode executes numpy semantics
    hit = _VMEM_TAKE_SUPPORTED.get(backend)
    if hit is not None:
        return hit

    try:
        _fused_table_segment_sum_fwd.lower(
            jax.ShapeDtypeStruct((512, 128), jnp.float32),
            jax.ShapeDtypeStruct((TILE_E,), jnp.int32),
            jax.ShapeDtypeStruct((TILE_E,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            num_windows=1, num_src_pad=512, interpret=False, mode="take",
        ).compile()
        ok = True
    except Exception as exc:  # noqa: BLE001 — any lowering failure means "no"
        # log it: a TRANSIENT failure (e.g. a remote-compile hiccup) caches
        # "no take" for the whole process and silently costs the fused tier
        logger.warning(
            "In-kernel jnp.take probe failed on %s (%s: %s); using the "
            "indicator-matmul gather for fused-table aggregations",
            backend, type(exc).__name__, exc,
        )
        ok = False
    _VMEM_TAKE_SUPPORTED[backend] = ok
    return ok


@functools.partial(
    jax.jit, static_argnames=("num_windows", "num_src_pad", "interpret", "mode")
)
def _fused_table_segment_sum_fwd(
    table: jax.Array,  # [num_src, D] — the small side's features
    win_src: jax.Array,  # [E_win] int32 source ids in windowed edge order
    win_local: jax.Array,  # [E_win] int32 dst offset within window (128 = pad)
    win_tile_map: jax.Array,  # [E_win / TILE_E] int32 window of each tile
    num_windows: int,
    num_src_pad: int,
    interpret: bool = False,
    mode: str = "take",
) -> jax.Array:
    e_win = win_src.shape[0]
    d = table.shape[1]
    num_tiles = e_win // TILE_E
    if table.shape[0] != num_src_pad:
        table = jnp.pad(table, ((0, num_src_pad - table.shape[0]), (0, 0)))

    kernel = _fused_table_kernel_take if mode == "take" else _fused_table_kernel_indicator
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_E,), lambda t, tm: (t,)),
            pl.BlockSpec((TILE_E,), lambda t, tm: (t,)),
            # constant index map: the table is copied to VMEM once and stays
            pl.BlockSpec((num_src_pad, d), lambda t, tm: (0, 0)),
        ],
        out_specs=pl.BlockSpec((WINDOW, d), lambda t, tm: (tm[t], 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_windows * WINDOW, d), jnp.float32),
        interpret=interpret,
    )(win_tile_map, win_local, win_src, table)


def _fused_table_bwd_kernel_take(
    tile_map_ref, local_ref, src_ref, g_ref, out_ref
):
    """dT += scatter_by_src( g[window block][local] ) — the large-side grad
    streams in window blocks; the small dT accumulator stays VMEM-resident."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    g_tile = jnp.take(
        g_ref[:], jnp.minimum(local_ref[:], WINDOW - 1), axis=0
    )  # [TILE_E, D]
    g_tile = jnp.where((local_ref[:] < WINDOW)[:, None], g_tile, 0.0)
    p_src_t = _src_indicator_t(src_ref, out_ref.shape[0], g_tile.dtype)
    out_ref[:] += jnp.dot(p_src_t, g_tile, preferred_element_type=jnp.float32)


def _fused_table_bwd_kernel_indicator(
    tile_map_ref, local_ref, src_ref, g_ref, out_ref
):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    g_block = g_ref[:]  # [WINDOW, D]
    # gather-by-indicator: G_tile = P_local @ g_block
    cols_w = jax.lax.broadcasted_iota(jnp.int32, (TILE_E, WINDOW), 1)
    p_local = (local_ref[:].reshape(TILE_E, 1) == cols_w).astype(g_block.dtype)
    g_tile = jnp.dot(p_local, g_block, preferred_element_type=jnp.float32).astype(
        g_block.dtype
    )
    p_src_t = _src_indicator_t(src_ref, out_ref.shape[0], g_block.dtype)
    out_ref[:] += jnp.dot(p_src_t, g_tile, preferred_element_type=jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("num_src_pad", "interpret", "mode")
)
def _fused_table_segment_sum_bwd(
    g_out: jax.Array,  # [num_windows * WINDOW, D] f32 upstream grad (padded)
    win_src: jax.Array,
    win_local: jax.Array,
    win_tile_map: jax.Array,
    num_src_pad: int,
    interpret: bool = False,
    mode: str = "take",
) -> jax.Array:
    e_win = win_src.shape[0]
    d = g_out.shape[1]
    num_tiles = e_win // TILE_E
    kernel = (
        _fused_table_bwd_kernel_take if mode == "take" else _fused_table_bwd_kernel_indicator
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_E,), lambda t, tm: (t,)),
            pl.BlockSpec((TILE_E,), lambda t, tm: (t,)),
            pl.BlockSpec((WINDOW, d), lambda t, tm: (tm[t], 0)),
        ],
        out_specs=pl.BlockSpec((num_src_pad, d), lambda t, tm: (0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_src_pad, d), jnp.float32),
        interpret=interpret,
    )(win_tile_map, win_local, win_src, g_out)


# above these row counts the VMEM-resident table (and, in indicator mode,
# the per-tile indicator matmul's S-proportional FLOPs) stop paying off
FUSED_TABLE_MAX_ROWS_TAKE = 2048
FUSED_TABLE_MAX_ROWS_INDICATOR = 512
# VMEM budget for the resident table: the row limits assume hidden-dim-sized
# features; a wide feature axis must shrink the row cap or Mosaic exhausts
# VMEM at compile time instead of falling back to the windowed tier
FUSED_TABLE_MAX_BYTES = 4 * 1024 * 1024


def fused_table_applicable(
    edges: EdgeSet, feature_dim: int | None = None, itemsize: int = 4
) -> bool:
    if edges.win_src is None:
        return False
    limit = (
        FUSED_TABLE_MAX_ROWS_TAKE
        if _vmem_take_supported()
        else FUSED_TABLE_MAX_ROWS_INDICATOR
    )
    if feature_dim is not None:
        limit = min(limit, FUSED_TABLE_MAX_BYTES // max(feature_dim * itemsize, 1))
    return edges.num_src <= limit


def fused_table_aggregate(
    x_src: jax.Array,
    edges: EdgeSet,
    aggregation: Literal["mean", "sum"] = "mean",
    interpret: bool | None = None,
) -> jax.Array:
    """Neighbor aggregation with the source table VMEM-resident: no HBM
    gather forward, no HBM scatter backward.  Requires the windowed layout
    and a small source side (ops dispatch gates on num_src)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mode = "take" if _vmem_take_supported() else "indicator"
    num_src_pad = max(128, -(-edges.num_src // 128) * 128)
    num_windows, num_dst = edges.num_windows, edges.num_dst

    @jax.custom_vjp
    def agg(x):
        out = _fused_table_segment_sum_fwd(
            x, edges.win_src, edges.win_local, edges.win_tile_map,
            num_windows, num_src_pad, interpret, mode,
        )[:num_dst]
        if aggregation == "mean":
            out = out / jnp.maximum(edges.dst_count, 1.0)[:, None]
        return out.astype(x.dtype)

    def fwd(x):
        return agg(x), None

    def bwd(_res, g):
        g32 = g.astype(jnp.float32)
        if aggregation == "mean":
            g32 = g32 / jnp.maximum(edges.dst_count, 1.0)[:, None]
        pad_rows = num_windows * WINDOW - g32.shape[0]
        if pad_rows:
            g32 = jnp.pad(g32, ((0, pad_rows), (0, 0)))
        dx = _fused_table_segment_sum_bwd(
            g32, edges.win_src, edges.win_local, edges.win_tile_map,
            num_src_pad, interpret, mode,
        )[: edges.num_src]
        return (dx.astype(g.dtype),)

    agg.defvjp(fwd, bwd)
    return agg(x_src)


# ---------------------------------------------------------------------------
# Span-DMA tier: over-VMEM source tables, the gather STILL moves in-kernel
# ---------------------------------------------------------------------------
#
# When the source side is too large for a VMEM-resident table (the patient
# axis at 10k+ rows), the windowed tier's XLA row-gather writes E x D to HBM
# and re-reads it — the measured bandwidth bound of the scale epoch
# (PERFORMANCE.md "Roofline": ~7.8 GB per 5M-edge traversal).  Per-row
# in-kernel DMA is infeasible (1024 descriptors per tile, issue-latency
# bound).  Instead the graph build re-lays each window's edges sorted by
# SOURCE (build_src_span_plan) so a tile's real sources live in ONE
# span_rows-row span of the table; the kernel then:
#
#   * keeps the table in ANY memory space (HBM) and DMAs the tile's single
#     contiguous [span_rows, D] block into a double-buffered VMEM scratch
#     (the copy for tile t+1 is issued before tile t computes);
#   * gathers in-VMEM via the span-local indicator matmul
#     P[e, s-base] — same MXU primitive as the fused-table tier;
#   * accumulates windows exactly like _segment_kernel.
#
# Traffic per 5M-edge traversal drops to ~tiles * span_rows * D * 4 bytes
# (~0.6 GB at span 256, D 128) and nothing E x D ever touches HBM.  The
# BACKWARD needs no DMA at all: d x_src is the REVERSE relation's windowed
# aggregation of the (small) destination-side gradient — the paired plan.


def _span_dma_kernel(
    tile_map_ref, base_ref, local_ref, src_ref, table_ref, out_ref,
    scratch, sems, *, span_rows: int,
):
    """One grid step: DMA table[base_t : base_t+span_rows] -> VMEM, then
    out[window] += indicator(local) @ (P_span @ block)."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    _zero_out_on_new_window(tile_map_ref, out_ref)

    def _copy(tile, slot):
        base = pl.multiple_of(base_ref[tile], 16)  # SPAN_BASE_ALIGN
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(base, span_rows)], scratch.at[slot], sems.at[slot]
        )

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        _copy(0, 0).start()

    @pl.when(t + 1 < nt)
    def _():
        _copy(t + 1, jax.lax.rem(t + 1, 2)).start()

    _copy(t, slot).wait()
    block = scratch[slot]  # [span_rows, D]
    src_rel = src_ref[:] - base_ref[t]
    # padding slots carry local == WINDOW (killed by the window indicator)
    # and src 0, whose src_rel may be negative — matching no indicator column
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_E, span_rows), 1)
    p_span = (src_rel.reshape(TILE_E, 1) == cols).astype(block.dtype)
    gathered = jnp.dot(p_span, block, preferred_element_type=jnp.float32)
    s_ind = _window_indicator(local_ref, block.dtype)
    out_ref[:] += jnp.dot(
        s_ind, gathered.astype(block.dtype), preferred_element_type=jnp.float32
    )


@functools.partial(
    jax.jit, static_argnames=("num_windows", "span_rows", "interpret")
)
def _span_dma_segment_sum_fwd(
    table: jax.Array,  # [num_src, D] — the over-VMEM source table (HBM)
    span_src: jax.Array,  # [E_span] int32 source ids, span-plan slot order
    span_local: jax.Array,  # [E_span] int32 dst offset in window (128 = pad)
    span_tile_map: jax.Array,  # [E_span / TILE_E] int32 window of each tile
    span_base: jax.Array,  # [E_span / TILE_E] int32 table row base of each tile
    num_windows: int,
    span_rows: int,
    interpret: bool = False,
) -> jax.Array:
    e_span = span_src.shape[0]
    d = table.shape[1]
    num_tiles = e_span // TILE_E
    # pad rows to the plan's table extent: every base satisfies
    # base + span_rows <= round_up(num_src, 128) (clamped at plan build)
    rows_pad = max(-(-table.shape[0] // 128) * 128, span_rows)
    if table.shape[0] != rows_pad:
        table = jnp.pad(table, ((0, rows_pad - table.shape[0]), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # span_tile_map, span_base
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_E,), lambda t, tm, sb: (t,)),
            pl.BlockSpec((TILE_E,), lambda t, tm, sb: (t,)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((WINDOW, d), lambda t, tm, sb: (tm[t], 0)),
        scratch_shapes=[
            pltpu.VMEM((2, span_rows, d), table.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_span_dma_kernel, span_rows=span_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_windows * WINDOW, d), jnp.float32),
        interpret=interpret,
    )(span_tile_map, span_base, span_local, span_src, table)


def span_dma_enabled() -> bool:
    """Dispatch gate for the span-DMA tier.  ``MMGNN_SPAN_DMA=0`` disables it
    (escape hatch while the Mosaic lowering of the in-kernel DMA is pending
    hardware validation — see ROADMAP; interpret mode is exact by tests)."""
    import os

    return os.environ.get("MMGNN_SPAN_DMA", "1") != "0"


def span_dma_applicable(edges: EdgeSet, edges_rev: Optional[EdgeSet]) -> bool:
    """The span tier needs the forward span plan AND the mirror relation's
    windowed plan (its backward is the reverse aggregation)."""
    return (
        edges.span_rows > 0
        and edges.span_src is not None
        and edges_rev is not None
        and edges_rev.win_src is not None
    )


def span_dma_aggregate(
    x_src: jax.Array,
    edges: EdgeSet,
    edges_rev: EdgeSet,
    aggregation: Literal["mean", "sum"] = "mean",
    interpret: bool | None = None,
) -> jax.Array:
    """Neighbor aggregation for over-VMEM source tables: the gather runs
    in-kernel on one DMA'd [span_rows, D] block per tile (see module note).
    Backward rides the mirror relation's windowed plan, exactly like
    :func:`gather_segment_aggregate_paired`."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    @jax.custom_vjp
    def agg(x):
        out = _span_dma_segment_sum_fwd(
            x, edges.span_src, edges.span_local, edges.span_tile_map,
            edges.span_base, edges.num_windows, edges.span_rows, interpret,
        )[: edges.num_dst]
        if aggregation == "mean":
            out = out / jnp.maximum(edges.dst_count, 1.0)[:, None]
        return out.astype(x.dtype)

    def fwd(x):
        return agg(x), None

    def bwd(_res, g):
        if aggregation == "mean":
            g = (
                g.astype(jnp.float32) / jnp.maximum(edges.dst_count, 1.0)[:, None]
            ).astype(g.dtype)
        g_gathered = jnp.take(g, edges_rev.win_src, axis=0)
        dx = windowed_segment_sum(
            g_gathered,
            edges_rev.win_local,
            edges_rev.win_tile_map,
            edges_rev.num_windows,
            interpret,
        )[: edges_rev.num_dst]
        return (dx.astype(g.dtype),)

    agg.defvjp(fwd, bwd)
    return agg(x_src)


def _aggregate_fwd_impl(x_src, edges: EdgeSet, aggregation: str, interpret: bool):
    gathered = jnp.take(x_src, edges.win_src, axis=0)
    out = windowed_segment_sum(  # f32 accumulation regardless of input dtype
        gathered, edges.win_local, edges.win_tile_map, edges.num_windows, interpret
    )[: edges.num_dst]
    if aggregation == "mean":
        out = out / jnp.maximum(edges.dst_count, 1.0)[:, None]
    return out.astype(x_src.dtype)


def gather_segment_aggregate_paired(
    x_src: jax.Array,
    edges: EdgeSet,
    edges_rev: EdgeSet,
    aggregation: Literal["mean", "sum"] = "mean",
    interpret: bool | None = None,
) -> jax.Array:
    """Neighbor aggregation whose BACKWARD also runs the MXU kernel.

    The VJP of the forward gather is a scatter-add into ``x_src`` — exactly a
    segment sum grouped by source, i.e. the *reverse* relation's windowed
    plan.  Since the graph mirrors every relation (graph/build.py), the
    reverse EdgeSet's layout is already built; XLA's serialized scatter never
    appears on the hot path.

        d x_src[s] = sum_{e: src[e]=s} g_out[dst[e]] (/ deg[dst[e]] for mean)
                   = windowed_segment_sum over edges_rev of g_scaled[rev.src]
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if edges.win_src is None:
        # no windowed layout at all (e.g. distributed-loader EdgeSets):
        # degrade to the XLA segment path, which needs no plans
        from multi_modal_gnn_tpu.ops.segment import aggregate_neighbors

        return aggregate_neighbors(x_src, edges, aggregation, impl="xla")
    if edges_rev.win_src is None:
        # forward plan exists but no mirror plan: windowed forward,
        # XLA-transposed backward
        return gather_segment_aggregate(x_src, edges, aggregation, interpret)

    @jax.custom_vjp
    def agg(x):
        return _aggregate_fwd_impl(x, edges, aggregation, interpret)

    def fwd(x):
        return agg(x), None

    def bwd(_res, g):
        if aggregation == "mean":
            g = (g.astype(jnp.float32) / jnp.maximum(edges.dst_count, 1.0)[:, None]).astype(
                g.dtype
            )
        g_gathered = jnp.take(g, edges_rev.win_src, axis=0)
        dx = windowed_segment_sum(
            g_gathered,
            edges_rev.win_local,
            edges_rev.win_tile_map,
            edges_rev.num_windows,
            interpret,
        )[: edges_rev.num_dst]
        return (dx.astype(g.dtype),)

    agg.defvjp(fwd, bwd)
    return agg(x_src)


def take_with_plan(
    x: jax.Array,
    idx: jax.Array,
    plan,  # GatherPlan (graph/hetero.py)
    interpret: bool | None = None,
) -> jax.Array:
    """``x[idx]`` whose backward runs the MXU segment kernel.

    The VJP of a row gather is a scatter-add grouped by target row; with a
    precomputed :class:`GatherPlan` it becomes one windowed segment sum —
    XLA's serialized scatter (the dominant backward cost for large
    supervised batches) never appears.
    """
    if plan is None:
        return jnp.take(x, idx, axis=0)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    @jax.custom_vjp
    def gathered(x):
        return jnp.take(x, idx, axis=0)

    def fwd(x):
        return jnp.take(x, idx, axis=0), None

    def bwd(_res, g):
        # identity plans (slot-major batches) skip the window-order gather —
        # the cotangent is already slot-ordered
        g_win = g if plan.identity else jnp.take(g, plan.win_src, axis=0)
        dx = windowed_segment_sum(
            g_win, plan.win_local, plan.win_tile_map, plan.num_windows, interpret
        )[: plan.num_rows]
        return (dx.astype(g.dtype),)

    gathered.defvjp(fwd, bwd)
    return gathered(x)


def gather_segment_aggregate(
    x_src: jax.Array,
    edges: EdgeSet,
    aggregation: Literal["mean", "sum"] = "mean",
    interpret: bool | None = None,
) -> jax.Array:
    """Pallas-backed neighbor aggregation: gather + windowed MXU segment sum.

    Drop-in for the XLA path in ops/segment.py (same [num_dst, D] output).
    ``max`` aggregation is not MXU-expressible this way and falls back.
    """
    if edges.win_src is None:
        raise ValueError("EdgeSet has no windowed layout; rebuild the graph")
    if aggregation not in ("mean", "sum"):
        from multi_modal_gnn_tpu.ops.segment import aggregate_neighbors

        return aggregate_neighbors(x_src, edges, aggregation, impl="xla")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _aggregate_fwd_impl(x_src, edges, aggregation, interpret)
