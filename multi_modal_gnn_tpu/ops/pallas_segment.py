"""Fused segment reduction as MXU matmuls (Pallas TPU kernel).

The neighbor-aggregation scatter-add — the one place the reference leans on
compiled CUDA (torch-scatter, via PyG's SAGEConv; reference
requirements.txt:13-22) — reformulated for the TPU systolic array:

  * edges are dst-sorted and regrouped at graph-build time into a *windowed*
    layout (graph/hetero.py:build_window_plan): every fixed 512-edge tile's
    destinations fall inside one 128-row output window, and each window owns
    a whole number of tiles;
  * per grid step the kernel builds a segment-indicator matrix
    ``S[w, e] = (win_local[e] == w)`` (128 x 512, VPU compare against a
    broadcasted iota) and accumulates ``S @ G_tile`` (128x512 @ 512x128)
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
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_modal_gnn_tpu.graph.hetero import TILE_E, WINDOW, EdgeSet


def _segment_kernel(tile_map_ref, local_ref, g_ref, out_ref):
    """One grid step: out[window] += indicator(local) @ g_tile.

    The matmul runs at the input dtype (bf16 inputs hit the MXU at 4x the
    f32 rate) and ALWAYS accumulates in f32 — strictly better numerics than
    XLA's segment_sum on bf16 data, which accumulates in bf16.
    """
    t = pl.program_id(0)

    # first tile of a window initializes its output block
    is_first = t == 0
    prev_same = jnp.where(t > 0, tile_map_ref[jnp.maximum(t - 1, 0)], -1)
    new_window = jnp.logical_or(is_first, prev_same != tile_map_ref[t])

    @pl.when(new_window)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # indicator: S[w, e] = 1.0 where this tile's edge e lands on window row w
    rows = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, TILE_E), 0)
    locals_2d = local_ref[:].reshape(1, TILE_E)
    s = (locals_2d == rows).astype(g_ref.dtype)
    out_ref[:] += jnp.dot(s, g_ref[:], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("num_windows", "interpret"))
def _windowed_segment_sum_fwd(
    gathered: jax.Array,  # [E_win, D] f32 — x_src rows in windowed edge order
    win_local: jax.Array,  # [E_win] int32 — dst offset within window (128 = pad)
    win_tile_map: jax.Array,  # [E_win / TILE_E] int32 — window of each tile
    num_windows: int,
    interpret: bool = False,
) -> jax.Array:
    e_win, d = gathered.shape
    num_tiles = e_win // TILE_E

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
        out_shape=jax.ShapeDtypeStruct((num_windows * WINDOW, d), jnp.float32),
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
    if edges.win_src is None or edges_rev.win_src is None:
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
        g_win = jnp.take(g, plan.win_src, axis=0)
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
