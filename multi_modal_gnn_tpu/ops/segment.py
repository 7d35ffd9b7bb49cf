"""Gather + segment reductions (XLA backend).

The message-passing primitive of the whole framework: for a relation with
edges sorted by destination, aggregate source-node features per destination.
This is the TPU-native replacement for the compiled scatter/gather ops PyG's
``SAGEConv`` relies on (torch-scatter/torch-sparse; reference
requirements.txt:13-22) — lowered through XLA instead of custom CUDA.

Design notes (why this maps well onto TPU):
  * edges arrive **sorted by dst** (graph/hetero.py), so ``segment_sum`` runs
    with ``indices_are_sorted=True`` — XLA lowers this to a blocked
    sorted-reduction rather than a serialized scatter;
  * padding edges carry ``dst == num_dst`` (one dummy segment past the end),
    so no masking multiplies are needed: reduce over ``num_dst + 1`` segments
    and drop the last row;
  * the mean denominator (valid in-degree) is precomputed at graph build.
"""

from __future__ import annotations

from typing import Literal, Optional

import jax
import jax.numpy as jnp

from multi_modal_gnn_tpu.graph.hetero import EdgeSet


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jax.Array:
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=indices_are_sorted
    )


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Mean over segments; empty segments produce 0."""
    total = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    ones = jnp.ones(data.shape[:1], dtype=data.dtype)
    count = segment_sum(ones, segment_ids, num_segments, indices_are_sorted)
    return total / jnp.maximum(count, 1.0)[..., None] if data.ndim > 1 else total / jnp.maximum(
        count, 1.0
    )


def segment_softmax(
    logits: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = False,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Numerically-stable softmax within segments (used by the HGT variant).

    With ``axis_name`` set (edges sharded over that mesh axis under
    shard_map), the per-segment max and normalizer combine across shards with
    one pmax + one psum — a destination whose edges straddle shards still
    normalizes over ALL of them, so sharded attention matches single-device
    attention exactly.
    """
    # the max shift is for numerical stability only — softmax is invariant to
    # it, so it carries no gradient (and pmax has no differentiation rule)
    seg_max = jax.ops.segment_max(
        jax.lax.stop_gradient(logits),
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    if axis_name is not None:
        seg_max = jax.lax.pmax(seg_max, axis_name)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    seg_max = jax.lax.stop_gradient(seg_max)
    shifted = logits - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    denom = segment_sum(exp, segment_ids, num_segments, indices_are_sorted)
    if axis_name is not None:
        denom = jax.lax.psum(denom, axis_name)
    return exp / jnp.maximum(denom[segment_ids], 1e-16)


def _sharded_total(x: jax.Array, edges: EdgeSet, aggregation: str, axis_name: str):
    """Shard-local windowed segment kernel + dynamic placement + psum.

    Runs INSIDE shard_map: ``edges.shard_win_*`` leaves are this device's
    plan chunk (P(axis)-sharded arrays).  The local output covers
    ``shard_win_windows`` consecutive global windows starting at
    ``shard_win_offset[0]``; the global buffer is over-allocated by k_max
    windows so dynamic_update_slice never clamps (clamping would shift the
    block onto wrong rows)."""
    from multi_modal_gnn_tpu.graph.hetero import WINDOW
    from multi_modal_gnn_tpu.ops.pallas_segment import windowed_segment_sum

    interpret = jax.default_backend() != "tpu"
    k_max = edges.shard_win_windows
    gathered = jnp.take(x, edges.shard_win_src, axis=0)
    local = windowed_segment_sum(
        gathered, edges.shard_win_local, edges.shard_win_tile_map, k_max, interpret
    )  # [k_max * WINDOW, D] f32
    num_windows_global = -(-edges.num_dst // WINDOW)
    rows_full = (num_windows_global + k_max) * WINDOW
    full = jnp.zeros((rows_full, x.shape[1]), jnp.float32)
    off = edges.shard_win_offset[0] * WINDOW
    full = jax.lax.dynamic_update_slice(full, local, (off, 0))
    total = jax.lax.psum(full, axis_name)[: edges.num_dst]
    if aggregation == "sum":
        return total.astype(x.dtype)
    denom = jnp.maximum(edges.dst_count, 1.0).astype(total.dtype)
    return (total / denom[:, None]).astype(x.dtype)


def _sharded_windowed_aggregate(
    x_src: jax.Array,
    edges: EdgeSet,
    aggregation: str,
    axis_name: str,
    edges_rev: Optional[EdgeSet] = None,
) -> jax.Array:
    """Per-shard MXU aggregation under shard_map (see :func:`_sharded_total`).

    With ``edges_rev`` carrying the mirror relation's shard plan, the
    BACKWARD also runs the kernel: the VJP of the forward gather is a
    scatter-add into ``x_src`` grouped by source — exactly the reverse
    relation's aggregation — so the cotangent rides the same per-shard
    kernel + psum instead of XLA's serialized scatter (the multi-chip
    analogue of gather_segment_aggregate_paired; CLAUDE.md "every
    scatter-add stays off the hot path")."""
    if edges_rev is None or edges_rev.shard_win_src is None:
        # no mirror plan: windowed forward, XLA-transposed backward
        return _sharded_total(x_src, edges, aggregation, axis_name)

    @jax.custom_vjp
    def agg(x):
        return _sharded_total(x, edges, aggregation, axis_name)

    def fwd(x):
        return agg(x), None

    def bwd(_res, g):
        if aggregation == "mean":
            g = (
                g.astype(jnp.float32) / jnp.maximum(edges.dst_count, 1.0)[:, None]
            ).astype(g.dtype)
        dx = _sharded_total(g, edges_rev, "sum", axis_name)
        return (dx.astype(g.dtype),)

    agg.defvjp(fwd, bwd)
    return agg(x_src)


def aggregate_neighbors(
    x_src: jax.Array,
    edges: EdgeSet,
    aggregation: Literal["mean", "sum", "max"] = "mean",
    impl: Literal["xla", "pallas"] = "xla",
    axis_name: Optional[str] = None,
    edges_rev: Optional[EdgeSet] = None,
) -> jax.Array:
    """Aggregate source features over each destination's in-neighbors.

    Args:
        x_src: [num_src, D] source-node features (replicated under SPMD).
        edges: dst-sorted padded EdgeSet (dst == num_dst marks padding).
            Under ``shard_map`` data parallelism the edge arrays are the
            device-local shard (a contiguous chunk of the sorted edges — so
            sortedness is preserved per shard), while ``dst_count`` stays
            global/replicated.
        aggregation: "mean" | "sum" | "max" per destination.
        impl: backend; "pallas" uses the fused CSR kernel where available.
        axis_name: if set, the mesh axis edges are sharded over — partial
            per-destination reductions are combined with one psum/pmax
            (riding ICI on a real TPU mesh).

    Returns:
        [num_dst, D] aggregated features (0 for isolated destinations).
    """
    if impl == "pallas" and axis_name is None:
        # fastest tier: dense mean-normalized adjacency matmul (one MXU op;
        # its backward is the transposed matmul) — available when the
        # relation fits the graph config's dense byte budget
        if edges.dense_adj is not None and aggregation in ("mean", "sum"):
            out = jnp.dot(
                edges.dense_adj.astype(x_src.dtype), x_src,
                preferred_element_type=jnp.float32,
            )
            if aggregation == "sum":
                out = out * jnp.maximum(edges.dst_count, 1.0)[:, None]
            return out.astype(x_src.dtype)
        if aggregation in ("mean", "sum"):
            # small-source relations (the EHR graph is bipartite, so one side
            # is always labs/diagnoses/medications-sized): the whole source
            # table rides VMEM and the gather happens in-kernel — no HBM
            # gather forward, no HBM scatter backward
            from multi_modal_gnn_tpu.ops.pallas_segment import (
                fused_table_aggregate,
                fused_table_applicable,
            )

            if fused_table_applicable(edges, x_src.shape[1], x_src.dtype.itemsize):
                return fused_table_aggregate(x_src, edges, aggregation)
            # over-VMEM source table with a span plan: the gather still runs
            # in-kernel, on one DMA'd [span_rows, D] block per tile
            from multi_modal_gnn_tpu.ops.pallas_segment import (
                span_dma_aggregate,
                span_dma_applicable,
                span_dma_enabled,
            )

            if span_dma_applicable(edges, edges_rev) and span_dma_enabled():
                return span_dma_aggregate(x_src, edges, edges_rev, aggregation)
        if edges_rev is not None and aggregation in ("mean", "sum"):
            from multi_modal_gnn_tpu.ops.pallas_segment import gather_segment_aggregate_paired

            return gather_segment_aggregate_paired(x_src, edges, edges_rev, aggregation)
        from multi_modal_gnn_tpu.ops.pallas_segment import gather_segment_aggregate

        return gather_segment_aggregate(x_src, edges, aggregation)

    import os

    if (
        impl == "pallas"
        and axis_name is not None
        and aggregation in ("mean", "sum")
        and edges.shard_win_src is not None
        and os.environ.get("MMGNN_SHARD_KERNEL", "1") != "0"
    ):
        # per-shard windowed MXU kernel under shard_map: each device runs
        # the Pallas segment kernel on its OWN plan chunk (a contiguous
        # slice of the valid edges), places its [k_max*128, D] local-window
        # block into the global row space, and one psum restores the total;
        # the mirror plan (edges_rev) keeps the backward on the kernel too
        return _sharded_windowed_aggregate(
            x_src, edges, aggregation, axis_name, edges_rev
        )

    gathered = jnp.take(x_src, edges.src, axis=0)  # [E_local, D]
    num_segments = edges.num_dst + 1  # final segment collects padding rows
    if aggregation in ("mean", "sum"):
        total = jax.ops.segment_sum(
            gathered, edges.dst, num_segments=num_segments, indices_are_sorted=True
        )[: edges.num_dst]
        if axis_name is not None:
            total = jax.lax.psum(total, axis_name)
        if aggregation == "sum":
            return total
        denom = jnp.maximum(edges.dst_count, 1.0).astype(total.dtype)
        return total / denom[:, None]
    if aggregation == "max":
        # mask padded rows to -inf so they never win, then clamp empties to 0
        gathered = jnp.where(edges.mask[:, None] > 0, gathered, -jnp.inf)
        seg = jax.ops.segment_max(
            gathered, edges.dst, num_segments=num_segments, indices_are_sorted=True
        )[: edges.num_dst]
        if axis_name is not None:
            seg = jax.lax.pmax(seg, axis_name)
        return jnp.where(jnp.isfinite(seg), seg, 0.0)
    raise ValueError(f"Unknown aggregation: {aggregation}")
