"""Combined per-destination-type attention plans for the HGT flash kernel.

HGT attention normalizes the softmax across ALL relations pointing at a
destination node (reference ``HGTConv`` semantics, src/model.py:403-516 —
grouped by destination type).  The flash kernel (ops/pallas_attention.py)
therefore operates on a COMBINED virtual relation per destination type:

  * the per-relation key/value projections are stacked into one virtual
    source table ``[num_src_total, h]`` (relation r's sources live at rows
    ``[src_offsets[r], src_offsets[r] + num_src_r)``), which turns the
    grouped softmax into a plain per-destination softmax over one edge list;
  * the combined edge list gets the SAME windowed/span layouts the RGCN
    aggregation kernels run on (graph/hetero.py build_window_plan /
    build_src_span_plan): a forward plan windowed by destination (for the
    attention forward + dq backward) and a REVERSE plan windowed by virtual
    source (for the dk/dv backward) — so neither direction of the backward
    ever needs an HBM scatter.

Plans are host-built once per graph (``build_attn_plans``) and attached to
``HeteroGraph.attn_plans``; models fall back to the segment/dense attention
tiers when absent (models/hgt.py).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Tuple

import jax
import numpy as np
from flax import struct

from multi_modal_gnn_tpu.graph.hetero import (
    TILE_E,
    WINDOW,
    HeteroGraph,
    _round_up,
    build_src_span_plan,
    build_window_plan,
)
from multi_modal_gnn_tpu.graph.schema import EdgeTypeKey, is_reverse, mirror_edge_type

logger = logging.getLogger(__name__)

# gather-side tables at or below this many rows stay VMEM-resident in the
# kernels.  On this chip the in-kernel gather is an indicator MATMUL whose
# FLOPs scale with the resident row count (PERFORMANCE.md "Mosaic lowering
# notes": take 500s the remote compiler), so beyond ~512 rows a span-DMA
# layout is cheaper even when the table would fit VMEM
ATTN_RESIDENT_MAX_ROWS = 512
# base span height DMA'd per tile for over-VMEM gather sides; sparse groups
# (few edges per gather row per window) escalate through _SPAN_LADDER until
# the packer's tile-split inflation gate passes.  The top rungs (16/32:
# 2048/4096 rows) exist for LOW-dst-count groups whose edges spread across
# the whole gather table (the scale config's diagnosis group: 400k edges
# into 4 dst windows, sources spanning all 100k patients) — without them
# the group falls back to the segment tier, whose per-edge gathers + XLA
# scatter backward cost ~150-200 ms/epoch at scale (round-5 device trace).
# Scratch stays bounded: 2 x 4096 x 512 lanes x 4B ~ 17 MB, inside v5e
# VMEM (the kernels' other blocks are <1 MB).
ATTN_SPAN_ROWS = 128
_SPAN_LADDER = (1, 2, 4, 8, 16, 32)  # multiples of the base span


class AttnSidePlan(struct.PyTreeNode):
    """One direction's layout: windows over the OUTPUT side, gathers from
    the other.  ``win_*`` is always present; ``span_*`` only when the
    gather side exceeds :data:`ATTN_RESIDENT_MAX_ROWS` (then the kernels
    run on the span arrays instead of the window arrays)."""

    win_src: jax.Array  # int32 [E_win] gather-side ids per slot
    win_local: jax.Array  # int32 [E_win] output offset within window (128=pad)
    win_tile_map: jax.Array  # int32 [E_win/TILE_E] window of each tile
    span_src: Optional[jax.Array] = None
    span_local: Optional[jax.Array] = None
    span_tile_map: Optional[jax.Array] = None
    span_base: Optional[jax.Array] = None  # int32 per-tile gather-table row base
    num_windows: int = struct.field(pytree_node=False, default=0)
    span_rows: int = struct.field(pytree_node=False, default=0)

    @property
    def use_span(self) -> bool:
        return self.span_rows > 0


class AttnGroupPlan(struct.PyTreeNode):
    """Combined plan for every relation into one destination node type."""

    fwd: AttnSidePlan  # windows = destination, gathers = virtual source
    rev: AttnSidePlan  # windows = virtual source, gathers = destination
    rel_keys: Tuple[EdgeTypeKey, ...] = struct.field(pytree_node=False, default=())
    # base row of each relation's source table inside the virtual table
    src_offsets: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    num_src_total: int = struct.field(pytree_node=False, default=0)
    num_dst: int = struct.field(pytree_node=False, default=0)
    num_edges: int = struct.field(pytree_node=False, default=0)


def _host_pairs(
    host_edges: Dict[EdgeTypeKey, tuple], et: EdgeTypeKey
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(src, dst) host arrays for ``et``, deriving reverse relations by
    swapping their mirror's arrays (fresh builds only carry forwards)."""
    if et in host_edges:
        src, dst = host_edges[et][0], host_edges[et][1]
        return np.asarray(src, np.int32), np.asarray(dst, np.int32)
    mirror = mirror_edge_type(et)
    if mirror in host_edges:
        src, dst = host_edges[mirror][1], host_edges[mirror][0]
        return np.asarray(src, np.int32), np.asarray(dst, np.int32)
    return None


def _sort_by_dst(src: np.ndarray, dst: np.ndarray, num_dst: int):
    """dst-ascending order + CSR row_ptr (native counting sort when built)."""
    from multi_modal_gnn_tpu import native

    if len(src) and native.available():
        order, _counts, row_ptr = native.sort_edges_by_dst(dst, num_dst)
        return src[order], dst[order], row_ptr
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    row_ptr = np.zeros(num_dst + 1, dtype=np.int32)
    row_ptr[1:] = np.cumsum(np.bincount(dst, minlength=num_dst)).astype(np.int32)
    return src, dst, row_ptr


def _build_side(
    gather_ids: np.ndarray,
    out_ids: np.ndarray,
    num_out: int,
    num_gather: int,
    span_rows: int,
    resident_max: int,
) -> Optional[AttnSidePlan]:
    """Window plan over ``out_ids`` (+ span re-lay of the gathers when the
    gather side is over-VMEM).  None when the span plan is needed but its
    tile-split inflation exceeds the build gate (sparse pathological case —
    the group then falls back to the segment tier)."""
    import jax.numpy as jnp

    g_sorted, o_sorted, row_ptr = _sort_by_dst(gather_ids, out_ids, num_out)
    win_src, win_local, win_tile_map, num_windows = build_window_plan(
        g_sorted, o_sorted, num_out, row_ptr=row_ptr
    )
    span = None
    if num_gather > resident_max and len(g_sorted):
        # escalate the span height for sparse groups: a window with few
        # edges per gather row needs a taller span before a TILE_E tile's
        # rows fit one block (the scale config's medication group fails at
        # 256 and packs at 1024)
        for mult in _SPAN_LADDER:
            span = build_src_span_plan(
                win_src, win_local, win_tile_map, num_gather, span_rows * mult
            )
            if span is not None:
                span_rows = span_rows * mult
                break
        if span is None:
            return None
    return AttnSidePlan(
        win_src=jnp.asarray(win_src),
        win_local=jnp.asarray(win_local),
        win_tile_map=jnp.asarray(win_tile_map),
        span_src=jnp.asarray(span[0]) if span is not None else None,
        span_local=jnp.asarray(span[1]) if span is not None else None,
        span_tile_map=jnp.asarray(span[2]) if span is not None else None,
        span_base=jnp.asarray(span[3]) if span is not None else None,
        num_windows=int(num_windows),
        span_rows=int(span_rows) if span is not None else 0,
    )


def build_attn_plans(
    graph: HeteroGraph,
    host_edges: Dict[EdgeTypeKey, tuple],
    span_rows: int = ATTN_SPAN_ROWS,
    resident_max: int = ATTN_RESIDENT_MAX_ROWS,
) -> Dict[str, AttnGroupPlan]:
    """Build one :class:`AttnGroupPlan` per destination node type.

    ``host_edges`` is ``GraphBundle.host_edges`` (valid edges, device order);
    reverse relations are derived by swapping.  Groups follow the graph's
    edge-type ordering, matching the segment tier's grouping in
    ``HGTLayer.__call__`` exactly (same softmax partition)."""
    counts = graph.node_count_map
    incoming: Dict[str, list] = {}
    for et in graph.edge_types:
        incoming.setdefault(et[2], []).append(et)

    plans: Dict[str, AttnGroupPlan] = {}
    for dst_t, ets in incoming.items():
        num_dst = counts[dst_t]
        srcs, dsts, offsets = [], [], []
        base = 0
        ok = True
        for et in ets:
            pair = _host_pairs(host_edges, et)
            if pair is None:
                logger.warning(
                    "attn plan: no host edges for %s; skipping group %s", et, dst_t
                )
                ok = False
                break
            s, d = pair
            offsets.append(base)
            srcs.append(s.astype(np.int64) + base)
            dsts.append(d)
            base += counts[et[0]]
        if not ok:
            continue
        csrc = np.concatenate(srcs).astype(np.int32) if srcs else np.zeros(0, np.int32)
        cdst = np.concatenate(dsts).astype(np.int32) if dsts else np.zeros(0, np.int32)
        num_src_total = base
        fwd = _build_side(csrc, cdst, num_dst, num_src_total, span_rows, resident_max)
        rev = _build_side(cdst, csrc, num_src_total, num_dst, span_rows, resident_max)
        if fwd is None or rev is None:
            logger.warning(
                "attn plan: span layout unavailable for group %s "
                "(tile-split inflation); segment tier will serve it", dst_t
            )
            continue
        plans[dst_t] = AttnGroupPlan(
            fwd=fwd,
            rev=rev,
            rel_keys=tuple(ets),
            src_offsets=tuple(offsets),
            num_src_total=int(num_src_total),
            num_dst=int(num_dst),
            num_edges=int(len(csrc)),
        )
        logger.info(
            "attn plan[%s]: %d edges, %d dst windows (%s), %d rev windows (%s)",
            dst_t, len(csrc), fwd.num_windows,
            "span" if fwd.use_span else "resident",
            rev.num_windows, "span" if rev.use_span else "resident",
        )
    return plans


def ensure_attn_plans(bundle, config) -> "object":
    """Attach flash-attention plans to ``bundle.graph`` when the configured
    model wants them (HGT + pallas; ``model.extras.hgt_flash`` = auto|off).

    Returns the (possibly updated) bundle.  No-op when plans already exist,
    when the architecture is not HGT, or when host edges are unavailable.
    """
    mc = config.model
    if (
        str(mc.architecture).upper() != "HGT"
        or not mc.use_pallas
        or str(mc.extras.get("hgt_flash", "auto")).lower() in ("off", "0", "false")
    ):
        return bundle
    if bundle.graph.attn_plans is not None or not bundle.host_edges:
        return bundle
    plans = build_attn_plans(bundle.graph, bundle.host_edges)
    if not plans:
        return bundle
    return bundle.replace_graph(bundle.graph.replace(attn_plans=plans))


def _round_up_rows(n: int) -> int:
    return _round_up(max(int(n), 1), WINDOW)
