"""Fixed-shape heterogeneous graph pytrees.

This replaces the reference's pickled PyG ``HeteroData`` object
(src/graph_build.py:104-261) with a TPU-native representation:

  * every relation is an :class:`EdgeSet` of **padded** int32 COO arrays with
    a validity mask, so shapes are static under ``jit`` and padding buckets
    bound recompilation;
  * edges are **sorted by destination**, and CSR row pointers plus per-node
    in-degree counts are precomputed at build time — segment reductions then
    run with ``indices_are_sorted=True`` (XLA) or tile cleanly over CSR rows
    (Pallas), and the mean-aggregation denominator is a free lookup;
  * padded entries point at a dummy destination segment (index ``num_dst``)
    so reductions need no masking multiplies: ``segment_sum`` over
    ``num_dst + 1`` segments and dropping the last row is exact.

Node "features" are just static counts — all representations are learned
ID-embeddings, as in the reference (src/graph_build.py:184-202).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from multi_modal_gnn_tpu.graph.schema import EdgeTypeKey, PATIENT_LAB


def _round_up(n: int, multiple: int) -> int:
    if multiple <= 0:
        return n
    return max(multiple, ((n + multiple - 1) // multiple) * multiple)


class EdgeSet(struct.PyTreeNode):
    """One relation's edges as padded, destination-sorted COO + CSR arrays.

    Attributes:
        src: int32[E_pad] source node indices (0 for padding).
        dst: int32[E_pad] destination node indices, ascending over valid
            entries; padding entries hold ``num_dst`` (the dummy segment).
        mask: float32[E_pad] 1.0 for valid edges, 0.0 for padding.
        val: optional float32[E_pad] edge attribute (normalized lab value on
            patient->lab edges; reference src/graph_build.py:216-224).
        dst_count: float32[num_dst] valid in-degree per destination node —
            the denominator for mean aggregation.
        row_ptr: int32[num_dst + 1] CSR offsets into the sorted edge arrays.
    """

    src: jax.Array
    dst: jax.Array
    mask: jax.Array
    val: Optional[jax.Array]
    dst_count: jax.Array
    row_ptr: jax.Array
    # Windowed layout for the Pallas MXU segment kernel (ops/pallas_segment):
    # edges regrouped so every fixed 512-edge tile's destinations fall inside
    # one 128-row output window; padding edges carry win_local == WINDOW.
    win_src: Optional[jax.Array] = None  # int32 [E_win] source node per slot
    win_local: Optional[jax.Array] = None  # int32 [E_win] dst offset in window
    win_tile_map: Optional[jax.Array] = None  # int32 [E_win/TILE_E] window of each tile
    # Dense mean-normalized adjacency [num_dst, num_src] — built when the
    # relation is small/dense enough (graph config dense_adjacency_max_bytes).
    # At ~10%+ density one MXU matmul beats the sparse gather+segment path
    # outright, and its backward is just the transposed matmul.
    dense_adj: Optional[jax.Array] = None
    # Span-DMA layout for over-VMEM source tables (ops/pallas_segment
    # span_dma_aggregate): the windowed slots re-laid so every TILE_E tile's
    # REAL sources live in ONE ``span_rows``-row span of the source table —
    # the kernel DMAs that one contiguous block per tile (double-buffered)
    # instead of an HBM row-gather of every edge.  Built by
    # build_src_span_plan when the source side is too large for the
    # VMEM-resident fused-table tier and no dense adjacency exists.
    span_src: Optional[jax.Array] = None  # int32 [E_span] source id per slot
    span_local: Optional[jax.Array] = None  # int32 [E_span] dst offset in window
    span_tile_map: Optional[jax.Array] = None  # int32 [E_span/TILE_E] window of tile
    span_base: Optional[jax.Array] = None  # int32 [E_span/TILE_E] table row base
    # Per-shard windowed plans for the shard_map DP path (attached by
    # parallel.sharding.shard_graph when host edges are provided): the valid
    # edges partitioned into mesh-size contiguous chunks, each with its own
    # windowed layout RELATIVE to the chunk's first destination window.
    # Arrays are [n_shards * per_shard_len], sharded along the edge axis, so
    # inside shard_map each device sees exactly its own plan; the kernel's
    # local [k_max*128, D] output lands in the global row space via
    # dynamic_update_slice at shard_win_offset*128, then one psum.  The MXU
    # segment kernel thus serves multi-chip training too — previously the
    # shard_map trainers fell back to XLA segment_sum outright.
    shard_win_src: Optional[jax.Array] = None  # int32 [n * L] global src ids
    shard_win_local: Optional[jax.Array] = None  # int32 [n * L]
    shard_win_tile_map: Optional[jax.Array] = None  # int32 [n * L / TILE_E]
    shard_win_offset: Optional[jax.Array] = None  # int32 [n] first window
    # Value-visibility mask float32[E_pad], set per-step by the trainer when
    # the model's value-context channel is enabled (models/rgcn.py
    # value_context): 1.0 where this forward may CONDITION on ``val`` (train
    # edges not under the epoch's supervision mask), 0.0 for supervised /
    # val / test / padding edges.  Distinct from ``mask`` (structural
    # validity): message passing over the topology always sees every valid
    # edge — only the observed *values* are gated, which is what keeps the
    # mask-and-recover protocol leakage-free (see audit.py).
    val_vis: Optional[jax.Array] = None
    num_valid: int = struct.field(pytree_node=False, default=0)
    num_src: int = struct.field(pytree_node=False, default=0)
    num_dst: int = struct.field(pytree_node=False, default=0)
    num_windows: int = struct.field(pytree_node=False, default=0)
    # span-DMA block height (rows DMA'd per tile); 0 = no span plan
    span_rows: int = struct.field(pytree_node=False, default=0)
    # per-shard local window count (k_max, equalized); 0 = no sharded plan
    shard_win_windows: int = struct.field(pytree_node=False, default=0)

    @property
    def num_padded(self) -> int:
        return int(self.src.shape[0])


def pad_edge_set(
    src: np.ndarray,
    dst: np.ndarray,
    num_src: int,
    num_dst: int,
    val: Optional[np.ndarray] = None,
    pad_multiple: int = 1024,
    sort_by_dst: bool = True,
    return_host: bool = False,
    dense_max_bytes: int = 0,
    as_numpy: bool = False,
    src_span_rows: int = 0,
):
    """Build an :class:`EdgeSet` from host COO arrays (vectorized, no loops).

    With ``return_host=True`` also returns the sorted *valid* (src, dst, val)
    numpy arrays — the canonical host-side view (same order as the device
    arrays), kept so consumers never read back over a remote-device link.
    ``dense_max_bytes > 0`` additionally materializes the mean-normalized
    dense adjacency when ``num_dst * num_src * 4`` fits the budget.
    """
    src = np.asarray(src, dtype=np.int32).ravel()
    dst = np.asarray(dst, dtype=np.int32).ravel()
    if src.shape != dst.shape:
        raise ValueError(f"src/dst shape mismatch: {src.shape} vs {dst.shape}")
    if val is not None:
        val = np.asarray(val, dtype=np.float32).ravel()
        if val.shape != src.shape:
            raise ValueError(f"val shape mismatch: {val.shape} vs {src.shape}")
    e = int(src.shape[0])
    if e and (src.min() < 0 or src.max() >= num_src):
        raise ValueError(f"src indices out of range [0, {num_src})")
    if e and (dst.min() < 0 or dst.max() >= num_dst):
        raise ValueError(f"dst indices out of range [0, {num_dst})")

    # sort + counts + CSR in one pass — native counting sort when built
    # (native/graphcore.cpp), stable numpy argsort otherwise
    from multi_modal_gnn_tpu import native

    if sort_by_dst and e:
        order, counts_i32, row_ptr = native.sort_edges_by_dst(dst, num_dst)
        src, dst = src[order], dst[order]
        if val is not None:
            val = val[order]
        counts = counts_i32.astype(np.float32)
    else:
        counts_int = (
            np.bincount(dst, minlength=num_dst) if e else np.zeros(num_dst, dtype=np.int64)
        )
        counts = counts_int.astype(np.float32)
        row_ptr = np.zeros(num_dst + 1, dtype=np.int32)
        row_ptr[1:] = np.cumsum(counts_int).astype(np.int32)

    e_pad = _round_up(e, pad_multiple) if pad_multiple else max(e, 1)
    pad = e_pad - e
    src_p = np.concatenate([src, np.zeros(pad, dtype=np.int32)])
    dst_p = np.concatenate([dst, np.full(pad, num_dst, dtype=np.int32)])
    mask_p = np.concatenate([np.ones(e, np.float32), np.zeros(pad, np.float32)])
    val_p = (
        np.concatenate([val, np.zeros(pad, dtype=np.float32)]) if val is not None else None
    )

    win_src, win_local, win_tile_map, num_windows = build_window_plan(
        src, dst, num_dst, row_ptr=row_ptr
    )
    dense = build_dense_adjacency(
        src, dst, num_src, num_dst, counts, dense_max_bytes, dst_sorted=sort_by_dst
    )
    # span-DMA plan: only for over-VMEM source tables the faster tiers
    # (dense adjacency, VMEM-resident fused table) cannot serve
    span = None
    if src_span_rows and dense is None and num_src >= SPAN_MIN_SRC and e:
        span = build_src_span_plan(
            win_src, win_local, win_tile_map, num_src, src_span_rows
        )
    # as_numpy: leave leaves host-resident (numpy) — jit transfers them per
    # call.  Used by the mini-batch trainer's host_resident mode so only the
    # in-flight cluster's edge arrays ever occupy HBM.
    place = np.ascontiguousarray if as_numpy else jnp.asarray
    es = EdgeSet(
        src=place(src_p),
        dst=place(dst_p),
        mask=place(mask_p),
        val=place(val_p) if val_p is not None else None,
        dst_count=place(counts),
        row_ptr=place(row_ptr),
        win_src=place(win_src),
        win_local=place(win_local),
        win_tile_map=place(win_tile_map),
        dense_adj=place(dense) if dense is not None else None,
        span_src=place(span[0]) if span is not None else None,
        span_local=place(span[1]) if span is not None else None,
        span_tile_map=place(span[2]) if span is not None else None,
        span_base=place(span[3]) if span is not None else None,
        num_valid=e,
        num_src=int(num_src),
        num_dst=int(num_dst),
        num_windows=num_windows,
        span_rows=int(src_span_rows) if span is not None else 0,
    )
    if return_host:
        return es, (src, dst, val)
    return es


def build_dense_adjacency(
    src: np.ndarray,
    dst: np.ndarray,
    num_src: int,
    num_dst: int,
    counts: np.ndarray,
    dense_max_bytes: int,
    dst_sorted: bool = False,
) -> Optional[np.ndarray]:
    """Mean-normalized dense adjacency A[dst, src] = multiplicity / in-degree,
    or None when it exceeds the byte budget.  ``A @ x`` then equals the
    segment-mean aggregation (duplicate edges accumulate, like segment_sum).

    With ``dst_sorted=True`` the int64 bincount transient (8 B/cell — 2x the
    f32 cell the budget accounts for) is chunked over ~64 MB blocks of whole
    dst rows, so peak host memory stays ~at the budget instead of 3x it.
    Counts are integers, so the chunked path is bit-identical."""
    if dense_max_bytes <= 0 or num_src * num_dst * 4 > dense_max_bytes:
        return None
    rows_per = max(1, (8 << 20) // max(num_src, 1))
    if dst_sorted and num_dst > rows_per:
        a = np.empty((num_dst, num_src), dtype=np.float32)
        r_edges = np.arange(0, num_dst + rows_per, rows_per, dtype=np.int64)
        r_edges[-1] = num_dst
        bounds = np.searchsorted(dst, r_edges, side="left")
        for i in range(len(r_edges) - 1):
            r0, r1 = int(r_edges[i]), int(r_edges[i + 1])
            e0, e1 = int(bounds[i]), int(bounds[i + 1])
            flat = (dst[e0:e1].astype(np.int64) - r0) * num_src + src[e0:e1]
            a[r0:r1] = (
                np.bincount(flat, minlength=(r1 - r0) * num_src)
                .astype(np.float32)
                .reshape(r1 - r0, num_src)
            )
    else:
        # flat-index bincount: ~30x faster than np.add.at at 5M edges
        flat = dst.astype(np.int64) * num_src + src.astype(np.int64)
        a = (
            np.bincount(flat, minlength=num_dst * num_src)
            .astype(np.float32)
            .reshape(num_dst, num_src)
        )
    a /= np.maximum(counts, 1.0)[:, None]
    return a


# Pallas segment-kernel layout constants (see ops/pallas_segment.py):
WINDOW = 128  # output rows accumulated per VMEM-resident block
# edges per grid step (one MXU matmul of WINDOW x TILE_E); 1024 matches the
# XLA layout tiling of 1-D s32 operands (Mosaic requires block == layout tile)
TILE_E = 1024


def build_window_plan(
    src: np.ndarray,
    dst: np.ndarray,
    num_dst: int,
    window: int = WINDOW,
    tile_e: int = TILE_E,
    row_ptr: Optional[np.ndarray] = None,
):
    """Regroup dst-sorted edges so each ``tile_e``-edge tile maps to exactly
    one ``window``-row output block.

    Every window's edge run is padded up to a multiple of ``tile_e`` (at
    least one tile, so every output block gets initialized).  Padding slots
    carry ``win_local == window`` — the kernel's indicator matrix compares
    against ``iota(window)``, so they contribute nothing.

    Returns (win_src, win_local, win_tile_map, num_windows).
    """
    from multi_modal_gnn_tpu import native

    if native.available():
        if row_ptr is None:
            row_ptr = np.zeros(num_dst + 1, dtype=np.int32)
            row_ptr[1:] = np.cumsum(np.bincount(dst, minlength=num_dst)).astype(np.int32)
        result = native.window_plan(src, dst, row_ptr, num_dst, window, tile_e)
        if result is not None:
            return result

    num_windows = max((num_dst + window - 1) // window, 1)
    # edges are dst-sorted; find each window's run with searchsorted
    boundaries = np.searchsorted(dst, np.arange(num_windows + 1) * window)
    src_parts, local_parts, tile_map = [], [], []
    for w in range(num_windows):
        lo, hi = int(boundaries[w]), int(boundaries[w + 1])
        n = hi - lo
        n_pad = max(tile_e, ((n + tile_e - 1) // tile_e) * tile_e)
        pad = n_pad - n
        src_parts.append(np.concatenate([src[lo:hi], np.zeros(pad, np.int32)]))
        local_parts.append(
            np.concatenate(
                [dst[lo:hi] - w * window, np.full(pad, window, np.int32)]
            ).astype(np.int32)
        )
        tile_map.extend([w] * (n_pad // tile_e))
    return (
        np.concatenate(src_parts).astype(np.int32),
        np.concatenate(local_parts).astype(np.int32),
        np.asarray(tile_map, dtype=np.int32),
        num_windows,
    )


class GatherPlan(struct.PyTreeNode):
    """Windowed layout for the BACKWARD of an arbitrary row gather.

    For ``y = x[idx]`` the cotangent is a scatter-add ``dx[r] = sum_{p:
    idx[p]==r} g[p]`` — a segment sum, so it can run on the MXU segment
    kernel given a windowed plan over (position -> idx) pairs.  Built once
    per static index array (e.g. a split batch's patient/lab columns).
    """

    win_src: jax.Array  # int32 [E_win] positions into the gathered batch
    win_local: jax.Array  # int32 [E_win] target row offset within window
    win_tile_map: jax.Array  # int32 [E_win / TILE_E]
    num_windows: int = struct.field(pytree_node=False, default=0)
    num_rows: int = struct.field(pytree_node=False, default=0)
    # True when the batch is ALREADY laid out in this plan's slot order
    # (EdgeMasker slot_major_train): the backward's window-order gather —
    # trace-measured at ~45 ms per 3.9M x 64 random gather — disappears and
    # the cotangent feeds the segment kernel directly.
    identity: bool = struct.field(pytree_node=False, default=False)
    # span-bounded lab tiles (regroup_slots_by_lab_block): every tile's labs
    # live in ONE lab_block_rows-row block of the lab table, so the pair-head
    # kernel's dominant [TILE_E, num_labs] one-hot gather narrows to
    # [TILE_E, lab_block_rows].  lab_block_map[t] = that tile's block.
    lab_block_map: Optional[jax.Array] = None  # int32 [E_win / TILE_E]
    lab_block_rows: int = struct.field(pytree_node=False, default=0)
    # arbitrary-base span mode (regroup_slots_by_lab_span): lab_block_map
    # holds per-tile 8-aligned ROW BASES into the padded lab table instead of
    # aligned block indices — tiles split only when their lab SPAN exceeds
    # lab_block_rows, so the regroup's slot inflation (33%/10% in aligned
    # block mode, PERFORMANCE.md) collapses to (almost) nothing.
    lab_span_mode: bool = struct.field(pytree_node=False, default=False)


def build_gather_plan(idx: np.ndarray, num_rows: int) -> "GatherPlan":
    """Plan the scatter-free backward for ``x[idx]`` (host-side, once)."""
    idx = np.asarray(idx, dtype=np.int32)
    order = np.argsort(idx, kind="stable").astype(np.int32)
    win_src, win_local, win_tile_map, num_windows = build_window_plan(
        order, idx[order], num_rows
    )
    return GatherPlan(
        win_src=jnp.asarray(win_src),
        win_local=jnp.asarray(win_local),
        win_tile_map=jnp.asarray(win_tile_map),
        num_windows=num_windows,
        num_rows=int(num_rows),
    )


def regroup_slots_by_lab_block(
    win_local: np.ndarray,
    win_tile_map: np.ndarray,
    lab_idx: np.ndarray,
    num_labs: int,
    block_rows: int = WINDOW,
):
    """Split each patient window's slot run into per-lab-block tile groups.

    Input: a slot-major layout (arrays in GatherPlan slot order).  Output: a
    slot permutation-with-padding such that every TILE_E tile's REAL slots
    address labs inside ONE ``block_rows``-row aligned block of the lab
    table — the contract the pair-head kernel's narrow lab path needs.  With
    labs indexed by descending frequency (graph build) the inflation is
    small: most of a window's mass lands in block 0.

    Returns (slot_moves, new_len, local2, tile_map2, lab_block_map):
    ``slot_moves[old_slot]`` is the new slot of each REAL old slot (-1 for
    old padding); callers re-lay their per-slot arrays with it (new padding
    slots carry local == WINDOW / zeros).
    """
    win_local = np.asarray(win_local)
    win_tile_map = np.asarray(win_tile_map)
    lab_idx = np.asarray(lab_idx)
    e_win = len(win_local)
    num_tiles = e_win // TILE_E
    real = win_local < WINDOW

    # window boundaries: tiles of one window are contiguous
    slot_window = np.repeat(win_tile_map, TILE_E)
    # groups keyed by (window, lab block) — order within a window: by block
    blocks = lab_idx // block_rows
    # count group sizes to lay out the output
    out_len = 0
    tile_blocks = []
    tile_windows = []
    order = np.lexsort((np.arange(e_win), blocks, slot_window))  # stable
    order = order[real[order]]  # real slots, grouped by (window, block)
    g_win = slot_window[order]
    g_blk = blocks[order]
    # group boundaries
    if len(order):
        cut = np.nonzero((np.diff(g_win) != 0) | (np.diff(g_blk) != 0))[0] + 1
        bounds = np.concatenate([[0], cut, [len(order)]])
    else:
        bounds = np.array([0, 0])
    slot_moves = np.full(e_win, -1, dtype=np.int64)
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        if hi == lo:
            continue
        n = hi - lo
        padded = -(-n // TILE_E) * TILE_E
        slot_moves[order[lo:hi]] = out_len + np.arange(n)
        tile_blocks += [int(g_blk[lo])] * (padded // TILE_E)
        tile_windows += [int(g_win[lo])] * (padded // TILE_E)
        out_len += padded
    slot_moves, tile_blocks, tile_windows, out_len = _pad_and_sort_tiles(
        slot_moves, tile_blocks, tile_windows, out_len, win_tile_map, num_tiles
    )
    return (
        slot_moves,
        out_len,
        _relayed_locals(slot_moves, win_local, out_len),
        np.asarray(tile_windows, dtype=np.int32),
        np.asarray(tile_blocks, dtype=np.int32),
    )


def _pad_and_sort_tiles(slot_moves, tile_meta, tile_windows, out_len,
                        win_tile_map, num_tiles):
    """Shared regroup epilogue: windows with no real slots still get one
    (padding) tile so the window sequence stays monotone for the kernel's
    first-tile-of-window dprojp zeroing; then tiles re-sort by window
    (insertions appended at the end) and slot_moves remaps through the tile
    permutation."""
    seen_windows = set(tile_windows)
    for w in range(int(win_tile_map.max()) + 1 if num_tiles else 0):
        if w not in seen_windows:
            tile_meta.append(0)
            tile_windows.append(w)
            out_len += TILE_E
    t_order = np.argsort(np.asarray(tile_windows), kind="stable")
    if not np.array_equal(t_order, np.arange(len(t_order))):
        tile_new_pos = np.empty(len(t_order), dtype=np.int64)
        tile_new_pos[t_order] = np.arange(len(t_order))
        old_tile = slot_moves // TILE_E
        off = slot_moves % TILE_E
        m = slot_moves >= 0
        slot_moves[m] = tile_new_pos[old_tile[m]] * TILE_E + off[m]
        tile_meta = list(np.asarray(tile_meta)[t_order])
        tile_windows = list(np.asarray(tile_windows)[t_order])
    return slot_moves, tile_meta, tile_windows, out_len


def _relayed_locals(slot_moves, win_local, out_len):
    """Window-local row ids in the regrouped layout (padding -> WINDOW)."""
    local2 = np.full(out_len, WINDOW, dtype=np.int32)
    m = slot_moves >= 0
    local2[slot_moves[m]] = win_local[m]
    return local2


# Alignment of span-mode table bases.  The kernel promises Mosaic the
# dynamic-slice start is a multiple of this; it must divide every base AND
# be a whole number of sublanes for the table dtype — f32 packs 1 row per
# sublane (8) and bf16 packs 2 (16), so 16 covers both compute dtypes.
SPAN_BASE_ALIGN = 16


def regroup_slots_by_lab_span(
    win_local: np.ndarray,
    win_tile_map: np.ndarray,
    lab_idx: np.ndarray,
    num_labs: int,
    block_rows: int = WINDOW,
):
    """Arbitrary-base variant of :func:`regroup_slots_by_lab_block`.

    The aligned-block regroup forces each tile's labs onto a
    ``block_rows``-ALIGNED lab-table block, which splits a window's slot run
    at every block boundary its labs straddle — measured 33%/10% slot
    inflation at block 128/256 on the scale config (PERFORMANCE.md
    "Negative result — span-bounded lab tiles").  This variant instead
    sorts each window's real slots by lab and packs tiles greedily under a
    SPAN constraint: a tile's base is ``min_lab`` rounded down to
    :data:`SPAN_BASE_ALIGN` (sublane-aligned for the kernel's dynamic slice
    of the VMEM-resident table in both f32 and bf16, clamped so
    ``base + block_rows`` stays inside the padded table) and the tile
    closes only when full or when the next lab would fall outside
    ``[base, base + block_rows)``.  With lab-frequency-ordered indexing
    tiles rarely split, so the narrow-gather FLOP saving is kept without
    the inflation.

    Returns ``(slot_moves, new_len, local2, tile_map2, lab_base)`` —
    same contract as the block regroup except ``lab_base[t]`` is the tile's
    table ROW BASE (multiple of SPAN_BASE_ALIGN) rather than a block index.
    """
    if block_rows % SPAN_BASE_ALIGN:
        raise ValueError(
            f"span-mode block_rows must be a multiple of {SPAN_BASE_ALIGN} "
            f"(sublane alignment of the in-kernel table slice), got {block_rows}"
        )
    win_local = np.asarray(win_local)
    win_tile_map = np.asarray(win_tile_map)
    lab_idx = np.asarray(lab_idx)

    # native packer when built (bit-identical contract, tests/test_native.py);
    # the numpy path below stays as the always-available fallback
    from multi_modal_gnn_tpu import native

    if native.available():
        result = native.span_plan(
            win_local, win_tile_map, lab_idx, int(num_labs),
            int(block_rows), WINDOW, TILE_E, SPAN_BASE_ALIGN,
        )
        if result is not None:
            return result
    return _regroup_slots_by_lab_span_numpy(
        win_local, win_tile_map, lab_idx, num_labs, block_rows
    )


def _regroup_slots_by_lab_span_numpy(
    win_local: np.ndarray,
    win_tile_map: np.ndarray,
    lab_idx: np.ndarray,
    num_labs: int,
    block_rows: int,
):
    """Pure-numpy span packer (fallback; the native packer is bit-identical
    by contract — parity pinned in tests/test_native.py)."""
    e_win = len(win_local)
    num_tiles = e_win // TILE_E
    real = win_local < WINDOW

    labs_pad = -(-max(num_labs, 1) // 128) * 128
    labs_pad = max(labs_pad, block_rows)
    max_base = labs_pad - block_rows  # multiple of SPAN_BASE_ALIGN by the check

    slot_window = np.repeat(win_tile_map, TILE_E)
    # real slots ordered by (window, lab); stable so equal labs keep order
    order = np.lexsort((np.arange(e_win), lab_idx, slot_window))
    order = order[real[order]]
    g_win = slot_window[order]
    g_lab = lab_idx[order]
    n = len(order)
    # window run boundaries in the sorted view
    if n:
        w_starts = np.nonzero(np.r_[True, g_win[1:] != g_win[:-1]])[0]
        w_ends = np.r_[w_starts[1:], n]
    else:
        w_starts = w_ends = np.zeros(0, dtype=np.int64)

    slot_moves = np.full(e_win, -1, dtype=np.int64)
    tile_bases: list = []
    tile_windows: list = []
    out_len = 0
    # greedy per-tile packing: O(num_tiles) iterations (searchsorted finds
    # each tile's span cut in the window's lab-sorted run), not O(n) slots
    for s, e in zip(w_starts, w_ends):
        w = int(g_win[s])
        i = int(s)
        while i < e:
            base = min(
                (int(g_lab[i]) // SPAN_BASE_ALIGN) * SPAN_BASE_ALIGN, max_base
            )
            cut = i + int(np.searchsorted(g_lab[i:e], base + block_rows, "left"))
            j = min(i + TILE_E, cut)
            slot_moves[order[i:j]] = out_len + np.arange(j - i)
            tile_bases.append(base)
            tile_windows.append(w)
            out_len += TILE_E
            i = j

    slot_moves, tile_bases, tile_windows, out_len = _pad_and_sort_tiles(
        slot_moves, tile_bases, tile_windows, out_len, win_tile_map, num_tiles
    )
    return (
        slot_moves,
        out_len,
        _relayed_locals(slot_moves, win_local, out_len),
        np.asarray(tile_windows, dtype=np.int32),
        np.asarray(tile_bases, dtype=np.int32),
    )


def build_sharded_window_plans(
    src_sorted: np.ndarray,
    dst_sorted: np.ndarray,
    num_dst: int,
    n_shards: int,
    window: int = WINDOW,
    tile_e: int = TILE_E,
):
    """Per-shard windowed plans for shard_map data parallelism.

    Partitions the VALID dst-sorted edges into ``n_shards`` contiguous,
    near-equal chunks and builds each chunk's windowed layout relative to
    its first destination window.  The partition is independent of how the
    raw edge arrays are sharded on the mesh: each device computes the
    aggregation of exactly its plan's edges and one psum restores the total,
    so any disjoint cover of the valid edges is correct.

    Every shard's plan is equalized to the same local window count
    (``k_max``) and tile count — all-padding tiles (``local == window``)
    extend the window sequence monotonically and initialize every local
    output block, because the kernel's revisit pattern leaves untouched
    blocks undefined.  Empty shards (possible when edges < shards) emit
    all-padding plans at offset 0 and contribute exact zeros.

    Returns ``(sh_src, sh_local, sh_tile_map, sh_offset, k_max)`` with the
    first three flat-concatenated over shards (length divisible by
    ``n_shards`` for P(axis) sharding).
    """
    e = len(src_sorted)
    bounds = [round(i * e / n_shards) for i in range(n_shards + 1)]
    plans = []
    k_list = []
    offsets = np.zeros(n_shards, dtype=np.int32)
    for s in range(n_shards):
        lo, hi = bounds[s], bounds[s + 1]
        if hi <= lo:
            plans.append(None)
            k_list.append(0)
            continue
        c_src = np.ascontiguousarray(src_sorted[lo:hi], dtype=np.int32)
        c_dst = np.asarray(dst_sorted[lo:hi], dtype=np.int32)
        first_w = int(c_dst[0]) // window
        last_w = int(c_dst[-1]) // window
        k_s = last_w - first_w + 1
        offsets[s] = first_w
        w_src, w_local, w_tm, _ = build_window_plan(
            c_src, np.ascontiguousarray(c_dst - first_w * window),
            k_s * window, window=window, tile_e=tile_e,
        )
        plans.append((w_src, w_local, w_tm))
        k_list.append(k_s)

    k_max = max(max(k_list), 1)
    # tiles after extending each shard to k_max local windows
    ntiles_max = max(
        k_max if p is None else len(p[2]) + (k_max - k)
        for p, k in zip(plans, k_list)
    )
    pad_tile_src = np.zeros(tile_e, np.int32)
    pad_tile_local = np.full(tile_e, window, np.int32)

    sh_src, sh_local, sh_tm = [], [], []
    for p, k_s in zip(plans, k_list):
        if p is None:
            src_parts = [pad_tile_src] * ntiles_max
            local_parts = [pad_tile_local] * ntiles_max
            tm = list(range(k_max)) + [k_max - 1] * (ntiles_max - k_max)
        else:
            w_src, w_local, w_tm = p
            n_tiles = len(w_tm)
            src_parts = [w_src]
            local_parts = [w_local]
            tm = list(w_tm)
            # initialize local windows k_s..k_max-1, then equalize tile count
            # at window k_max-1 (monotone either way)
            extra = list(range(k_s, k_max)) + [k_max - 1] * (
                ntiles_max - n_tiles - (k_max - k_s)
            )
            src_parts += [pad_tile_src] * len(extra)
            local_parts += [pad_tile_local] * len(extra)
            tm += extra
        sh_src.append(np.concatenate(src_parts))
        sh_local.append(np.concatenate(local_parts))
        sh_tm.append(np.asarray(tm, np.int32))
    return (
        np.concatenate(sh_src).astype(np.int32),
        np.concatenate(sh_local).astype(np.int32),
        np.concatenate(sh_tm).astype(np.int32),
        offsets,
        k_max,
    )


# span-DMA plan gates: below SPAN_MIN_SRC rows the VMEM-resident fused-table
# tier owns the relation outright; above SPAN_MAX_INFLATION slot growth the
# tile splitting costs more matmul passes than the DMA saves in gather traffic
SPAN_MIN_SRC = 4096
SPAN_MAX_INFLATION = 0.25


def build_src_span_plan(
    win_src: np.ndarray,
    win_local: np.ndarray,
    win_tile_map: np.ndarray,
    num_src: int,
    span_rows: int,
):
    """Span-DMA plan for over-VMEM aggregation sources.

    Re-lays the windowed slots (sorting each 128-dst window's edges by
    SOURCE — legal, window accumulation is order-independent; the dst-sorted
    invariant is at window granularity) so every TILE_E tile's real sources
    live in one ``span_rows``-row span of the source table, at a
    SPAN_BASE_ALIGN-aligned base.  The aggregation kernel then DMAs one
    contiguous ``[span_rows, D]`` block per tile instead of an HBM row-gather
    of every edge — traffic drops from O(E·D) to O(tiles·span_rows·D).

    This is :func:`regroup_slots_by_lab_span` pointed at the src axis: the
    same greedy packer, with per-slot "lab" ids = source ids and the source
    table standing in for the lab table.

    Returns ``(span_src, span_local, span_tile_map, span_base)`` or ``None``
    when tile splitting inflates the slot count beyond SPAN_MAX_INFLATION
    (sparse relations whose per-window source spans exceed ``span_rows``).
    """
    slot_moves, new_len, local2, tile_map2, base = regroup_slots_by_lab_span(
        win_local, win_tile_map, win_src, num_src, block_rows=span_rows
    )
    if new_len > len(win_local) * (1.0 + SPAN_MAX_INFLATION):
        return None
    src2 = np.zeros(new_len, dtype=np.int32)
    m = slot_moves >= 0
    src2[slot_moves[m]] = np.asarray(win_src, dtype=np.int32)[m]
    return src2, local2, tile_map2, base


class HeteroGraph(struct.PyTreeNode):
    """The whole heterogeneous graph as one frozen pytree.

    ``node_counts`` and the edge-type keys are static (part of the jit cache
    key); edge arrays are traced leaves.  ``patient_lab_degree`` is the
    per-patient count of lab edges, precomputed once at build time — the
    reference recomputes it with ``torch.bincount`` on every forward
    (src/model.py:297-298).
    """

    edges: Dict[EdgeTypeKey, EdgeSet]
    patient_lab_degree: jax.Array  # int32[num_patients]
    # mini-batch (cluster) subgraphs only (training/minibatch.py): global
    # patient index of this subgraph's local patient 0.  The model's patient
    # embedding/feature lookups add this offset so one GLOBAL table serves
    # every cluster.  None for full graphs.
    patient_id_base: Optional[jax.Array] = None  # int32 scalar
    # flash-attention layouts per destination node type (graph/attn_plan.py),
    # attached on demand by ensure_attn_plans for the HGT architecture; the
    # attention tiers fall back to dense/segment when absent
    attn_plans: Optional[Dict[str, object]] = None
    node_counts: Tuple[Tuple[str, int], ...] = struct.field(
        pytree_node=False, default=()
    )

    @property
    def node_count_map(self) -> Dict[str, int]:
        return dict(self.node_counts)

    def num_nodes(self, node_type: str) -> int:
        return self.node_count_map[node_type]

    @property
    def node_types(self) -> Tuple[str, ...]:
        return tuple(name for name, _ in self.node_counts)

    @property
    def edge_types(self) -> Tuple[EdgeTypeKey, ...]:
        return tuple(self.edges.keys())

    @property
    def metadata(self) -> Tuple[Tuple[str, ...], Tuple[EdgeTypeKey, ...]]:
        """(node_types, edge_types) — the reference's HeteroData.metadata()."""
        return (self.node_types, self.edge_types)

    @property
    def patient_lab(self) -> EdgeSet:
        return self.edges[PATIENT_LAB]


def compute_patient_lab_degree(edge_set: EdgeSet, num_patients: int) -> jax.Array:
    """Lab-degree per patient from the valid forward patient->lab edges."""
    src = np.asarray(edge_set.src)
    mask = np.asarray(edge_set.mask) > 0
    deg = np.bincount(src[mask], minlength=num_patients).astype(np.int32)
    return jnp.asarray(deg)
