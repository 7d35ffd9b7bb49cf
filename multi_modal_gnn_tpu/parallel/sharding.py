"""PartitionSpec trees and placement helpers for graph/batch pytrees.

Sharding layout (1-D ``data`` mesh):
  * EdgeSet.src/dst/mask/val — sharded along the edge axis.  Edge arrays are
    padded to a multiple of 1024 (graph config), so every shard divides
    evenly and each shard is a contiguous chunk of the dst-sorted order
    (local ``segment_sum(indices_are_sorted=True)`` stays valid).
  * EdgeSet.dst_count / row_ptr, node embeddings, parameters, optimizer
    state — replicated.
  * SplitBatch arrays — sharded along the batch axis (padded to 256).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multi_modal_gnn_tpu.graph.hetero import EdgeSet, HeteroGraph
from multi_modal_gnn_tpu.parallel.mesh import DATA_AXIS
from multi_modal_gnn_tpu.training.masker import SplitBatch


def _edge_set_pspec(es: EdgeSet, axis: str) -> EdgeSet:
    return EdgeSet(
        src=P(axis),
        dst=P(axis),
        mask=P(axis),
        val=P(axis) if es.val is not None else None,
        dst_count=P(),
        row_ptr=P(),
        # windowed-kernel arrays are only consumed by the single-chip Pallas
        # path; replicate (their padded length need not divide the mesh)
        win_src=P() if es.win_src is not None else None,
        win_local=P() if es.win_local is not None else None,
        win_tile_map=P() if es.win_tile_map is not None else None,
        dense_adj=P() if es.dense_adj is not None else None,
        span_src=P() if es.span_src is not None else None,
        span_local=P() if es.span_local is not None else None,
        span_tile_map=P() if es.span_tile_map is not None else None,
        span_base=P() if es.span_base is not None else None,
        # per-shard windowed plans: sharded so each device sees its own
        shard_win_src=P(axis) if es.shard_win_src is not None else None,
        shard_win_local=P(axis) if es.shard_win_local is not None else None,
        shard_win_tile_map=P(axis) if es.shard_win_tile_map is not None else None,
        shard_win_offset=P(axis) if es.shard_win_offset is not None else None,
        val_vis=P(axis) if es.val_vis is not None else None,
        num_valid=es.num_valid,
        num_src=es.num_src,
        num_dst=es.num_dst,
        num_windows=es.num_windows,
        span_rows=es.span_rows,
        shard_win_windows=es.shard_win_windows,
    )


def graph_pspecs(graph: HeteroGraph, axis: str = DATA_AXIS) -> HeteroGraph:
    """A HeteroGraph-shaped tree of PartitionSpecs (edge axis sharded)."""
    return HeteroGraph(
        edges={et: _edge_set_pspec(es, axis) for et, es in graph.edges.items()},
        patient_lab_degree=P(),
        patient_id_base=None if graph.patient_id_base is None else P(),
        node_counts=graph.node_counts,
    )


def batch_pspec(
    batch: SplitBatch, axis: str = DATA_AXIS, replicated_vis_positions: bool = False
) -> SplitBatch:
    def _plan_spec(plan):
        if plan is None:
            return None
        # gather plans are only consumed by the single-chip Pallas path;
        # replicate them (lengths need not divide the mesh)
        return jax.tree_util.tree_map(lambda _: P(), plan)

    if batch.vis_positions is not None and not replicated_vis_positions:
        # cluster-local knockout positions index the cluster's OWN padded
        # edge array; under edge-sharded shard_map each shard sees a
        # different chunk, so a SHARDED positions array is undefined.  The
        # minibatch-DP trainer opts into the supported layout: positions
        # replicated (full batch length), the step all_gathers the
        # supervision mask and scatters the local edge chunk
        # (Trainer._visible_graph shard_map branch).  Everything else
        # fails clearly instead of with a pytree/spec structure mismatch.
        raise NotImplementedError(
            "mini-batch cluster batches (vis_positions set) require the "
            "replicated_vis_positions layout (parallel/minibatch_dp.py); "
            "plain shard_map trainers support value_context for full-batch "
            "training only"
        )
    return SplitBatch(
        patient_idx=P(axis),
        lab_idx=P(axis),
        values=P(axis),
        valid=P(axis),
        patient_plan=_plan_spec(batch.patient_plan),
        lab_plan=_plan_spec(batch.lab_plan),
        degrees=None if batch.degrees is None else P(axis),
        sample_weights=None if batch.sample_weights is None else P(axis),
        vis_positions=None if batch.vis_positions is None else P(),
        num_valid=batch.num_valid,
    )


def check_graph_divisible(graph: HeteroGraph, n: int) -> None:
    for et, es in graph.edges.items():
        if es.num_padded % n:
            raise ValueError(
                f"Edge padding of {et} ({es.num_padded}) not divisible by mesh size {n}; "
                f"raise graph.edge_pad_multiple"
            )


def attach_shard_plans(
    graph: HeteroGraph, host_edges, n_shards: int
) -> HeteroGraph:
    """Attach per-shard windowed plans (graph/hetero.py
    build_sharded_window_plans) so the shard_map trainers run the MXU
    segment kernel instead of falling back to XLA segment_sum.

    ``host_edges`` is the GraphBundle dict of sorted valid (src, dst, val)
    numpy arrays per FORWARD relation; reverse relations reuse the same
    pairs swapped and re-sorted host-side (any disjoint edge cover is
    correct — see build_sharded_window_plans)."""
    import jax.numpy as jnp
    import numpy as np

    from multi_modal_gnn_tpu import native
    from multi_modal_gnn_tpu.graph.hetero import build_sharded_window_plans
    from multi_modal_gnn_tpu.graph.schema import mirror_edge_type

    new_edges = dict(graph.edges)
    for et, (src, dst, _val) in host_edges.items():
        if et not in new_edges:
            continue
        plan_inputs = [(et, src, dst)]
        rev = mirror_edge_type(et)
        if rev in new_edges:
            order, _, _ = native.sort_edges_by_dst(
                np.asarray(src, dtype=np.int32), new_edges[rev].num_dst
            )
            plan_inputs.append(
                (rev, np.asarray(dst, np.int32)[order], np.asarray(src, np.int32)[order])
            )
        for key, s_sorted, d_sorted in plan_inputs:
            es = new_edges[key]
            sh_src, sh_local, sh_tm, sh_off, k_max = build_sharded_window_plans(
                np.asarray(s_sorted, np.int32), np.asarray(d_sorted, np.int32),
                es.num_dst, n_shards,
            )
            new_edges[key] = es.replace(
                shard_win_src=jnp.asarray(sh_src),
                shard_win_local=jnp.asarray(sh_local),
                shard_win_tile_map=jnp.asarray(sh_tm),
                shard_win_offset=jnp.asarray(sh_off),
                shard_win_windows=int(k_max),
            )
    return graph.replace(edges=new_edges)


def shard_graph(
    graph: HeteroGraph, mesh: Mesh, axis: str = DATA_AXIS, host_edges=None
) -> HeteroGraph:
    """Place the graph on the mesh with the DP layout (edges sharded).

    With ``host_edges`` (the GraphBundle's host edge dict), per-shard
    windowed plans are attached first so shard_map aggregation runs the
    Pallas MXU kernel (ops/segment.py _sharded_windowed_aggregate)."""
    n = mesh.shape[axis]
    check_graph_divisible(graph, mesh.devices.size)
    if host_edges is not None:
        graph = attach_shard_plans(graph, host_edges, n)
    specs = graph_pspecs(graph, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), graph, specs
    )


def shard_batch(batch: SplitBatch, mesh: Mesh, axis: str = DATA_AXIS) -> SplitBatch:
    n = mesh.devices.size
    if batch.valid.shape[0] % n:
        raise ValueError(
            f"Batch padding {batch.valid.shape[0]} not divisible by mesh size {n}"
        )
    specs = batch_pspec(batch, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), batch, specs
    )


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
