"""Mini-batch clustering composed with shard_map data parallelism.

Round-3 VERDICT item 3: the two scale mechanisms — host-resident patient
clusters for edge sets beyond one chip's HBM (training/minibatch.py), and
data-parallel sharding for multi-chip throughput (parallel/dp.py) — were
mutually exclusive, yet beyond-HBM x multi-chip is exactly the regime both
were built for.  This trainer composes them as CLUSTER-PER-STEP DP:

  * the patient partition is built exactly as in :class:`MiniBatchTrainer`
    (identical static shapes across clusters, window-aligned ranges, one
    global embedding table addressed through ``patient_id_base``);
  * each step, EVERY device works on the SAME cluster, taking a contiguous
    1/n shard of that cluster's (dst-sorted, 1024-padded) edge arrays and
    of its supervised batch — per-destination partial segment sums and the
    loss reduce with psum, exactly the 1-D DP layout (parallel/sharding.py),
    so gradients match the single-device cluster step to float tolerance
    (pinned in tests/test_minibatch_dp.py);
  * with ``host_resident=True`` the cluster edge arrays stay numpy on the
    host; jit ships the in-flight cluster's shards per step (async dispatch
    overlaps the previous step's compute), so each device's HBM holds 1/n
    of ONE cluster's edges plus the replicated node tables — the memory
    envelope multi-chip-beyond-HBM needs;
  * ``value_context`` composes: the cluster's visibility template rides its
    (sharded) edge arrays, the batch's cluster-local knockout positions are
    REPLICATED, and the step all_gathers the supervision mask and scatters
    only its local edge chunk (Trainer._visible_graph shard_map branch —
    the layout ``parallel/sharding.batch_pspec`` previously rejected);
  * with ``model.use_pallas``, per-shard windowed plans are attached to
    every cluster's edge sets (graph/hetero.py build_sharded_window_plans on
    the cluster-local host edges), so aggregation runs the MXU segment
    kernel on every device.

All clusters share one compiled shard_map step (identical static shapes);
eval steps compile per (padded length, num_valid) like parallel/dp.py.

No reference analogue (the reference is single-device and full-batch only —
SURVEY.md section 2.4); the composition is TPU-native by construction:
static shapes, one dispatch per (cluster, step), collectives over the mesh.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.graph.build import GraphBundle
from multi_modal_gnn_tpu.models.factory import build_model, init_model_variables
from multi_modal_gnn_tpu.parallel.mesh import DATA_AXIS, make_mesh
from multi_modal_gnn_tpu.parallel.sharding import (
    attach_shard_plans,
    batch_pspec,
    check_graph_divisible,
    graph_pspecs,
)
from multi_modal_gnn_tpu.training.masker import EdgeMasker
from multi_modal_gnn_tpu.training.minibatch import MiniBatchTrainer
from multi_modal_gnn_tpu.utils.rng import RngSequence

logger = logging.getLogger(__name__)


class MiniBatchDPTrainer(MiniBatchTrainer):
    """Cluster-partitioned training whose per-cluster step runs under
    shard_map over a 1-D data mesh (see module docstring)."""

    def __init__(
        self,
        bundle: GraphBundle,
        masker: EdgeMasker,
        config: Config,
        num_clusters: int,
        mesh=None,
        host_resident: bool = False,
        rngs: Optional[RngSequence] = None,
    ):
        self.mesh = mesh if mesh is not None else make_mesh(config.train.num_devices)
        rngs = rngs or RngSequence(config.train.seed)
        # parameters initialized with an unsharded twin (identical param
        # structure; axis_name only changes collectives inside the forward)
        init_model = build_model(config, bundle.graph, axis_name=None)
        variables = init_model_variables(init_model, bundle.graph, rngs.next("init"))
        model = build_model(config, bundle.graph, axis_name=DATA_AXIS)
        super().__init__(
            model, bundle, masker, config, num_clusters=num_clusters,
            host_resident=host_resident, variables=variables, rngs=rngs,
        )
        logger.info(
            "Mini-batch DP: %d clusters over %d devices%s",
            num_clusters, self.mesh.devices.size,
            " (host-resident)" if host_resident else "",
        )

    # -- cluster placement ----------------------------------------------------

    def _ensure_clusters(self):
        first = self._cluster_data is None
        cd = super()._ensure_clusters()
        if not first:
            return cd
        n = self.mesh.devices.size
        cluster_host_edges = (
            self._cluster_host_edges() if self.config.model.use_pallas else None
        )
        for k, sg in enumerate(cd.subgraphs):
            check_graph_divisible(sg, n)
            if cluster_host_edges is not None:
                # per-shard windowed MXU-kernel plans from the cluster's own
                # (dst-sorted) host edges — same recipe as full-batch DP
                sg = attach_shard_plans(sg, cluster_host_edges[k], n)
            if not self.host_resident:
                # pre-place on the mesh once (reused every epoch); in
                # host_resident mode jit ships + shards the in-flight
                # cluster per step instead (the beyond-HBM envelope)
                specs = graph_pspecs(sg)
                sg = jax.tree_util.tree_map(
                    lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
                    sg, specs,
                )
            cd.subgraphs[k] = sg
        # batches stay where the partitioner built them — jit reshards them
        # per the step's in_specs (same implicit placement full-batch DP
        # uses for its masker batches); just validate divisibility early
        for rows in cd.batches.values():
            for batch, _ in rows:
                if batch is not None and batch.valid.shape[0] % n:
                    raise ValueError(
                        f"cluster batch padding {batch.valid.shape[0]} not "
                        f"divisible by mesh size {n}"
                    )
        return cd

    def _cluster_host_edges(self):
        """Per-cluster host edge dicts {et: (src_local, dst, val)} in the
        cluster's dst-sorted valid order — the plan-builder contract
        (parallel/sharding.attach_shard_plans).  Rebuilt from the bundle's
        global host edges with the same partition arithmetic as
        build_patient_clusters (same ``size`` round-up, same clamp)."""
        import numpy as np

        from multi_modal_gnn_tpu.graph.schema import PATIENT, mirror_edge_type

        cd = self._cluster_data
        K = self.num_clusters
        out = [dict() for _ in range(K)]
        for et, (src, dst, val) in self._bundle.host_edges.items():
            if et[0] != PATIENT:
                if mirror_edge_type(et) in self._bundle.host_edges:
                    continue
                raise ValueError(f"non-patient-centric relation {et}")
            cid = cd.cluster_of(np.asarray(src))
            for k in range(K):
                m = cid == k
                out[k][et] = (
                    (np.asarray(src)[m] - cd.bases[k]).astype(np.int32),
                    np.asarray(dst)[m].astype(np.int32),
                    None if val is None else np.asarray(val)[m],
                )
        return out

    # -- sharded steps (mirrors parallel/dp.py) -------------------------------

    def _build_steps(self) -> None:
        """Per-(cluster, batch)-STRUCTURE step cache.  Static pytree
        metadata (every EdgeSet's num_valid, the batch's num_valid) differs
        across clusters, so one shard_map'd jit cannot serve them all —
        in_specs must mirror each argument's exact treedef.  Keyed by the
        (graph, batch) tree structure: clusters re-use entries whenever
        their structure coincides, and the jit under each entry caches as
        usual (same behavior class as the single-device MiniBatchTrainer,
        whose plain jit also re-traces per distinct num_valid)."""
        self._axis_name = DATA_AXIS  # set before tracing
        mesh = self.mesh
        self._ensure_clusters()
        donate = (0,) if self.config.train.donate_state else ()
        train_steps: dict = {}
        eval_steps: dict = {}

        def train_step(state, graph, batch, lab_weights, sup_mask, drop_key):
            key = jax.tree_util.tree_structure((graph, batch))
            if key not in train_steps:
                sharded = jax.shard_map(
                    self._train_step_impl,
                    mesh=mesh,
                    in_specs=(
                        P(), graph_pspecs(graph),
                        batch_pspec(batch, replicated_vis_positions=True),
                        P(), P(DATA_AXIS), P(),
                    ),
                    out_specs=(P(), P()),
                )
                train_steps[key] = jax.jit(sharded, donate_argnums=donate)
            return train_steps[key](
                state, graph, batch, lab_weights, sup_mask, drop_key
            )

        def eval_step(state, graph, batch):
            key = jax.tree_util.tree_structure((graph, batch))
            if key not in eval_steps:
                sharded = jax.shard_map(
                    self._eval_step_impl,
                    mesh=mesh,
                    in_specs=(
                        P(), graph_pspecs(graph),
                        batch_pspec(batch, replicated_vis_positions=True),
                    ),
                    out_specs=(P(), P(DATA_AXIS)),
                )
                eval_steps[key] = jax.jit(sharded)
            return eval_steps[key](state, graph, batch)

        self._train_step = train_step
        self._eval_step = eval_step

        mf = self._mask_fraction

        @jax.jit
        def draw_mask(key, valid):
            if mf <= 0:
                return valid
            import jax.numpy as jnp

            draw = jax.random.bernoulli(key, p=mf, shape=valid.shape).astype(
                valid.dtype
            )
            return draw * valid

        self._draw_sup_mask = draw_mask
