"""Explicit 2-D shard_map trainer: edges x patient-table in ONE program.

The explicit-collectives counterpart of parallel/gspmd.py (where XLA's SPMD
partitioner places the communication).  Layout over a ("data", "model") mesh:

  * edge arrays + the supervised batch: sharded over ``data`` (contiguous
    chunks of the dst-sorted order, exactly like parallel/dp.py);
  * the patient ID-embedding table — the only table that grows with the
    cohort — plus its adam moments: sharded row-wise over ``model``;
  * everything else replicated.

Collectives, hand-placed:

  * forward: ONE ``all_gather(tiled)`` of the patient-table shard over
    ``model`` rebuilds the full table before the patient MLP (the hook
    ``Trainer._prepare_params``);
  * backward: AD transposes that all_gather into a ``psum_scatter`` — the
    table's gradient arrives already reduce-scattered to the shard, so the
    adam update for the big table runs shard-local (1/m of the memory and
    FLOPs per device);
  * per-relation partial segment sums and the loss psum over ``data``
    (inherited from the DP step);
  * replicated parameters need no psum over ``model``: every model-shard
    sees identical (replicated) batches and the full gathered table, so
    their gradients are bitwise identical by construction.

No reference analogue (the reference is single-device, SURVEY.md section
2.4); this is the scale-out layer for 100k+ patient cohorts.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.graph.hetero import HeteroGraph
from multi_modal_gnn_tpu.graph.schema import PATIENT
from multi_modal_gnn_tpu.models.factory import build_model, init_model_variables
from multi_modal_gnn_tpu.parallel.mesh import (  # noqa: F401 — make_2d_mesh re-exported
    DATA_AXIS,
    MODEL_AXIS,
    make_2d_mesh,
)
from multi_modal_gnn_tpu.parallel.sharding import (
    batch_pspec,
    check_graph_divisible,
    graph_pspecs,
)
from multi_modal_gnn_tpu.training.masker import EdgeMasker
from multi_modal_gnn_tpu.training.trainer import Trainer
from multi_modal_gnn_tpu.utils.rng import RngSequence

logger = logging.getLogger(__name__)

_TABLE_PATH = f"embed_{PATIENT}"


def _is_table_leaf(path_parts) -> bool:
    return any(_TABLE_PATH == str(getattr(p, "key", p)) for p in path_parts)


class TwoDTrainer(Trainer):
    """Explicit shard_map over a ("data", "model") mesh."""

    def __init__(
        self,
        graph: HeteroGraph,
        masker: EdgeMasker,
        config: Config,
        mesh=None,
        rngs: Optional[RngSequence] = None,
        host_edges=None,
    ):
        """``host_edges``: the GraphBundle's host edge dict; when given,
        per-shard windowed plans are attached over the DATA axis so every
        device runs the Pallas MXU segment kernel on its own plan chunk
        (parallel/sharding.attach_shard_plans; the plan leaves are replicated
        over the MODEL axis, and the aggregation psum stays on ``data``)."""
        self.mesh = mesh if mesh is not None else make_2d_mesh()
        data_size = self.mesh.shape[DATA_AXIS]
        model_size = self.mesh.shape[MODEL_AXIS]
        check_graph_divisible(graph, data_size)
        if host_edges is not None:
            from multi_modal_gnn_tpu.parallel.sharding import attach_shard_plans

            graph = attach_shard_plans(graph, host_edges, data_size)
        num_patients = graph.num_nodes(PATIENT)
        if num_patients % model_size:
            raise ValueError(
                f"patient count {num_patients} not divisible by model axis {model_size}"
            )

        rngs = rngs or RngSequence(config.train.seed)
        init_model = build_model(config, graph, axis_name=None)
        variables = init_model_variables(init_model, graph, rngs.next("init"))

        model = build_model(config, graph, axis_name=DATA_AXIS)
        # value_context works here exactly as in DataParallelTrainer: edges
        # (and the attached visibility base) are sharded over DATA_AXIS and
        # the knockout runs shard-locally (Trainer._visible_graph); the
        # supervision draw is replicated across MODEL_AXIS
        super().__init__(model, graph, masker, config, variables=variables, rngs=rngs)
        self._axis_name = DATA_AXIS
        self._place_state()
        logger.info(
            "2-D shard_map trainer: mesh %s, patient table sharded %d-way, "
            "edges sharded %d-way", dict(self.mesh.shape), model_size, data_size,
        )

    # -- placement -----------------------------------------------------------

    def _state_pspecs(self, state):
        """PartitionSpec tree for TrainState: the patient table (and its adam
        moments, which mirror the param tree paths) over MODEL_AXIS; all other
        leaves replicated."""
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: (
                P(MODEL_AXIS)
                if _is_table_leaf(path) and getattr(leaf, "ndim", 0) >= 1
                else P()
            ),
            state,
        )

    def _place_state(self) -> None:
        specs = self._state_pspecs(self.state)
        self.state = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)), self.state, specs
        )
        self.lab_weights = jax.device_put(
            self.lab_weights, NamedSharding(self.mesh, P())
        )
        self.graph = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
            self.graph,
            graph_pspecs(self.graph),
        )

    # -- the explicit collective ----------------------------------------------

    def _prepare_params(self, params):
        """Rebuild the full patient table from the model-axis shard.

        Expressed as ``psum`` of a zero-padded buffer rather than
        ``all_gather``: numerically identical (each shard owns disjoint
        rows), but the vma type system knows psum output is *invariant* over
        ``model`` — all_gather output stays typed as varying, which would
        poison every downstream out_spec (batch stats, loss) and defeat the
        automatic gradient psums.  AD transposes this into: cotangent psum
        over ``data`` (inserted at the invariant->varying boundary) + a
        dynamic-slice extracting the shard's rows — i.e. the table gradient
        arrives reduced and already sharded, and adam on the big table runs
        shard-local.
        """
        table = params[_TABLE_PATH]["embedding"]
        rows, dim = table.shape
        m = self.mesh.shape[MODEL_AXIS]
        idx = jax.lax.axis_index(MODEL_AXIS)
        buf = jnp.zeros((rows * m, dim), table.dtype)
        buf = jax.lax.dynamic_update_slice(buf, table, (idx * rows, 0))
        full = jax.lax.psum(buf, MODEL_AXIS)
        out = dict(params)
        out[_TABLE_PATH] = {**params[_TABLE_PATH], "embedding": full}
        return out

    # -- step construction -----------------------------------------------------

    def _build_steps(self) -> None:
        self._axis_name = DATA_AXIS
        mesh = self.mesh
        gspec = graph_pspecs(self.graph)
        train_bspec = batch_pspec(self._get_batch("train"))
        state_spec = self._state_pspecs(self.state)

        sharded_train = jax.shard_map(
            self._train_step_impl,
            mesh=mesh,
            in_specs=(state_spec, gspec, train_bspec, P(), P(DATA_AXIS), P()),
            out_specs=(state_spec, P()),
        )
        donate = (0,) if self.config.train.donate_state else ()
        self._train_step = jax.jit(sharded_train, donate_argnums=donate)

        def make_eval(bspec):
            return jax.jit(
                jax.shard_map(
                    self._eval_step_impl,
                    mesh=mesh,
                    in_specs=(state_spec, gspec, bspec),
                    out_specs=(P(), P(DATA_AXIS)),
                )
            )

        self._eval_steps = {}
        self._make_eval = make_eval

        mf = self._mask_fraction

        @jax.jit
        def draw_mask(key, valid):
            if mf <= 0:
                return valid
            draw = jax.random.bernoulli(key, p=mf, shape=valid.shape).astype(valid.dtype)
            return draw * valid

        self._draw_sup_mask = draw_mask

    def _eval_step(self, state, graph, batch):
        # num_valid is static pytree metadata -> part of the cache key
        key = (batch.valid.shape[0], batch.num_valid)
        if key not in self._eval_steps:
            self._eval_steps[key] = self._make_eval(batch_pspec(batch))
        return self._eval_steps[key](state, graph, batch)

    def _train_step_impl(self, state, graph, batch, lab_weights, sup_mask, dropout_key):
        new_state, loss = super()._train_step_impl(
            state, graph, batch, lab_weights, sup_mask, dropout_key
        )
        # loss is psum'd over data inside the loss fn; over model it is
        # identical on every shard already (replicated inputs), nothing to do
        return new_state, loss

    def restore(self, path, force: bool = False) -> None:
        """Resume re-places the restored (host) state on the mesh: the
        patient table and its adam moments go back to their model-axis
        shards, everything else replicated — so the donated train step never
        resharding-copies on the first post-resume dispatch."""
        super().restore(path, force=force)
        self._place_state()

    def _make_scan_fn(self, k: int, with_val: bool):
        # same scanned program as DP, with the patient table (+ its adam
        # moments) staying model-axis-sharded through the whole scan
        from multi_modal_gnn_tpu.parallel.dp import make_sharded_scan_fn

        return make_sharded_scan_fn(
            self, k, with_val, state_spec=self._state_pspecs(self.state)
        )
