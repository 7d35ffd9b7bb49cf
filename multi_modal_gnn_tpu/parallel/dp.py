"""Data-parallel trainer: the jitted train step wrapped in shard_map.

Numerics are identical to the single-device Trainer: the supervision mask is
drawn over the global batch before sharding, node-level compute is replicated
(same dropout key on every device), and per-destination partial segment sums
plus the loss reduce with psum — so gradients, optimizer updates, and losses
match the single-device run to float tolerance (verified by
tests/test_parallel.py).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
from jax.sharding import PartitionSpec as P

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.graph.hetero import HeteroGraph
from multi_modal_gnn_tpu.models.factory import build_model, init_model_variables
from multi_modal_gnn_tpu.parallel.mesh import DATA_AXIS, make_mesh
from multi_modal_gnn_tpu.parallel.sharding import (
    batch_pspec,
    check_graph_divisible,
    graph_pspecs,
    shard_graph,
)
from multi_modal_gnn_tpu.training.masker import EdgeMasker
from multi_modal_gnn_tpu.training.trainer import Trainer
from multi_modal_gnn_tpu.utils.rng import RngSequence

logger = logging.getLogger(__name__)


class DataParallelTrainer(Trainer):
    """Trainer whose step functions run under shard_map over a 1-D mesh."""

    def __init__(
        self,
        graph: HeteroGraph,
        masker: EdgeMasker,
        config: Config,
        mesh=None,
        rngs: Optional[RngSequence] = None,
        host_edges=None,
    ):
        """``host_edges``: the GraphBundle's host edge dict (sorted valid
        (src, dst, val) numpy arrays per forward relation).  When given,
        per-shard windowed plans are attached so aggregation runs the Pallas
        MXU segment kernel on every device instead of XLA segment_sum
        (parallel/sharding.attach_shard_plans)."""
        self.mesh = mesh if mesh is not None else make_mesh(config.train.num_devices)
        check_graph_divisible(graph, self.mesh.devices.size)

        # parameters are initialized with an unsharded twin (identical param
        # structure; axis_name only changes collectives inside the forward)
        rngs = rngs or RngSequence(config.train.seed)
        init_model = build_model(config, graph, axis_name=None)
        variables = init_model_variables(init_model, graph, rngs.next("init"))

        model = build_model(config, graph, axis_name=DATA_AXIS)
        # value_context is supported: the visibility base rides the graph
        # (sharded with the edge arrays) and the per-epoch knockout runs
        # shard-locally after an all_gather of the supervision mask — see
        # Trainer._visible_graph's shard_map branch
        graph = shard_graph(graph, self.mesh, host_edges=host_edges)
        super().__init__(model, graph, masker, config, variables=variables, rngs=rngs)
        self._axis_name = DATA_AXIS
        logger.info("Data-parallel trainer over %d devices", self.mesh.devices.size)

    def _build_steps(self) -> None:
        self._axis_name = DATA_AXIS  # set before tracing (super().__init__ order)
        mesh = self.mesh
        gspec = graph_pspecs(self.graph)
        train_bspec = batch_pspec(self._get_batch("train"))

        sharded_train = jax.shard_map(
            self._train_step_impl,
            mesh=mesh,
            in_specs=(P(), gspec, train_bspec, P(), P(DATA_AXIS), P()),
            out_specs=(P(), P()),
        )
        donate = (0,) if self.config.train.donate_state else ()
        self._train_step = jax.jit(sharded_train, donate_argnums=donate)

        def make_eval(bspec):
            sharded_eval = jax.shard_map(
                self._eval_step_impl,
                mesh=mesh,
                in_specs=(P(), gspec, bspec),
                out_specs=(P(), P(DATA_AXIS)),
            )
            return jax.jit(sharded_eval)

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

    # eval batches differ per split in padded size AND in num_valid (static
    # pytree metadata, so it must be part of the cache key) -> per-batch jit
    def _eval_step(self, state, graph, batch):
        key = (batch.valid.shape[0], batch.num_valid)
        if key not in self._eval_steps:
            self._eval_steps[key] = self._make_eval(batch_pspec(batch))
        return self._eval_steps[key](state, graph, batch)

    def _make_scan_fn(self, k: int, with_val: bool):
        return make_sharded_scan_fn(self, k, with_val)


def make_sharded_scan_fn(trainer, k: int, with_val: bool, state_spec=None):
    """shard_map'd lax.scan over k epochs — one device dispatch.  Shared by
    the 1-D DP trainer (replicated state) and the explicit 2-D trainer
    (patient table + moments sharded over the model axis via ``state_spec``).

    Bit-parity with the epoch-at-a-time loop (and the single-device scan):
    the per-epoch supervision mask is the GLOBAL Bernoulli draw, computed
    replicated inside shard_map (E bits of bernoulli is negligible) and
    ``dynamic_slice``d to each shard's contiguous chunk — the same slices
    jit feeds the per-epoch path via P(DATA_AXIS).
    """
    import jax.numpy as jnp

    if state_spec is None:
        state_spec = P()
    mesh = trainer.mesh
    gspec = graph_pspecs(trainer.graph)
    train_batch = trainer._get_batch("train")
    train_bspec = batch_pspec(train_batch)
    vbspec = batch_pspec(trainer._get_batch("val")) if with_val else train_bspec
    mf = trainer._mask_fraction
    n_global = train_batch.valid.shape[0]
    axis = DATA_AXIS

    def scan_fn(state, graph, batch, vbatch, lab_weights, sup_stream, drop_stream, epoch0):
        shard_len = batch.valid.shape[0]

        def body(state, i):
            epoch = epoch0 + i
            sup_key = jax.random.fold_in(sup_stream, epoch)
            drop_key = jax.random.fold_in(drop_stream, epoch)
            if mf > 0:
                draw = jax.random.bernoulli(
                    sup_key, p=mf, shape=(n_global,)
                ).astype(jnp.float32)
                start = jax.lax.axis_index(axis) * shard_len
                local = jax.lax.dynamic_slice(draw, (start,), (shard_len,))
                sup_mask = local * batch.valid
            else:
                sup_mask = batch.valid
            state, loss = trainer._train_step_impl(
                state, graph, batch, lab_weights, sup_mask, drop_key
            )
            vloss = (
                trainer._eval_step_impl(state, graph, vbatch)[0]
                if with_val
                else jnp.zeros(())
            )
            return state, (loss, vloss)

        return jax.lax.scan(body, state, jnp.arange(k, dtype=jnp.int32))

    sharded = jax.shard_map(
        scan_fn,
        mesh=mesh,
        in_specs=(state_spec, gspec, train_bspec, vbspec, P(), P(), P(), P()),
        out_specs=(state_spec, (P(), P())),
    )
    donate = (0,) if trainer.config.train.donate_state else ()
    return jax.jit(sharded, donate_argnums=donate)
