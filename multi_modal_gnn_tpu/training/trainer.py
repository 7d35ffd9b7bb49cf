"""Jitted full-batch training loop with early stopping and plateau LR.

The reference's per-epoch work (src/train.py:332-431) — supervision-mask
draw, full-graph forward (twice: initial + propagated embeddings), dual-head
prediction, lab-weighted masked MAE, backward, Adam step — compiles here into
ONE donated XLA computation per epoch (`Trainer._train_step`).  Validation is
a second jitted computation.  Host Python only draws keys, applies scheduler/
early-stopping logic, and logs — nothing data-dependent crosses back except
the scalar losses.

Optimizer: optax chain (add_decayed_weights -> adam/sgd) matching torch's
coupled L2 weight-decay Adam (reference src/train.py:251-269), with the
learning rate injected as a runtime scalar (optax.inject_hyperparams) so the
host-side ReduceLROnPlateau never triggers a recompile.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.graph.build import GraphBundle
from multi_modal_gnn_tpu.graph.hetero import HeteroGraph
from multi_modal_gnn_tpu.graph.schema import LAB
from multi_modal_gnn_tpu.models.factory import build_model, count_parameters, init_model_variables
from multi_modal_gnn_tpu.models.losses import (
    compute_lab_weights,
    masked_mean_loss,
    weighted_regression_loss,
)
from multi_modal_gnn_tpu.training.checkpoint import load_checkpoint, save_checkpoint
from multi_modal_gnn_tpu.training.masker import (
    EdgeMasker,
    SplitBatch,
    masker_from_config,
    resolve_lab_tile_rows as _resolve_lab_tile_rows,  # bench.py compat alias
)
from multi_modal_gnn_tpu.training.schedulers import build_scheduler
from multi_modal_gnn_tpu.utils.io import save_json
from multi_modal_gnn_tpu.utils.rng import RngSequence

logger = logging.getLogger(__name__)


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def build_optimizer(train_config, flatten: bool = True) -> optax.GradientTransformation:
    """Adam/SGD (+ weight decay) per the reference (src/train.py:251-269).

    ``train.extras.flatten_optimizer: true`` wraps the chain in
    ``optax.flatten``: the update runs on ONE raveled parameter vector
    instead of ~30 per-leaf ops (elementwise math unchanged; parity pinned
    in tests/test_training.py).  Measured on the v5e it is a NEGATIVE
    result, kept as an opt-in: the ravel/unravel concats cost more than the
    per-leaf fusions XLA already packs inside the scanned epoch — eICU
    config 1.63 -> 1.84 ms/epoch, scale config neutral (50.3 vs 50.5 ms).
    Auto-disabled when ``embedding_weight_decay`` is set (its mask needs
    tree paths) and by GSPMDTrainer (a flat vector cannot inherit the
    patient table's row sharding).
    """
    oc = train_config.optimizer
    flatten = (
        flatten
        and bool(train_config.extras.get("flatten_optimizer", False))
        and not oc.embedding_weight_decay
    )

    def embed_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: any(
                str(getattr(p, "key", p)).startswith("embed_") for p in path
            ),
            params,
        )

    def make(learning_rate):
        decay = [optax.add_decayed_weights(oc.weight_decay)]
        if oc.embedding_weight_decay:
            # per-entity ridge shrinkage on the ID tables only (see
            # OptimizerConfig.embedding_weight_decay)
            decay.append(
                optax.masked(
                    optax.add_decayed_weights(oc.embedding_weight_decay), embed_mask
                )
            )
        if oc.type.lower() == "adam":
            tx = optax.chain(*decay, optax.adam(learning_rate))
        elif oc.type.lower() == "sgd":
            tx = optax.chain(*decay, optax.sgd(learning_rate, momentum=oc.momentum))
        else:
            raise ValueError(f"Unknown optimizer: {oc.type}")
        return optax.flatten(tx) if flatten else tx

    return optax.inject_hyperparams(make)(learning_rate=oc.lr)


class Trainer:
    """Drives the jitted train/eval steps over a static graph."""

    # single-vector optimizer updates (see build_optimizer); GSPMDTrainer
    # turns this off — its patient embedding table is row-sharded and a
    # flat opt-state vector cannot inherit that sharding
    _flatten_optimizer = True

    def __init__(
        self,
        model,
        graph: HeteroGraph,
        masker: EdgeMasker,
        config: Config,
        variables: Optional[dict] = None,
        rngs: Optional[RngSequence] = None,
        eval_only: bool = False,
    ):
        """``eval_only``: build just the eval step (no train step, no
        supervision-mask sampler) — the lean path for evaluation/inference
        CLIs that restore a checkpoint and never train."""
        self.model = model
        self.graph = graph
        self.masker = masker
        self.config = config
        self.eval_only = bool(eval_only)
        self.rngs = rngs or RngSequence(config.train.seed)
        tc = config.train

        if variables is None:
            variables = init_model_variables(model, graph, self.rngs.next("init"))
        self.tx = build_optimizer(tc, flatten=self._flatten_optimizer)
        self.state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        logger.info("Model parameters: %s", f"{count_parameters(self.state.params):,}")

        # lab-wise inverse-variance loss weights from the train split
        # (reference src/train.py:295-330).  ``train.extras.lab_reweighting:
        # false`` disables them (uniform weights) — the reference's
        # pre-Iteration-7 behavior, kept as an ablation knob for the
        # generator-validation ladder (scripts/validate_generator.py).
        _, train_lab_idx, train_values = masker.split_arrays("train")
        # host copy kept so host-side consumers (mini-batch cluster build)
        # never read the device array back through the relay
        if bool(tc.extras.get("lab_reweighting", True)):
            self.host_lab_weights = compute_lab_weights(
                train_values, train_lab_idx, graph.num_nodes(LAB)
            )
        else:
            self.host_lab_weights = np.ones(graph.num_nodes(LAB), dtype=np.float32)
        self.lab_weights = jnp.asarray(self.host_lab_weights)
        self._aug_batches: dict = {}  # split -> (masker batch, augmented batch)

        self._loss_type = tc.loss
        self._mask_fraction = tc.mask_fraction
        self._axis_name: Optional[str] = None

        # value-context plumbing (models/rgcn.py value_context): per-forward
        # visibility over the padded patient->lab values.  Base template =
        # train edges only; the train step additionally knocks out the
        # epoch's supervised subset so a supervised edge never sees its own
        # target (leakage-free mask-and-recover).
        self._value_context = bool(getattr(model, "value_context", False))
        if self._value_context:
            num_padded = graph.patient_lab.num_padded
            self._vis_base = jnp.asarray(masker.visibility_base(num_padded))
            self._vis_train_pos = (
                None if self.eval_only else jnp.asarray(masker.train_positions())
            )
            # attach the base template to the graph itself: it is an
            # edge-length array, so every parallel layout shards it exactly
            # like the edge arrays (parallel/sharding.py EdgeSet val_vis
            # spec) and _visible_graph sees the correct LOCAL chunk inside
            # shard_map bodies
            from multi_modal_gnn_tpu.graph.schema import PATIENT_LAB as _PL

            es = self.graph.edges[_PL].replace(val_vis=self._vis_base)
            self.graph = self.graph.replace(edges={**self.graph.edges, _PL: es})

        self._build_steps()

        # host-side loop state (captured in checkpoints for true resume)
        self.scheduler = build_scheduler(tc)
        self._lr = float(tc.optimizer.lr)
        self.best_val_loss = float("inf")
        self.patience_counter = 0
        self.epoch = 0
        self.history: Dict[str, list] = {"train_loss": [], "val_loss": [], "learning_rates": []}
        self.best_state: Optional[TrainState] = None

    # -- jitted computations ------------------------------------------------

    def _build_steps(self) -> None:
        """Compile train/eval steps (overridden by the data-parallel trainer)."""
        self._eval_step = jax.jit(self._eval_step_impl)
        if self.eval_only:
            return
        donate = (0,) if self.config.train.donate_state else ()
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=donate)
        mf = self._mask_fraction

        @jax.jit
        def draw_mask(key, valid):
            if mf <= 0:
                return valid
            draw = jax.random.bernoulli(key, p=mf, shape=valid.shape).astype(jnp.float32)
            return draw * valid

        self._draw_sup_mask = draw_mask

    @property
    def serving_model(self):
        """Axis-name-free twin of ``self.model`` for use OUTSIDE the
        trainer's shard_map steps (serving, export).  The shard_map trainers
        build their model with ``axis_name=DATA_AXIS`` so segment reductions
        psum across shards; applying that model outside shard_map raises an
        unbound-axis error.  Parameters are structurally identical, so the
        twin consumes ``state.params`` as-is."""
        if self._axis_name is None:
            return self.model
        from multi_modal_gnn_tpu.models.factory import build_model

        return build_model(self.config, self.graph, axis_name=None)

    def _prepare_params(self, params):
        """Hook: reconstruct full parameter arrays inside the jitted step.
        The explicit 2-D trainer (parallel/dp2d.py) all-gathers its
        model-axis-sharded patient table here; AD then routes the table's
        gradient through the gather's transpose (a reduce-scatter), so the
        optimizer update itself runs on the shard."""
        return params

    def _apply_train(self, params, batch_stats, graph, batch: SplitBatch, dropout_key):
        params = self._prepare_params(params)
        variables = {"params": params}
        mutable = []
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        # node-level dropout uses the shared key (node arrays are replicated
        # under SPMD); edge-head dropout gets a per-shard key so sharded batch
        # rows draw independent masks
        edge_key = jax.random.fold_in(dropout_key, 1)
        if self._axis_name is not None:
            edge_key = jax.random.fold_in(edge_key, jax.lax.axis_index(self._axis_name))
        kwargs = {"mutable": mutable} if mutable else {}
        out = self.model.apply(
            variables,
            graph,
            batch.patient_idx,
            batch.lab_idx,
            train=True,
            method=self.model.predict_lab_values,
            rngs={"dropout": dropout_key, "edge_dropout": edge_key},
            patient_plan=batch.patient_plan,
            lab_plan=batch.lab_plan,
            degrees=batch.degrees,
            **kwargs,
        )
        if mutable:
            preds, new_vars = out
            return preds, new_vars["batch_stats"]
        return out, batch_stats

    def _visible_graph(
        self,
        graph: HeteroGraph,
        sup_mask: Optional[jax.Array],
        positions: Optional[jax.Array] = None,
    ) -> HeteroGraph:
        """Attach the step's value-visibility mask to the patient->lab
        EdgeSet (no-op unless the model's value_context channel is on).
        Train steps pass the epoch's supervision mask so supervised edges'
        values are hidden from the forward; eval passes None (condition on
        all train observations, none of val/test).  ``positions`` overrides
        the global train-row positions with batch-local ones (mini-batch
        clusters carry them on the batch: SplitBatch.vis_positions)."""
        if not self._value_context:
            return graph
        from multi_modal_gnn_tpu.graph.schema import PATIENT_LAB

        es = graph.edges[PATIENT_LAB]
        # base template travels ON the graph (attached in __init__), so under
        # shard_map this is already the local edge chunk
        vis = es.val_vis if es.val_vis is not None else self._vis_base
        if positions is None:
            positions = self._vis_train_pos
        if sup_mask is not None:
            if self._axis_name is not None and es.val_vis is not None and (
                vis.shape[0] < self._vis_base.shape[0]
            ):
                # explicit shard_map body: vis is the local chunk
                # [d*S, (d+1)*S) of the global edge array while sup_mask is
                # the local batch shard.  Gather the GLOBAL supervision mask
                # (cheap: B bits), map global train positions into this
                # chunk, and clamp out-of-range rows to index 0 with factor
                # 1.0 — an exact no-op under scatter-multiply.
                sup = jax.lax.all_gather(sup_mask, self._axis_name, tiled=True)
                shard = vis.shape[0]
                start = jax.lax.axis_index(self._axis_name) * shard
                lpos = positions - start
                ok = (lpos >= 0) & (lpos < shard)
                factor = jnp.where(ok, 1.0 - sup, 1.0)
                vis = vis.at[jnp.clip(lpos, 0, shard - 1)].multiply(factor)
            else:
                # single-chip / GSPMD: global view.  Unique train positions;
                # batch-padding rows point at 0 with sup=0 -> multiplier 1.0
                vis = vis.at[positions].multiply(1.0 - sup_mask)
        es = es.replace(val_vis=vis)
        return graph.replace(edges={**graph.edges, PATIENT_LAB: es})

    def _train_step_impl(
        self,
        state: TrainState,
        graph: HeteroGraph,
        batch: SplitBatch,
        lab_weights: jax.Array,
        sup_mask: jax.Array,
        dropout_key: jax.Array,
    ) -> Tuple[TrainState, jax.Array]:
        graph = self._visible_graph(graph, sup_mask, batch.vis_positions)

        def loss_fn(params):
            preds, new_bs = self._apply_train(params, state.batch_stats, graph, batch, dropout_key)
            # the reference applies lab-wise weights only for mae/mse and falls
            # back to the unweighted loss for anything else (src/train.py:374-381)
            if self._loss_type in ("mae", "mse"):
                w = (
                    batch.sample_weights
                    if batch.sample_weights is not None
                    else lab_weights[batch.lab_idx]
                )
            else:
                w = jnp.ones_like(batch.values)
            loss = weighted_regression_loss(
                preds, batch.values, w, sup_mask,
                loss_type=self._loss_type, axis_name=self._axis_name,
            )
            return loss, new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, loss

    def _eval_step_impl(
        self, state: TrainState, graph: HeteroGraph, batch: SplitBatch
    ) -> Tuple[jax.Array, jax.Array]:
        graph = self._visible_graph(graph, None)
        variables = {"params": self._prepare_params(state.params)}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        preds = self.model.apply(
            variables,
            graph,
            batch.patient_idx,
            batch.lab_idx,
            train=False,
            method=self.model.predict_lab_values,
            patient_plan=batch.patient_plan,
            lab_plan=batch.lab_plan,
            degrees=batch.degrees,
        )
        loss = masked_mean_loss(
            preds, batch.values, batch.valid,
            loss_type=self._loss_type, axis_name=self._axis_name,
        )
        return loss, preds

    # -- public API ---------------------------------------------------------

    def _get_batch(self, split: str) -> SplitBatch:
        """Device batch for a split.  Subclasses re-place the arrays (e.g.
        GSPMDTrainer shards them over its mesh) WITHOUT mutating the shared
        masker — a masker instance may be reused across trainers."""
        return self._augment_batch(split, self.masker.get_split(split))

    def _augment_batch(self, split: str, base: SplitBatch) -> SplitBatch:
        """Attach the loop-invariant per-slot precomputes (degree gate, lab
        loss weights) ONCE per batch object.  Done here rather than in the
        masker so the gathers read this trainer's graph/weights, and cached
        on object identity so a masker that rebuilds a split re-augments."""
        if base.degrees is not None:
            return base
        cached = self._aug_batches.get(split)
        if cached is not None and cached[0] is base:
            return cached[1]
        aug = base.replace(
            degrees=jnp.take(self.graph.patient_lab_degree, base.patient_idx),
            sample_weights=jnp.take(self.lab_weights, base.lab_idx).astype(jnp.float32),
        )
        self._aug_batches[split] = (base, aug)
        return aug

    def train_epoch(self) -> float:
        if self.eval_only:
            raise RuntimeError("Trainer was built with eval_only=True; cannot train")
        batch = self._get_batch("train")
        sup_key = self.rngs.key_for("supervision", self.epoch)
        dropout_key = self.rngs.key_for("dropout", self.epoch)
        sup_mask = self._prepare_sup_mask(sup_key, batch)
        self.state, loss = self._train_step(
            self.state, self.graph, batch, self.lab_weights, sup_mask, dropout_key
        )
        return float(loss)

    def _prepare_sup_mask(self, key: jax.Array, batch: SplitBatch) -> jax.Array:
        """Draw the epoch's supervision mask over the *global* batch — shared
        by single-device and sharded trainers so their masks match exactly."""
        return self._draw_sup_mask(key, batch.valid)

    # -- fused multi-epoch stepping (lax.scan) -------------------------------

    def train_epochs_scanned(
        self, k: int, with_val: bool = False, as_numpy: bool = True
    ):
        """Run ``k`` epochs as ONE device dispatch via lax.scan.

        Per-epoch supervision/dropout keys are derived on-device from the
        same (seed, epoch) streams as ``train_epoch`` — losses match the
        epoch-at-a-time loop exactly.  Host-side LR/early-stopping control is
        *not* applied inside the scan, so use this for fixed-LR stretches
        (benchmarking, or fit() chunks between scheduler decisions).

        Returns (train_losses[k], val_losses[k] or None).  ``as_numpy=False``
        skips the host conversion — on a remote-attached device the readback
        is a blocking relay round-trip that serializes back-to-back chunk
        dispatches; pipelined callers (bench.py) convert only the last
        chunk's losses after ``block_until_ready``.
        """
        key = (int(k), bool(with_val))
        if not hasattr(self, "_scan_fns"):
            self._scan_fns = {}
        if key not in self._scan_fns:
            self._scan_fns[key] = self._make_scan_fn(k, with_val)
        batch = self._get_batch("train")
        vbatch = self._get_batch("val") if with_val else batch
        state, (tl, vl) = self._scan_fns[key](
            self.state,
            self.graph,
            batch,
            vbatch,
            self.lab_weights,
            self.rngs.stream("supervision"),
            self.rngs.stream("dropout"),
            jnp.asarray(self.epoch, jnp.int32),
        )
        self.state = state
        self.epoch += k
        if not as_numpy:
            return tl, (vl if with_val else None)
        tl = np.asarray(tl)
        return tl, (np.asarray(vl) if with_val else None)

    def _make_scan_fn(self, k: int, with_val: bool):
        mf = self._mask_fraction

        def scan_fn(state, graph, batch, vbatch, lab_weights, sup_stream, drop_stream, epoch0):
            def body(state, i):
                epoch = epoch0 + i
                sup_key = jax.random.fold_in(sup_stream, epoch)
                drop_key = jax.random.fold_in(drop_stream, epoch)
                if mf > 0:
                    draw = jax.random.bernoulli(sup_key, p=mf, shape=batch.valid.shape)
                    sup_mask = draw.astype(jnp.float32) * batch.valid
                else:
                    sup_mask = batch.valid
                state, loss = self._train_step_impl(
                    state, graph, batch, lab_weights, sup_mask, drop_key
                )
                vloss = (
                    self._eval_step_impl(state, graph, vbatch)[0]
                    if with_val
                    else jnp.zeros(())
                )
                return state, (loss, vloss)

            return jax.lax.scan(body, state, jnp.arange(k, dtype=jnp.int32))

        donate = (0,) if self.config.train.donate_state else ()
        return jax.jit(scan_fn, donate_argnums=donate)

    def validate(self, split: str = "val", state: Optional[TrainState] = None) -> float:
        loss, _ = self._eval_step(state or self.state, self.graph, self._get_batch(split))
        return float(loss)

    def predict(self, split: str, state: Optional[TrainState] = None) -> np.ndarray:
        """Unpadded predictions for a split, in split order (best for
        metrics).  Slot-major batches are inverted back to row order."""
        batch = self._get_batch(split)
        _, preds = self._eval_step(state or self.state, self.graph, batch)
        preds = np.asarray(preds)
        slots = self.masker.slot_map(split)
        if slots is not None:
            preds = preds[slots]
        return preds[: batch.num_valid]

    def predict_pairs(
        self,
        patient_idx: np.ndarray,
        lab_idx: np.ndarray,
        state: Optional[TrainState] = None,
        pad_multiple: int = 256,
    ) -> np.ndarray:
        """Predictions for arbitrary (patient, lab) pairs in one jitted call
        (padded to a bucket so repeat calls reuse the compilation)."""
        patient_idx = np.asarray(patient_idx, dtype=np.int32)
        lab_idx = np.asarray(lab_idx, dtype=np.int32)
        n = len(patient_idx)
        n_pad = max(pad_multiple, ((n + pad_multiple - 1) // pad_multiple) * pad_multiple)
        pad = n_pad - n
        batch = SplitBatch(
            patient_idx=jnp.asarray(np.concatenate([patient_idx, np.zeros(pad, np.int32)])),
            lab_idx=jnp.asarray(np.concatenate([lab_idx, np.zeros(pad, np.int32)])),
            values=jnp.zeros(n_pad, jnp.float32),
            valid=jnp.asarray(
                np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
            ),
            num_valid=n,
        )
        _, preds = self._eval_step(state or self.state, self.graph, batch)
        return np.asarray(preds)[:n]

    def _set_lr(self, lr: float) -> None:
        self.state.opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)

    def current_lr(self) -> float:
        return float(self.state.opt_state.hyperparams["learning_rate"])

    def fit(
        self,
        output_dir: Optional[str | Path] = None,
        resume_from: Optional[str | Path] = None,
        scan_chunk: int = 1,
    ) -> Dict:
        """Full training loop with early stopping (reference src/train.py:433-543).

        ``scan_chunk > 1`` runs that many epochs per device dispatch via
        lax.scan (with per-epoch validation computed inside the scan).  The
        plateau scheduler and early stopping then act at chunk granularity —
        LR changes and the stop decision take effect on chunk boundaries,
        and the best-state snapshot is the end-of-chunk state rather than
        the exact best epoch's.  Use 1 (default) for reference-exact
        semantics; larger chunks amortize dispatch latency on remote TPUs.
        """
        tc = self.config.train
        lc = self.config.logging
        output_dir = Path(output_dir) if output_dir is not None else None
        if output_dir is not None:
            output_dir.mkdir(parents=True, exist_ok=True)

        if resume_from == "auto":
            # crash/preemption recovery: continue from the newest periodic
            # checkpoint in output_dir, or start fresh if none exists yet
            resume_from = (
                self.latest_checkpoint(output_dir) if output_dir is not None else None
            )
            if resume_from is not None:
                logger.info("Auto-resume from %s", resume_from)
        if resume_from is not None:
            self.restore(resume_from)

        metrics_writer = None
        if output_dir is not None:
            from multi_modal_gnn_tpu.utils.profiling import MetricsWriter

            metrics_writer = MetricsWriter(output_dir / "metrics.jsonl")

        logger.info("Starting training: %d epochs (from epoch %d)", tc.epochs, self.epoch)
        t_start = time.perf_counter()
        epoch_times = []

        stop = False
        while self.epoch < tc.epochs and not stop:
            t0 = time.perf_counter()
            if scan_chunk > 1:
                k = min(scan_chunk, tc.epochs - self.epoch)
                train_losses, val_losses = self.train_epochs_scanned(k, with_val=True)
                chunk = list(zip(train_losses.tolist(), val_losses.tolist()))
            else:
                train_loss = self.train_epoch()
                val_loss = self.validate("val")
                self.epoch += 1
                chunk = [(train_loss, val_loss)]
            chunk_time = time.perf_counter() - t0
            epoch_times.extend([chunk_time / len(chunk)] * len(chunk))

            for train_loss, val_loss in chunk:
                new_lr = self.scheduler.step(val_loss)
                self.history["train_loss"].append(train_loss)
                self.history["val_loss"].append(val_loss)
                self.history["learning_rates"].append(new_lr)
            if abs(new_lr - self._lr) > 1e-12:
                logger.info("Epoch %d: reducing lr to %.2e", self.epoch, new_lr)
                self._set_lr(new_lr)
                self._lr = new_lr

            if self.epoch % max(lc.log_interval, 1) == 0 or len(chunk) > 1:
                logger.info(
                    "Epoch %3d | train %.4f | val %.4f | lr %.2e | %.3fs",
                    self.epoch, train_loss, val_loss, new_lr, epoch_times[-1],
                )
            if metrics_writer is not None:
                base_epoch = self.epoch - len(chunk)
                for i, (tl, vl) in enumerate(chunk):
                    metrics_writer.write(
                        base_epoch + i + 1,
                        train_loss=tl, val_loss=vl, lr=new_lr,
                        epoch_time_s=epoch_times[-1],
                    )

            improved = False
            for train_loss, val_loss in chunk:
                if val_loss < self.best_val_loss:
                    self.best_val_loss = val_loss
                    self.patience_counter = 0
                    improved = True
                else:
                    self.patience_counter += 1
                    if self.patience_counter >= tc.early_stopping_patience:
                        logger.info("Early stopping at epoch %d", self.epoch)
                        stop = True
                        break
            if improved:
                # deep copy: train-step donation would otherwise invalidate
                # the retained best-state buffers on the next epoch; with
                # scan_chunk > 1 this snapshot is the end-of-chunk state
                self.best_state = jax.tree_util.tree_map(lambda x: x.copy(), self.state)
                if output_dir is not None:
                    self._save(output_dir / "best_model.ckpt")

            if (
                output_dir is not None
                and lc.save_checkpoints
                and not stop
                and self.epoch % max(lc.checkpoint_interval, 1) == 0
            ):
                self._save(output_dir / f"checkpoint_epoch_{self.epoch}.ckpt")

        total_time = time.perf_counter() - t_start
        n_train = self.masker.split_sizes()["train"]
        self.history["total_time_s"] = total_time
        self.history["mean_epoch_time_s"] = float(np.mean(epoch_times)) if epoch_times else 0.0
        self.history["train_edges_per_sec"] = (
            n_train * len(epoch_times) / total_time if total_time > 0 else 0.0
        )
        logger.info(
            "Training done: %d epochs in %.1fs (%.0f train-edges/s)",
            len(self.history["train_loss"]), total_time, self.history["train_edges_per_sec"],
        )

        if metrics_writer is not None:
            metrics_writer.close()
        if output_dir is not None:
            save_json(
                {k: self.history[k] for k in ("train_loss", "val_loss", "learning_rates")},
                output_dir / "training_history.json",
            )
        return self.history

    # -- checkpoint / resume -------------------------------------------------

    def _checkpoint_payload(self) -> dict:
        return {
            "state": self.state,
            "best_state": self.best_state if self.best_state is not None else self.state,
        }

    def _host_metadata(self) -> dict:
        return {
            "epoch": self.epoch,
            "best_val_loss": self.best_val_loss,
            "patience_counter": self.patience_counter,
            "scheduler": dict(self.scheduler.__dict__),
            "history": {k: v for k, v in self.history.items() if isinstance(v, list)},
            "config_hash": self.config.content_hash(),
            "model_hash": self.config.model_hash(),
            "config": self.config.to_dict(),
        }

    @staticmethod
    def latest_checkpoint(output_dir) -> Optional[Path]:
        """Newest ``checkpoint_epoch_N.ckpt`` in ``output_dir`` by epoch
        number (None if the directory holds no periodic checkpoints).

        Multi-controller runs save the sharded format —
        ``checkpoint_epoch_N.ckpt.procMMM.npz`` with no ``.ckpt`` file
        itself — so the scan also derives base paths from proc files
        (load_checkpoint dispatches on them)."""
        candidates = {}
        for p in Path(output_dir).glob("checkpoint_epoch_*.ckpt"):
            stem = p.stem  # checkpoint_epoch_N
            try:
                candidates[int(stem.rsplit("_", 1)[1])] = p
            except ValueError:
                continue
        for p in Path(output_dir).glob("checkpoint_epoch_*.ckpt.proc*.npz"):
            base_name = p.name.split(".ckpt.proc")[0] + ".ckpt"
            try:
                epoch = int(base_name[: -len(".ckpt")].rsplit("_", 1)[1])
            except ValueError:
                continue
            candidates.setdefault(epoch, p.parent / base_name)
        if not candidates:
            return None
        return candidates[max(candidates)]

    def _save(self, path: Path) -> None:
        save_checkpoint(path, self._checkpoint_payload(), self._host_metadata())

    def load_best_model(self, output_dir: str | Path, force: bool = False) -> None:
        """Reload the best checkpoint from a training run's output directory
        (reference: src/train.py:546-561) and make it the active state."""
        self.restore(Path(output_dir) / "best_model.ckpt", force=force)
        self.best_state = self.state

    def restore(self, path: str | Path, force: bool = False) -> None:
        """True mid-training resume (state + scheduler + counters).

        Refuses to load a checkpoint whose ``model_hash`` (model + graph +
        feature-space sections, Config.model_hash) differs from the live
        config's — a mismatched model would fail late or silently skew.
        Run-length knobs like ``train.epochs`` may differ (train-longer is
        the canonical resume).  Pass ``force=True`` to override."""
        restored, meta = load_checkpoint(path, self._checkpoint_payload())
        ckpt_hash = meta.get("model_hash")
        live_hash = self.config.model_hash()
        if ckpt_hash and ckpt_hash != live_hash and not force:
            raise ValueError(
                f"Checkpoint {path} was trained with an incompatible config "
                f"(checkpoint model hash {ckpt_hash[:12]}.. != live {live_hash[:12]}..). "
                "Pass force=True (CLI: --force) to restore anyway."
            )
        self.state = restored["state"]
        self.best_state = restored["best_state"]
        self.epoch = int(meta.get("epoch", 0))
        self.best_val_loss = float(meta.get("best_val_loss", float("inf")))
        self.patience_counter = int(meta.get("patience_counter", 0))
        for k, v in (meta.get("scheduler") or {}).items():
            if hasattr(self.scheduler, k):
                setattr(self.scheduler, k, v)
        if hasattr(self.scheduler, "lr"):
            self._lr = float(self.scheduler.lr)
            self._set_lr(self._lr)
        for k, v in (meta.get("history") or {}).items():
            self.history[k] = list(v)
        logger.info("Resumed training at epoch %d (best val %.4f)", self.epoch, self.best_val_loss)




def train_pipeline(
    config: Config,
    bundle: GraphBundle,
    output_dir: str | Path,
    resume_from: Optional[str | Path] = None,
) -> Tuple[Trainer, Dict]:
    """End-to-end training stage (reference src/train.py:568-644): build the
    model, train with early stopping, evaluate the best state on the test
    split, and write training_history.json / test_results.json."""
    from multi_modal_gnn_tpu.utils.profiling import apply_debug_flags, maybe_init_wandb

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    apply_debug_flags(config)
    wandb_run = maybe_init_wandb(config)
    # HGT + pallas: attach the combined flash-attention layouts (no-op for
    # other architectures; graph/attn_plan.py)
    from multi_modal_gnn_tpu.graph.attn_plan import ensure_attn_plans

    bundle = ensure_attn_plans(bundle, config)
    graph = bundle.graph
    tc = config.train

    # THE config->masker factory: every entry point that must agree on the
    # split partition (train/evaluate/audit/run_pipeline) derives it here
    masker = masker_from_config(config, bundle)
    logger.info("Edge splits: %s", masker.split_sizes())

    # config-routed warm start (train.extras.warm_start: als | sideinfo):
    # plants the closed-form ALS (or dx/rx side-information) solution into
    # the embedding-bilinear channel before training — the measured quality
    # recipe (README "Results").  The channel the plant needs is auto-wired
    # into the model config here (it changes parameter shapes, which is what
    # opting in means).
    ws = str(tc.extras.get("warm_start", "") or "").lower()
    if ws in ("none", "off"):
        ws = ""
    ws_rank = int(tc.extras.get("warm_start_rank", 8) or 8)
    ws_mem_rank = int(tc.extras.get("warm_start_mem_rank", ws_rank) or ws_rank)
    if ws:
        if ws not in ("als", "sideinfo"):
            raise ValueError(
                f"unknown train.extras.warm_start={ws!r} (expected als | sideinfo)"
            )
        need = ws_rank + 1 + (ws_mem_rank if ws == "sideinfo" else 0)
        eh = config.model.edge_head
        have = int(eh.extras.get("bilinear_rank", 0))
        if have < need or eh.extras.get("bilinear_source") != "embedding":
            logger.info(
                "warm_start=%s: wiring edge_head bilinear channel "
                "(bilinear_rank %d -> %d, bilinear_source=embedding)",
                ws, have, max(have, need),
            )
            config = dataclasses.replace(
                config,
                model=dataclasses.replace(
                    config.model,
                    edge_head=dataclasses.replace(
                        eh,
                        extras={
                            **eh.extras,
                            "bilinear_rank": max(have, need),
                            "bilinear_source": "embedding",
                        },
                    ),
                ),
            )

    model = build_model(config, graph)
    # mini-batch (cluster-partitioned) training: explicit train.num_clusters,
    # or derived from the reference's batch_size knob (which the reference
    # itself never implemented — src/train.py trains full-batch regardless)
    n_clusters = max(int(tc.extras.get("num_clusters", 1) or 1), 1)
    if tc.batch_size:
        n_train = masker.split_sizes()["train"]
        n_clusters = max(n_clusters, -(-n_train // int(tc.batch_size)))
    # multi-device training from config: train.extras.parallel selects the
    # strategy (dp = 1-D shard_map; 2d = explicit data x patient-table-shard
    # shard_map; gspmd = 2-D mesh with XLA-placed collectives), sized by
    # train.num_devices (0 = all).  Framework addition — the reference is
    # single-device (SURVEY.md section 2.4).  host_edges rides along when the
    # Pallas path is on so each device gets its own windowed kernel plan.
    parallel = str(tc.extras.get("parallel", "") or "").lower()
    if parallel and parallel not in ("none", "off"):
        if n_clusters > 1 and parallel not in ("dp", "data"):
            raise ValueError(
                "mini-batch clustering (train.batch_size / "
                "train.extras.num_clusters) composes with "
                "train.extras.parallel: dp only (cluster-per-step DP, "
                "parallel/minibatch_dp.py); 2d/gspmd shard the patient "
                "table, which conflicts with the clusters' patient_id_base "
                "windows"
            )
        plan_edges = bundle.host_edges if config.model.use_pallas else None
        if n_clusters > 1:
            # beyond-HBM x multi-chip: every device steps the same cluster,
            # taking a 1/n shard of its edges (parallel/minibatch_dp.py);
            # train.extras.host_resident keeps cluster edges on the host
            from multi_modal_gnn_tpu.parallel.minibatch_dp import MiniBatchDPTrainer

            trainer = MiniBatchDPTrainer(
                bundle, masker, config, num_clusters=n_clusters,
                host_resident=bool(tc.extras.get("host_resident", False)),
            )
        elif parallel in ("dp", "data"):
            from multi_modal_gnn_tpu.parallel.dp import DataParallelTrainer

            trainer = DataParallelTrainer(graph, masker, config, host_edges=plan_edges)
        elif parallel in ("2d", "dp2d"):
            from multi_modal_gnn_tpu.parallel.dp2d import TwoDTrainer, make_2d_mesh

            mesh = make_2d_mesh(
                tc.num_devices, int(tc.extras.get("model_parallel", 2) or 2)
            )
            trainer = TwoDTrainer(graph, masker, config, mesh=mesh, host_edges=plan_edges)
        elif parallel == "gspmd":
            from multi_modal_gnn_tpu.parallel.gspmd import GSPMDTrainer, make_2d_mesh

            mesh = make_2d_mesh(
                tc.num_devices, int(tc.extras.get("model_parallel", 2) or 2)
            )
            trainer = GSPMDTrainer(graph, masker, config, mesh=mesh)
        else:
            raise ValueError(
                f"unknown train.extras.parallel={parallel!r} "
                "(expected dp | 2d | gspmd)"
            )
        logger.info("Parallel training (%s) over mesh %s",
                    parallel, dict(trainer.mesh.shape))
    elif n_clusters > 1:
        from multi_modal_gnn_tpu.training.minibatch import MiniBatchTrainer

        logger.info("Mini-batch training over %d patient clusters", n_clusters)
        trainer = MiniBatchTrainer(model, bundle, masker, config, num_clusters=n_clusters)
    else:
        trainer = Trainer(model, graph, masker, config)
    if ws:
        # composes with EVERY trainer, including the table-sharding
        # strategies (2d/gspmd): the plant re-places each leaf onto the old
        # state's sharding, so the row-sharded patient table and its adam
        # moments keep their placement (warmstart._plant_preserving_sharding,
        # round 5; parity pinned in tests/test_warmstart.py)
        from multi_modal_gnn_tpu.training.warmstart import (
            bundle_membership_matrix,
            warm_start_trainer,
        )

        memberships = bundle_membership_matrix(bundle) if ws == "sideinfo" else None
        ws_huber = tc.extras.get("warm_start_huber_delta", None)
        warm_start_trainer(
            trainer,
            rank=ws_rank,
            reg=float(tc.extras.get("warm_start_reg", 12.0)),
            memberships=memberships,
            mem_rank=ws_mem_rank,
            ridge_reg=float(tc.extras.get("warm_start_ridge_reg", 30.0)),
            huber_delta=float(ws_huber) if ws_huber is not None else None,
        )
    trainer.fit(
        output_dir=output_dir,
        resume_from=resume_from,
        scan_chunk=max(tc.scan_chunk, 1),
    )

    best = trainer.best_state if trainer.best_state is not None else trainer.state
    test_loss = trainer.validate("test", state=best)
    results = {
        "test_loss": test_loss,
        "best_val_loss": trainer.best_val_loss,
        "num_epochs": len(trainer.history["train_loss"]),
    }
    save_json(results, output_dir / "test_results.json")
    logger.info("Test loss (%s): %.4f", tc.loss, test_loss)
    if wandb_run is not None:
        wandb_run.log(results)
        wandb_run.finish()
    return trainer, results
