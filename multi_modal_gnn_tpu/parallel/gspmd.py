"""GSPMD trainer: 2-D (data x model) mesh with sharding annotations.

Complementary to the explicit shard_map DP trainer (parallel/dp.py): here we
only *place* arrays —

  * the patient ID-embedding table (the one table that grows with the
    cohort: 100k patients x 128 = 51 MB + 2x adam moments) sharded row-wise
    over the ``model`` axis,
  * edge arrays and the supervised batch sharded over ``data``,
  * everything else replicated —

and let XLA's SPMD partitioner insert the all-gathers / reduce-scatters.
The optimizer state inherits the parameter shardings automatically because
``tx.init`` runs under jit on the sharded parameters.  This is the
"pick a mesh, annotate, let XLA insert collectives" recipe; the shard_map
trainer is the explicit-collectives counterpart with hand-placed psums.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.graph.hetero import HeteroGraph
from multi_modal_gnn_tpu.graph.schema import PATIENT
from multi_modal_gnn_tpu.models.factory import build_model, init_model_variables
from multi_modal_gnn_tpu.parallel.sharding import batch_pspec, graph_pspecs
from multi_modal_gnn_tpu.training.masker import EdgeMasker
from multi_modal_gnn_tpu.training.trainer import Trainer
from multi_modal_gnn_tpu.utils.rng import RngSequence

logger = logging.getLogger(__name__)

# one canonical ("data", "model") mesh constructor, shared with the
# explicit 2-D shard_map trainer (parallel/mesh.make_2d_mesh)
from multi_modal_gnn_tpu.parallel.mesh import (  # noqa: E402,F401 — re-exported
    DATA_AXIS,
    MODEL_AXIS,
    make_2d_mesh,
)


def _param_pspec(path_parts, leaf) -> P:
    """Patient embedding rows over the model axis; everything else replicated."""
    path = "/".join(str(getattr(p, "key", p)) for p in path_parts)
    if f"embed_{PATIENT}" in path and leaf.ndim >= 1:
        return P(MODEL_AXIS)
    return P()


class GSPMDTrainer(Trainer):
    """Trainer whose arrays are mesh-placed; XLA partitions the jitted step."""

    # per-leaf optimizer state: the patient table's adam moments must
    # inherit its row sharding, which a flattened single vector cannot
    _flatten_optimizer = False

    def __init__(
        self,
        graph: HeteroGraph,
        masker: EdgeMasker,
        config: Config,
        mesh: Optional[Mesh] = None,
        rngs: Optional[RngSequence] = None,
    ):
        self.mesh = mesh if mesh is not None else make_2d_mesh()
        num_patients = graph.num_nodes(PATIENT)
        model_size = self.mesh.shape[MODEL_AXIS]
        if num_patients % model_size:
            raise ValueError(
                f"patient count {num_patients} not divisible by model axis {model_size}"
            )

        rngs = rngs or RngSequence(config.train.seed)
        model = build_model(config, graph)  # no axis_name: GSPMD inserts comms
        variables = init_model_variables(model, graph, rngs.next("init"))
        variables = dict(variables)
        variables["params"] = jax.tree_util.tree_map_with_path(
            lambda path, x: jax.device_put(
                x, NamedSharding(self.mesh, _param_pspec(path, x))
            ),
            variables["params"],
        )
        # replicate the remaining collections (batch_stats) on the mesh:
        # leaving them committed to one device makes any jit mixing them
        # with the 8-device params (e.g. a pre-fit validate, as the warm
        # start does) fail the committed-device check
        for coll in variables:
            if coll != "params":
                variables[coll] = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, NamedSharding(self.mesh, P())),
                    variables[coll],
                )

        graph = self._shard_graph(graph)
        super().__init__(model, graph, masker, config, variables=variables, rngs=rngs)
        logger.info(
            "GSPMD trainer: mesh %s, patient table sharded %d-way",
            dict(self.mesh.shape), model_size,
        )

    def _shard_graph(self, graph: HeteroGraph) -> HeteroGraph:
        specs = graph_pspecs(graph, DATA_AXIS)
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)), graph, specs
        )

    def _get_batch(self, split):
        """Split batches re-placed over the data axis (cached).  Overrides the
        Trainer hook instead of mutating the shared masker, so a masker reused
        across trainers is unaffected."""
        if not hasattr(self, "_sharded_batches"):
            self._sharded_batches = {}
        if split not in self._sharded_batches:
            batch = self._augment_batch(split, self.masker.get_split(split))
            spec = batch_pspec(batch, DATA_AXIS)
            self._sharded_batches[split] = jax.tree_util.tree_map(
                lambda x, s: (
                    jax.device_put(x, NamedSharding(self.mesh, s))
                    if hasattr(x, "shape")
                    else x
                ),
                batch,
                spec,
            )
        return self._sharded_batches[split]
