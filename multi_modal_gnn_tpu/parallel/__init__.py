"""Multi-chip scaling via jax.sharding + shard_map.

The reference has no distributed code at all (SURVEY.md section 2.4) — this
subsystem is the TPU-native scaling layer designed from scratch:

  * a 1-D ``data`` mesh over TPU chips;
  * every relation's edge arrays sharded along the edge axis (contiguous
    chunks of the dst-sorted order, so per-shard sortedness is preserved);
  * node embeddings/parameters replicated; each device computes partial
    per-destination segment sums over its edge shard and one ``psum`` per
    relation per layer combines them over ICI;
  * the supervised edge batch is sharded the same way, and the loss /
    gradients reduce with a final psum — gradients come out replicated, so
    the optimizer step is identical on every chip (no parameter server).
"""

from multi_modal_gnn_tpu.parallel.mesh import make_mesh  # noqa: F401
from multi_modal_gnn_tpu.parallel.dp2d import TwoDTrainer  # noqa: F401
from multi_modal_gnn_tpu.parallel.sharding import (  # noqa: F401
    attach_shard_plans,
    batch_pspec,
    graph_pspecs,
    shard_batch,
    shard_graph,
)
from multi_modal_gnn_tpu.parallel.dp import DataParallelTrainer  # noqa: F401
from multi_modal_gnn_tpu.parallel.gspmd import GSPMDTrainer, make_2d_mesh  # noqa: F401
