"""Compute primitives: gather + segment reductions for message passing.

Two interchangeable backends for the hot neighbor-aggregation op:
  * ``xla``   — jnp.take + sorted segment_sum (ops/segment.py); XLA fuses the
    gather into the reduction and this is the correctness anchor;
  * ``pallas``— fused CSR gather/segment kernel (ops/pallas_segment.py).
"""

from multi_modal_gnn_tpu.ops.segment import (  # noqa: F401
    aggregate_neighbors,
    segment_mean,
    segment_softmax,
    segment_sum,
)
