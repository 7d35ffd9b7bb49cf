"""multi_modal_gnn_tpu — TPU-native EHR heterogeneous-graph imputation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
AdalineL/Multi-Modal-GNN reference pipeline (PyTorch + PyTorch-Geometric,
see /root/reference): eICU / MIMIC-III ingest, heterogeneous
patient/lab/diagnosis/medication graph construction, relational GNN training
with mask-and-recover edge supervision, and winsorized stratified evaluation.

Design (TPU-first, not a port):
  * graphs are frozen pytrees of padded, destination-sorted COO/CSR device
    arrays with static shapes (graph/hetero.py) — no PyG HeteroData;
  * message passing is gather + sorted segment-sum lowered by XLA, with a
    fused Pallas gather/segment kernel for the hot path (ops/);
  * the whole training step (embeddings -> patient MLP -> 2x hetero SAGE ->
    dual-head edge regression -> weighted masked loss -> adam update) is one
    jitted, donated function (training/trainer.py);
  * scaling is jax.sharding/shard_map data parallelism over edges with psum
    gradient reduction (parallel/), not a distributed-backend translation.
"""

__version__ = "0.1.0"

from multi_modal_gnn_tpu.config import Config, load_config  # noqa: F401
