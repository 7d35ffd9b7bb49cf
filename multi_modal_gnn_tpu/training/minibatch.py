"""Cluster-partitioned mini-batch training (beyond reference parity).

The reference is full-batch only — its ``batch_size`` config knob is
unimplemented (src/train.py:214-260 trains the whole graph every epoch).
This module adds a TPU-native mini-batch mode for models/graphs whose
*activations* exceed HBM: every relation in this schema is patient-centric
(patient-lab / patient-diagnosis / patient-medication and their reverses),
so a partition of the PATIENTS induces an exact, loss-free partition of the
EDGES — the Cluster-GCN recipe without Cluster-GCN's dropped cross-cluster
edges.  Design:

  * patients are split into ``num_clusters`` contiguous, window-aligned,
    equal-size index ranges (static shapes; one compiled step per cluster
    shape).  Combined with ``graph.cluster_patients_by_degree`` the ranges
    are also degree-homogeneous;
  * each cluster's subgraph keeps the full (small) lab/dx/rx node spaces and
    only its own patients: per-step activation memory drops by ~K;
  * ONE global patient embedding table (and optimizer state) serves every
    cluster — the subgraph carries ``patient_id_base`` and the model's
    encode path reads the local window (models/rgcn.py encode_nodes);
  * per epoch the clusters are visited in a seeded random permutation; the
    supervision mask is drawn per (epoch, cluster) from the same RngSequence
    streams as full-batch training (bit-reproducible);
  * evaluation runs per cluster and reassembles predictions into split
    order, so metrics are computed exactly as in full-batch mode.

Semantics vs full-batch: within a step, lab/diagnosis/medication node
embeddings aggregate only from the cluster's patients (the standard
Cluster-GCN approximation); with ``num_clusters=1`` training is equivalent
to the full-batch Trainer.  ``value_context`` models are supported: each
cluster's patient->lab EdgeSet carries its own visibility template
(train-edge positions mapped into the cluster-local edge array — valid
because the global device order is dst-sorted and the local stable re-sort
of a dst-sorted subsequence is the identity), and train batches carry
``SplitBatch.vis_positions`` so the per-epoch supervision knockout lands on
the correct local rows.  The observed-value channel then conditions on the
cluster's own patients' train observations — the same locality
approximation the message passing already makes.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.graph.build import GraphBundle
from multi_modal_gnn_tpu.graph.hetero import WINDOW, HeteroGraph, pad_edge_set
from multi_modal_gnn_tpu.graph.schema import (
    LAB,
    PATIENT,
    PATIENT_LAB,
    mirror_edge_type,
    reverse_edge_type,
)
from multi_modal_gnn_tpu.graph.hetero import _round_up
from multi_modal_gnn_tpu.training.masker import EdgeMasker, SplitBatch, _pad_batch
from multi_modal_gnn_tpu.training.trainer import Trainer


@dataclasses.dataclass
class ClusterData:
    """Host-side product of the partition: K subgraphs + per-split batches."""

    subgraphs: List[HeteroGraph]
    bases: List[int]
    local_size: int
    # split -> per-cluster (batch or None, original-split-row positions)
    batches: Dict[str, List[Tuple[Optional[SplitBatch], Optional[np.ndarray]]]]

    def cluster_of(self, patient_idx: np.ndarray) -> np.ndarray:
        """Cluster id of each (global) patient index — boundaries may be
        non-uniform under edge-balanced partitioning."""
        return (
            np.searchsorted(np.asarray(self.bases), patient_idx, side="right") - 1
        ).astype(np.int64)


def _cluster_bases(
    num_p: int, num_clusters: int, edge_weight: Optional[np.ndarray]
) -> List[int]:
    """WINDOW-aligned cluster base indices.

    ``edge_weight`` (per-patient total forward-edge count) selects
    EDGE-BALANCED boundaries: contiguous patient ranges with ~equal edge
    loads.  This matters because ``graph.cluster_patients_by_degree``
    sorts patients by ASCENDING degree, so equal-PATIENT ranges put a
    multiple of the average edge load into the last cluster — and since
    every cluster's edge arrays are padded to the LARGEST cluster (shared
    static shapes), the whole partition inherits that cluster's size.
    Measured consequence: HGT at the scale config OOM'd at 24
    equal-patient clusters (70 GB compile-time HBM demand) and fits
    comfortably edge-balanced.  ``edge_weight=None`` -> equal patient
    ranges (the pre-round-4 behavior, ``balance="patients"``)."""
    max_clusters = -(-num_p // WINDOW)
    if num_clusters > max_clusters:
        # more clusters than WINDOW-aligned patient ranges: the cuts would
        # clamp to num_p, silently emitting duplicate/empty clusters that
        # also violate the documented WINDOW alignment
        raise ValueError(
            f"num_clusters={num_clusters} exceeds ceil(num_patients/WINDOW)="
            f"{max_clusters} ({num_p} patients, window {WINDOW}); "
            f"use at most {max_clusters} clusters"
        )
    if edge_weight is None:
        size = _round_up(-(-num_p // num_clusters), WINDOW)
        return [k * size for k in range(num_clusters)]
    cum = np.concatenate([[0.0], np.cumsum(edge_weight, dtype=np.float64)])
    targets = np.arange(1, num_clusters) * (cum[-1] / num_clusters)
    cuts = np.searchsorted(cum, targets, side="left")
    cuts = np.round(cuts / WINDOW).astype(np.int64) * WINDOW
    bases = [0]
    for c in cuts:
        c = int(min(max(c, bases[-1] + WINDOW), num_p))
        if c <= bases[-1]:
            c = bases[-1] + WINDOW  # degenerate weights: keep ranges nonempty
        bases.append(min(c, num_p))
    return bases[:num_clusters]




def build_patient_clusters(
    bundle: GraphBundle,
    masker: EdgeMasker,
    config: Config,
    num_clusters: int,
    lab_weights: Optional[np.ndarray] = None,
    host_resident: bool = False,
    value_context: bool = False,
    balance: str = "edges",
) -> ClusterData:
    """Partition the graph into ``num_clusters`` patient-range subgraphs.

    All clusters share identical static shapes (edge arrays padded to the
    max cluster size per relation), so one compiled train step serves every
    cluster.  Patient indices past the cluster's own range (up to the
    shared ``local_size``) are edge-free and clamp in the embedding lookup.

    ``balance="edges"`` (default, round 4) picks cluster boundaries so
    edge loads are ~equal (see ``_cluster_bases`` — under the degree-sorted
    patient layout, equal-PATIENT ranges concentrate edges in the last
    cluster and every cluster pays its padding); ``"patients"`` restores
    equal patient ranges.

    ``host_resident``: keep every cluster's edge arrays as numpy — jit
    transfers the in-flight cluster per step, so device memory holds ONE
    cluster's graph (plus the global node tables) instead of all K.  This is
    the mode for edge sets that exceed HBM; the transfer overlaps with the
    previous step's compute under JAX's async dispatch.
    """
    graph = bundle.graph
    counts = graph.node_count_map
    num_p = counts[PATIENT]

    if not bundle.host_edges:
        raise ValueError("bundle.host_edges required for cluster partitioning")
    if balance not in ("edges", "patients"):
        raise ValueError(f"balance must be 'edges' or 'patients', got {balance!r}")

    edge_weight = None
    if balance == "edges":
        edge_weight = np.zeros(num_p, dtype=np.int64)
        for et, (src, _dst, _val) in bundle.host_edges.items():
            if et[0] == PATIENT:
                edge_weight += np.bincount(np.asarray(src), minlength=num_p)
    bases = _cluster_bases(num_p, num_clusters, edge_weight)
    bases_arr = np.asarray(bases)
    range_ends = np.concatenate([bases_arr[1:], [num_p]])
    size = _round_up(int((range_ends - bases_arr).max()), WINDOW)

    # ---- per-relation cluster edge lists (patient is src of every forward
    # relation) + shared padded sizes ---------------------------------------
    per_rel: Dict = {}
    for et, (src, dst, val) in bundle.host_edges.items():
        if et[0] != PATIENT:
            # loaded bundles (graph/serialize.py) carry host arrays for the
            # reverse relations too — they are rebuilt from the forward ones
            # below, so skip mirrors and only reject true non-patient edges
            if mirror_edge_type(et) in bundle.host_edges:
                continue
            raise ValueError(f"non-patient-centric relation {et} cannot be clustered")
        cid = np.searchsorted(bases_arr, np.asarray(src), side="right") - 1
        rows = [np.nonzero(cid == k)[0] for k in range(num_clusters)]
        pad_to = _round_up(max((len(r) for r in rows), default=0), 1024)
        per_rel[et] = (src, dst, val, rows, pad_to)

    # global device-order positions of the train split's edges — the key for
    # cluster-local visibility templates (value_context)
    train_pos_global = (
        masker.split_edge_positions("train") if value_context else None
    )

    dense_budget = config.graph.dense_adjacency_max_bytes
    subgraphs: List[HeteroGraph] = []
    host_degrees: List[np.ndarray] = []  # per-cluster degree, host copy (no device readback later)
    for k in range(num_clusters):
        base = bases[k]
        edges = {}
        for et, (src, dst, val, rows, pad_to) in per_rel.items():
            r = rows[k]
            s_loc = (np.asarray(src)[r] - base).astype(np.int32)
            d = np.asarray(dst)[r].astype(np.int32)
            v = None if val is None else np.asarray(val)[r]
            d_count = counts[et[2]]
            edges[et] = pad_edge_set(
                s_loc, d, num_src=size, num_dst=d_count, val=v,
                pad_multiple=pad_to, dense_max_bytes=dense_budget,
                as_numpy=host_resident,
            )
            if value_context and et == PATIENT_LAB:
                # cluster-local visibility base: 1.0 where the local edge is
                # a TRAIN edge.  r is sorted global device order, so the
                # local (stable dst re-sort) position of r[i] is i.
                vis = np.isin(r, train_pos_global, assume_unique=True).astype(
                    np.float32
                )
                vis_pad = np.zeros(edges[et].mask.shape[0], np.float32)
                vis_pad[: len(vis)] = vis
                edges[et] = edges[et].replace(
                    val_vis=vis_pad if host_resident else jnp.asarray(vis_pad)
                )
            edges[reverse_edge_type(et)] = pad_edge_set(
                d, s_loc, num_src=d_count, num_dst=size, val=None,
                pad_multiple=pad_to, dense_max_bytes=dense_budget,
                as_numpy=host_resident,
            )
        pl_rows = per_rel[PATIENT_LAB][3][k]
        pl_src_loc = np.asarray(per_rel[PATIENT_LAB][0])[pl_rows] - base
        degree = np.bincount(pl_src_loc, minlength=size).astype(np.int32)
        host_degrees.append(degree)
        node_counts = dict(counts)
        node_counts[PATIENT] = size
        arr = (lambda x, dt=None: np.asarray(x, dt)) if host_resident else (
            lambda x, dt=None: jnp.asarray(x, dt)
        )
        subgraphs.append(
            HeteroGraph(
                edges=edges,
                patient_lab_degree=arr(degree),
                patient_id_base=arr(base, np.int32 if host_resident else jnp.int32),
                node_counts=tuple(sorted(node_counts.items())),
            )
        )

    # ---- per-split, per-cluster supervised batches -------------------------
    pl_rows_all = per_rel[PATIENT_LAB][3]
    batches: Dict[str, List[Tuple[Optional[SplitBatch], Optional[np.ndarray]]]] = {}
    for split in masker.split_sizes():  # train/val/test (+ "cal" if carved)
        p, l, v = masker.split_arrays(split)
        split_pos_global = (
            masker.split_edge_positions(split)
            if value_context and split == "train"
            else None
        )
        cid = np.searchsorted(bases_arr, np.asarray(p), side="right") - 1
        pad_to = _round_up(
            max((int((cid == k).sum()) for k in range(num_clusters)), default=0), 256
        )
        split_list = []
        for k in range(num_clusters):
            pos = np.nonzero(cid == k)[0]
            if len(pos) == 0:
                split_list.append((None, None))
                continue
            batch, _ = _pad_batch(
                (p[pos] - bases[k]).astype(np.int32),
                l[pos].astype(np.int32),
                v[pos].astype(np.float32),
                pad_multiple=pad_to,
                num_patients=size,
                num_labs=counts[LAB],
            )
            # host-side padded index copies (zero padding, same as
            # _pad_batch without slot_major) — indexing host_degrees /
            # lab_weights with the DEVICE batch arrays would be a
            # device->host readback per cluster per split (CLAUDE.md:
            # host code must not read device arrays back)
            pad_len = batch.valid.shape[0]
            p_host = np.zeros(pad_len, np.int32)
            p_host[: len(pos)] = (p[pos] - bases[k]).astype(np.int32)
            l_host = np.zeros(pad_len, np.int32)
            l_host[: len(pos)] = l[pos].astype(np.int32)
            deg = host_degrees[k][p_host]
            sw = (
                None
                if lab_weights is None
                else np.asarray(lab_weights)[l_host].astype(np.float32)
            )
            vis_pos = None
            if split_pos_global is not None:
                # local edge-array position of each supervised row: rank of
                # its global position within the cluster's (sorted) rows
                lp = np.searchsorted(pl_rows_all[k], split_pos_global[pos])
                vp = np.zeros(batch.valid.shape[0], np.int32)
                vp[: len(lp)] = lp.astype(np.int32)
                vis_pos = jnp.asarray(vp)
            batch = batch.replace(
                degrees=jnp.asarray(deg),
                sample_weights=None if sw is None else jnp.asarray(sw),
                vis_positions=vis_pos,
            )
            split_list.append((batch, pos))
        batches[split] = split_list

    return ClusterData(
        subgraphs=subgraphs, bases=bases, local_size=size, batches=batches
    )


class MiniBatchTrainer(Trainer):
    """Trainer that steps one patient cluster at a time.

    Drop-in for :class:`Trainer` on memory-bound graphs; reuses its compiled
    train/eval steps (the subgraph is an ordinary step argument).  See the
    module docstring for semantics.
    """

    def __init__(
        self,
        model,
        bundle: GraphBundle,
        masker: EdgeMasker,
        config: Config,
        num_clusters: int,
        host_resident: bool = False,
        balance: Optional[str] = None,
        **kw,
    ):
        if num_clusters < 1:
            raise ValueError("num_clusters must be >= 1")
        if num_clusters > 1 and not getattr(model, "supports_patient_id_base", False):
            # cluster subgraphs use LOCAL patient indices resolved through
            # HeteroGraph.patient_id_base (encode_nodes in rgcn.py/hgt.py);
            # a model without that support would silently read cluster-0's
            # embedding rows for every cluster
            raise NotImplementedError(
                f"mini-batch cluster training requires patient_id_base "
                f"support; {type(model).__name__} reads the global patient "
                "table"
            )
        # cap at the WINDOW-aligned range count: a config-routed batch_size
        # on a small graph can ask for more clusters than 128-patient
        # windows exist, which _cluster_bases rejects as degenerate
        max_clusters = -(-bundle.graph.node_count_map[PATIENT] // WINDOW)
        if num_clusters > max_clusters:
            logging.getLogger(__name__).warning(
                "Requested %d clusters but only %d WINDOW-aligned patient "
                "ranges exist; clamping", num_clusters, max_clusters,
            )
            num_clusters = max_clusters
        self.num_clusters = num_clusters
        self.host_resident = host_resident
        # train.extras.cluster_balance: edges (default) | patients
        self.cluster_balance = str(
            balance
            or config.train.extras.get("cluster_balance", "edges")
            or "edges"
        )
        self._bundle = bundle
        self._cluster_data: Optional[ClusterData] = None
        super().__init__(model, bundle.graph, masker, config, **kw)

    def _ensure_clusters(self) -> ClusterData:
        if self._cluster_data is None:
            self._cluster_data = build_patient_clusters(
                self._bundle, self.masker, self.config, self.num_clusters,
                lab_weights=self.host_lab_weights,
                host_resident=self.host_resident,
                value_context=self._value_context,
                balance=self.cluster_balance,
            )
        return self._cluster_data

    # -- training ------------------------------------------------------------

    def train_epoch(self) -> float:
        if self.eval_only:
            raise RuntimeError("Trainer was built with eval_only=True; cannot train")
        cd = self._ensure_clusters()
        perm = np.asarray(
            jax.random.permutation(
                self.rngs.key_for("cluster_order", self.epoch), self.num_clusters
            )
        )
        sup_key = self.rngs.key_for("supervision", self.epoch)
        drop_key = self.rngs.key_for("dropout", self.epoch)
        tot = None
        n = 0
        for k in perm:
            batch, _ = cd.batches["train"][int(k)]
            if batch is None:
                continue
            sup = self._draw_sup_mask(
                jax.random.fold_in(sup_key, int(k)), batch.valid
            )
            self.state, loss = self._train_step(
                self.state, cd.subgraphs[int(k)], batch, self.lab_weights,
                sup, jax.random.fold_in(drop_key, int(k)),
            )
            # accumulate ON DEVICE: a float(loss) here would block on each
            # cluster's dispatch (one relay round-trip per cluster) and
            # defeat the async host->device overlap of host_resident mode
            contrib = loss * batch.num_valid
            tot = contrib if tot is None else tot + contrib
            n += batch.num_valid
        return float(tot) / max(n, 1) if tot is not None else 0.0

    def train_epochs_scanned(
        self, k: int, with_val: bool = False, as_numpy: bool = True
    ):
        # cluster stepping is already one dispatch per cluster; the scan
        # fusion of the full-batch path does not apply
        tl = []
        vl = []
        for _ in range(k):
            tl.append(self.train_epoch())
            if with_val:
                vl.append(self.validate("val"))
            self.epoch += 1
        return np.asarray(tl), (np.asarray(vl) if with_val else None)

    # -- evaluation ----------------------------------------------------------

    def validate(self, split: str = "val", state=None) -> float:
        cd = self._ensure_clusters()
        tot = 0.0
        n = 0
        for k in range(self.num_clusters):
            batch, _ = cd.batches[split][k]
            if batch is None:
                continue
            loss, _ = self._eval_step(state or self.state, cd.subgraphs[k], batch)
            tot += float(loss) * batch.num_valid
            n += batch.num_valid
        return tot / max(n, 1)

    def predict(self, split: str, state=None) -> np.ndarray:
        cd = self._ensure_clusters()
        p, _, _ = self.masker.split_arrays(split)
        out = np.zeros(len(p), dtype=np.float32)
        for k in range(self.num_clusters):
            batch, pos = cd.batches[split][k]
            if batch is None:
                continue
            _, preds = self._eval_step(state or self.state, cd.subgraphs[k], batch)
            out[pos] = np.asarray(preds)[: batch.num_valid]
        return out
