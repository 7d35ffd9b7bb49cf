"""Vectorized heterogeneous graph construction.

Builds the patient/lab/diagnosis/medication graph from preprocessed tables.
Functional parity with the reference builder (src/graph_build.py:104-289) but
edge assembly is pure numpy/pandas vector ops emitting padded, dst-sorted
COO/CSR arrays directly — the reference iterates ``DataFrame.iterrows()`` per
edge (src/graph_build.py:499-586), which is its dominant build cost.

Expected input columns (the preprocess stage contract, SURVEY.md section 2.3):
  * labs:        SUBJECT_ID, ITEMID, VALUE, VALUE_NORMALIZED
  * diagnoses:   SUBJECT_ID, ICD3_CODE
  * medications: SUBJECT_ID, DRUG
  * cohort:      SUBJECT_ID (+ demographics)
  * labitems:    ITEMID, LABEL
"""

from __future__ import annotations

import dataclasses
import logging
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Optional

import numpy as np
import pandas as pd

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.graph.hetero import (
    EdgeSet,
    HeteroGraph,
    pad_edge_set,
)
from multi_modal_gnn_tpu.graph.indexer import NodeIndexer
from multi_modal_gnn_tpu.graph.schema import (
    DIAGNOSIS,
    LAB,
    MEDICATION,
    PATIENT,
    PATIENT_DIAGNOSIS,
    PATIENT_LAB,
    PATIENT_MEDICATION,
    EdgeTypeKey,
    reverse_edge_type,
)

logger = logging.getLogger(__name__)


@dataclass
class GraphMeta:
    """Host-side metadata that travels with a graph artifact (not traced)."""

    indexers: Dict[str, NodeIndexer] = field(default_factory=dict)
    lab_names: Dict[int, str] = field(default_factory=dict)
    # per-lab-index denormalization stats: {lab_idx: {"mean": m, "std": s}}
    lab_stats: Dict[int, Dict[str, float]] = field(default_factory=dict)
    config: Optional[dict] = None
    config_hash: Optional[str] = None

    def to_dict(self) -> dict:
        return {
            "indexers": {k: v.to_dict() for k, v in self.indexers.items()},
            "lab_names": {str(k): v for k, v in self.lab_names.items()},
            "lab_stats": {str(k): v for k, v in self.lab_stats.items()},
            "config": self.config,
            "config_hash": self.config_hash,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "GraphMeta":
        return cls(
            indexers={k: NodeIndexer.from_dict(v) for k, v in d.get("indexers", {}).items()},
            lab_names={int(k): v for k, v in d.get("lab_names", {}).items()},
            lab_stats={int(k): v for k, v in d.get("lab_stats", {}).items()},
            config=d.get("config"),
            config_hash=d.get("config_hash"),
        )


@dataclass
class GraphBundle:
    """A device graph plus its host metadata — the unit of serialization.

    ``host_edges`` keeps numpy copies of each relation's valid (src, dst,
    val) so downstream host-side consumers (EdgeMasker split derivation,
    metrics) never read back from device memory — device->host transfers
    over a remote-TPU link are the single most expensive data movement in
    the pipeline.
    """

    graph: HeteroGraph
    meta: GraphMeta
    host_edges: Optional[Dict] = None

    def replace_graph(self, graph: HeteroGraph) -> "GraphBundle":
        return dataclasses.replace(self, graph=graph)

    def patient_lab_host(self):
        """(src, dst, val) numpy arrays of the valid patient->lab edges."""
        from multi_modal_gnn_tpu.graph.schema import PATIENT_LAB

        if self.host_edges and PATIENT_LAB in self.host_edges:
            return self.host_edges[PATIENT_LAB]
        return None


def _map_edges(
    df: pd.DataFrame,
    src_col: str,
    dst_col: str,
    src_indexer: NodeIndexer,
    dst_indexer: NodeIndexer,
    val_col: Optional[str] = None,
):
    """Vectorized ID->index mapping; rows with unknown IDs are dropped."""
    src_idx = src_indexer.lookup_many(df[src_col].to_numpy())
    dst_idx = dst_indexer.lookup_many(df[dst_col].to_numpy())
    keep = (src_idx >= 0) & (dst_idx >= 0)
    vals = None
    if val_col is not None:
        vals = df[val_col].to_numpy(dtype=np.float32)[keep]
    n_dropped = int((~keep).sum())
    if n_dropped:
        logger.warning("Dropped %d edges with unmapped endpoints", n_dropped)
    return src_idx[keep], dst_idx[keep], vals


def build_heterogeneous_graph(
    labs: pd.DataFrame,
    diagnoses: pd.DataFrame,
    medications: pd.DataFrame,
    cohort: pd.DataFrame,
    labitems: Optional[pd.DataFrame],
    config: Config,
) -> GraphBundle:
    """Assemble the 4-node-type / 6-relation graph from preprocessed tables."""
    pad = config.graph.edge_pad_multiple

    # ---- node index spaces (first-seen order, like the reference) --------
    indexers = {
        PATIENT: NodeIndexer(PATIENT),
        LAB: NodeIndexer(LAB),
        DIAGNOSIS: NodeIndexer(DIAGNOSIS),
        MEDICATION: NodeIndexer(MEDICATION),
    }
    if config.graph.cluster_patients_by_degree and len(cohort):
        # ascending-lab-degree patient indexing: a pure layout choice (node
        # indices are internal; every artifact keys on entity IDs) that
        # clusters the gate's low-degree patients into the leading windows,
        # so degree-predicated head tiles skip almost everything the gate
        # discards (models/rgcn.py predict_lab_values).  Stable sort keeps
        # determinism; ties preserve first-seen (reference) order.
        deg = labs["SUBJECT_ID"].value_counts()
        key = cohort["SUBJECT_ID"].map(deg).fillna(0).to_numpy()
        cohort = cohort.iloc[np.argsort(key, kind="stable")]
    indexers[PATIENT].add_many(cohort["SUBJECT_ID"].to_numpy())
    if config.graph.cluster_labs_by_frequency and len(labs):
        # same layout trick for LABS: index by DESCENDING edge frequency so
        # the popular labs share the leading 128-row table blocks — with
        # slots lab-sorted per window (graph/hetero.py slot-major regroup)
        # most kernel tiles then address one narrow lab block instead of the
        # whole table.  Pure relabeling, like the patient ordering above.
        freq = labs["ITEMID"].value_counts()  # sorted descending by count
        indexers[LAB].add_many(freq.index.to_numpy())
    indexers[LAB].add_many(labs["ITEMID"].to_numpy())
    if len(diagnoses):
        indexers[DIAGNOSIS].add_many(diagnoses["ICD3_CODE"].to_numpy())
    if len(medications):
        indexers[MEDICATION].add_many(medications["DRUG"].to_numpy())

    counts = {name: len(ix) for name, ix in indexers.items()}
    logger.info("Node counts: %s", counts)

    # ---- forward edges (vectorized) --------------------------------------
    edge_arrays: Dict[EdgeTypeKey, tuple] = {}

    lab_src, lab_dst, lab_val = _map_edges(
        labs, "SUBJECT_ID", "ITEMID", indexers[PATIENT], indexers[LAB], "VALUE_NORMALIZED"
    )
    edge_arrays[PATIENT_LAB] = (lab_src, lab_dst, lab_val)

    if len(diagnoses):
        dx_src, dx_dst, _ = _map_edges(
            diagnoses, "SUBJECT_ID", "ICD3_CODE", indexers[PATIENT], indexers[DIAGNOSIS]
        )
    else:
        dx_src = dx_dst = np.zeros(0, dtype=np.int32)
    edge_arrays[PATIENT_DIAGNOSIS] = (dx_src, dx_dst, None)

    if len(medications):
        rx_src, rx_dst, _ = _map_edges(
            medications, "SUBJECT_ID", "DRUG", indexers[PATIENT], indexers[MEDICATION]
        )
    else:
        rx_src = rx_dst = np.zeros(0, dtype=np.int32)
    edge_arrays[PATIENT_MEDICATION] = (rx_src, rx_dst, None)

    # honor EdgeTypeConfig.enabled (reference gates relation construction on
    # it, src/graph_build.py:212-239): disabled relations are never built,
    # and node types that end up with no relations are dropped below
    from multi_modal_gnn_tpu.graph.schema import CONFIG_EDGE_NAMES

    for name, et in CONFIG_EDGE_NAMES.items():
        etc = config.graph.edge_types.get(name)
        if etc is not None and not etc.enabled:
            if et == PATIENT_LAB:
                raise ValueError(
                    "graph.edge_types.patient_lab.enabled=false: the patient-lab "
                    "relation carries the supervision targets and cannot be disabled"
                )
            logger.info("Relation %s disabled by config", name)
            edge_arrays.pop(et, None)
    connected = {t for et in edge_arrays for t in (et[0], et[2])}
    for name in list(counts):
        if name not in connected:
            counts[name] = 0

    # empty modalities are dropped entirely: a zero-node type has no
    # embedding table and no relations (matches the reference, where absent
    # tables simply never enter the HeteroData metadata)
    empty = {name for name, n in counts.items() if n == 0}
    if empty:
        logger.info("Dropping empty node types: %s", sorted(empty))
        counts = {k: v for k, v in counts.items() if v > 0}
        edge_arrays = {
            et: arrs for et, arrs in edge_arrays.items()
            if et[0] in counts and et[2] in counts
        }

    # ---- pad + sort + CSR, forward and reverse ---------------------------
    host_edges: Dict[EdgeTypeKey, tuple] = {}
    graph = assemble_graph(
        edge_arrays, counts, pad_multiple=pad, config=config, host_edges_out=host_edges
    )

    # ---- metadata --------------------------------------------------------
    lab_names: Dict[int, str] = {}
    if labitems is not None and len(labitems):
        label_by_item = dict(
            zip(labitems["ITEMID"].to_numpy(), labitems["LABEL"].astype(str).to_numpy())
        )
        for item_id, idx in indexers[LAB].id_to_index.items():
            lab_names[idx] = str(label_by_item.get(item_id, f"Lab_{idx}"))
    else:
        lab_names = {i: f"Lab_{i}" for i in range(counts[LAB])}

    # raw-value stats per lab index for inference-time denormalization
    lab_stats: Dict[int, Dict[str, float]] = {}
    if "VALUE" in labs.columns:
        raw_idx = indexers[LAB].lookup_many(labs["ITEMID"].to_numpy())
        raw_df = pd.DataFrame({"lab_idx": raw_idx, "value": labs["VALUE"].to_numpy()})
        agg = raw_df.groupby("lab_idx")["value"].agg(["mean", "std"]).fillna(0.0)
        lab_stats = {
            int(i): {"mean": float(r["mean"]), "std": float(r["std"])}
            for i, r in agg.iterrows()
        }

    meta = GraphMeta(
        indexers=indexers,
        lab_names=lab_names,
        lab_stats=lab_stats,
        config=config.to_dict(),
        config_hash=config.content_hash(),
    )
    return GraphBundle(graph=graph, meta=meta, host_edges=host_edges)


def assemble_graph(
    edge_arrays: Dict[EdgeTypeKey, tuple],
    node_counts: Dict[str, int],
    pad_multiple: int = 1024,
    config: Optional[Config] = None,
    host_edges_out: Optional[Dict] = None,
    dense_max_bytes: Optional[int] = None,
) -> HeteroGraph:
    """Pad/sort/CSR all relations and mirror each with its reverse.

    If ``host_edges_out`` is given, it is filled with the sorted valid
    (src, dst, val) numpy arrays per forward relation."""
    if dense_max_bytes is None:
        dense_max_bytes = (
            config.graph.dense_adjacency_max_bytes if config is not None else 0
        )
    src_span_rows = config.graph.src_span_rows if config is not None else 0
    enabled_bidirectional = {
        PATIENT_LAB: True,
        PATIENT_DIAGNOSIS: True,
        PATIENT_MEDICATION: True,
    }
    disabled: set = set()
    if config is not None:
        from multi_modal_gnn_tpu.graph.schema import CONFIG_EDGE_NAMES

        for name, et in CONFIG_EDGE_NAMES.items():
            etc = config.graph.edge_types.get(name)
            if etc is not None:
                enabled_bidirectional[et] = etc.bidirectional
                if not etc.enabled and et != PATIENT_LAB:
                    disabled.add(et)

    edges: Dict[EdgeTypeKey, EdgeSet] = {}
    for et, (src, dst, val) in edge_arrays.items():
        if et in disabled:
            continue
        s_type, _, d_type = et
        edges[et], host = pad_edge_set(
            src,
            dst,
            num_src=node_counts[s_type],
            num_dst=node_counts[d_type],
            val=val,
            pad_multiple=pad_multiple,
            return_host=True,
            dense_max_bytes=dense_max_bytes,
            src_span_rows=src_span_rows,
        )
        if host_edges_out is not None:
            host_edges_out[et] = host
        if enabled_bidirectional.get(et, True):
            rev = reverse_edge_type(et)
            edges[rev] = pad_edge_set(
                dst,
                src,
                num_src=node_counts[d_type],
                num_dst=node_counts[s_type],
                val=None,
                pad_multiple=pad_multiple,
                dense_max_bytes=dense_max_bytes,
                src_span_rows=src_span_rows,
            )

    # degree from the host arrays — avoids a device->host readback
    pl_src = np.asarray(edge_arrays[PATIENT_LAB][0], dtype=np.int64)
    degree = np.bincount(pl_src, minlength=node_counts[PATIENT]).astype(np.int32)
    import jax.numpy as jnp

    return HeteroGraph(
        edges=edges,
        patient_lab_degree=jnp.asarray(degree),
        node_counts=tuple(sorted(node_counts.items())),
    )


def build_onehot_features(
    pairs: pd.DataFrame,
    subject_col: str,
    item_col: str,
    patient_indexer: NodeIndexer,
    item_indexer: NodeIndexer,
) -> np.ndarray:
    """Patient x item one-hot membership matrix.

    Parity with the reference's legacy diagnosis/medication one-hot feature
    builders (src/graph_build.py:358-469) — unused by the production model
    (which learns pure ID embeddings) but consumed by external analyses.
    Vectorized: one fancy-index store instead of the reference's row loop.
    """
    mat = np.zeros((len(patient_indexer), len(item_indexer)), dtype=np.float32)
    p = patient_indexer.lookup_many(pairs[subject_col].to_numpy())
    i = item_indexer.lookup_many(pairs[item_col].to_numpy())
    keep = (p >= 0) & (i >= 0)
    mat[p[keep], i[keep]] = 1.0
    return mat


def build_graph_from_preprocessed(
    interim_dir: str | Path, config: Config, output_path: Optional[str | Path] = None
) -> GraphBundle:
    """Load the preprocess stage's parquet tables and build + save the graph
    (reference: src/graph_build.py:727-776)."""
    from multi_modal_gnn_tpu.utils.io import load_dataframe

    interim = Path(interim_dir)
    labs = load_dataframe(interim / "labs_normalized.parquet")
    cohort = load_dataframe(interim / "cohort.parquet")

    def _optional(name: str, columns) -> pd.DataFrame:
        path = interim / name
        if path.exists():
            return load_dataframe(path)
        return pd.DataFrame(columns=columns)

    diagnoses = _optional("diagnoses.parquet", ["SUBJECT_ID", "ICD3_CODE"])
    medications = _optional("medications.parquet", ["SUBJECT_ID", "DRUG"])
    labitems_path = interim / "labitems.parquet"
    labitems = load_dataframe(labitems_path) if labitems_path.exists() else None

    bundle = build_heterogeneous_graph(labs, diagnoses, medications, cohort, labitems, config)

    from multi_modal_gnn_tpu.graph.stats import compute_graph_statistics, validate_graph

    validate_graph(bundle.graph)
    stats = compute_graph_statistics(bundle.graph)
    logger.info("Graph statistics: %s", stats)

    if output_path is not None:
        from multi_modal_gnn_tpu.graph.serialize import save_graph

        save_graph(bundle, output_path)
        # multi-host artifacts from config: graph.extras.num_shards > 1 also
        # writes per-shard chunk files next to the single-file artifact, so a
        # pod launch can load_graph_distributed the same pipeline output.
        # graph.extras.shard_kernel_plans (default: model.use_pallas) bakes
        # per-shard windowed MXU-kernel plans into the shards.
        n_shards = int(config.graph.extras.get("num_shards", 0) or 0)
        if n_shards > 1:
            from multi_modal_gnn_tpu.graph.distributed import save_graph_sharded

            base = Path(output_path)
            base = base.with_suffix("") if base.suffix == ".npz" else base
            save_graph_sharded(
                bundle,
                base.parent / f"{base.name}_sharded",
                num_shards=n_shards,
                kernel_plans=bool(
                    config.graph.extras.get(
                        "shard_kernel_plans", config.model.use_pallas
                    )
                ),
            )
    return bundle
