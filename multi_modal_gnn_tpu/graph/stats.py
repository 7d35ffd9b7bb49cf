"""Graph validation and statistics (reference: src/graph_build.py:593-720)."""

from __future__ import annotations

import logging
from typing import Dict

import numpy as np

from multi_modal_gnn_tpu.graph.hetero import HeteroGraph
from multi_modal_gnn_tpu.graph.schema import PATIENT, PATIENT_LAB

logger = logging.getLogger(__name__)


class GraphValidationError(ValueError):
    pass


def validate_graph(graph: HeteroGraph) -> None:
    """Bounds/shape/consistency checks on every relation's padded arrays."""
    counts = graph.node_count_map
    for et, es in graph.edges.items():
        s_type, _, d_type = et
        if es.num_src != counts[s_type]:
            raise GraphValidationError(f"{et}: num_src {es.num_src} != {counts[s_type]}")
        if es.num_dst != counts[d_type]:
            raise GraphValidationError(f"{et}: num_dst {es.num_dst} != {counts[d_type]}")
        src = np.asarray(es.src)
        dst = np.asarray(es.dst)
        mask = np.asarray(es.mask) > 0
        if src.shape != dst.shape or src.shape != mask.shape:
            raise GraphValidationError(f"{et}: padded array shape mismatch")
        if int(mask.sum()) != es.num_valid:
            raise GraphValidationError(
                f"{et}: mask count {int(mask.sum())} != num_valid {es.num_valid}"
            )
        if es.num_valid:
            if src[mask].min() < 0 or src[mask].max() >= es.num_src:
                raise GraphValidationError(f"{et}: src index out of bounds")
            if dst[mask].min() < 0 or dst[mask].max() >= es.num_dst:
                raise GraphValidationError(f"{et}: dst index out of bounds")
            if not np.all(np.diff(dst[mask]) >= 0):
                raise GraphValidationError(f"{et}: valid dst indices not sorted")
        # padding rows must point at the dummy segment
        if (~mask).any() and not np.all(dst[~mask] == es.num_dst):
            raise GraphValidationError(f"{et}: padding dst must equal num_dst")
        row_ptr = np.asarray(es.row_ptr)
        if row_ptr.shape[0] != es.num_dst + 1 or row_ptr[-1] != es.num_valid:
            raise GraphValidationError(f"{et}: CSR row_ptr inconsistent")
        if es.val is not None and np.asarray(es.val).shape != src.shape:
            raise GraphValidationError(f"{et}: val shape mismatch")
    logger.info("Graph validation passed (%d relations)", len(graph.edges))


def compute_graph_statistics(graph: HeteroGraph) -> Dict:
    """Node/edge counts, per-relation patient-degree stats, patient-lab density."""
    counts = graph.node_count_map
    stats: Dict = {
        "num_nodes": dict(counts),
        "num_edges": {"__".join(et): es.num_valid for et, es in graph.edges.items()},
        "padded_edges": {"__".join(et): es.num_padded for et, es in graph.edges.items()},
    }
    num_patients = counts.get(PATIENT, 0)
    degree_stats = {}
    for et, es in graph.edges.items():
        if et[0] != PATIENT or es.num_valid == 0:
            continue
        src = np.asarray(es.src)[np.asarray(es.mask) > 0]
        deg = np.bincount(src, minlength=num_patients)
        degree_stats["__".join(et)] = {
            "mean": float(deg.mean()),
            "std": float(deg.std()),
            "min": int(deg.min()),
            "max": int(deg.max()),
            "isolated": int((deg == 0).sum()),
        }
    stats["patient_degree"] = degree_stats

    pl = graph.edges.get(PATIENT_LAB)
    if pl is not None and num_patients and pl.num_dst:
        stats["patient_lab_density"] = pl.num_valid / (num_patients * pl.num_dst)
    return stats
