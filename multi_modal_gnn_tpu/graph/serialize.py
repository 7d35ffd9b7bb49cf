"""Graph artifact (de)serialization: .npz arrays + .json metadata sidecar.

Replaces the reference's pickled ``graph.pt`` (src/graph_build.py:769) with a
transparent, torch-free format: one compressed npz holding every relation's
padded arrays and one JSON file holding indexers/lab names/config.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict

import jax.numpy as jnp
import numpy as np

from multi_modal_gnn_tpu.graph.build import GraphBundle, GraphMeta
from multi_modal_gnn_tpu.graph.hetero import EdgeSet, HeteroGraph
from multi_modal_gnn_tpu.graph.schema import EdgeTypeKey
from multi_modal_gnn_tpu.utils.io import load_json, save_json

logger = logging.getLogger(__name__)

_SEP = "||"


def save_graph(bundle: GraphBundle, path: str | Path) -> Path:
    """Save a GraphBundle as ``<path>.npz`` + ``<path>.meta.json``."""
    path = Path(path)
    if path.suffix == ".npz":
        path = path.with_suffix("")
    path.parent.mkdir(parents=True, exist_ok=True)

    arrays: Dict[str, np.ndarray] = {}
    graph = bundle.graph
    edge_index = []
    for et, es in graph.edges.items():
        key = _SEP.join(et)
        edge_index.append(
            {
                "edge_type": list(et),
                "num_valid": es.num_valid,
                "num_src": es.num_src,
                "num_dst": es.num_dst,
                "has_val": es.val is not None,
            }
        )
        arrays[f"{key}{_SEP}src"] = np.asarray(es.src)
        arrays[f"{key}{_SEP}dst"] = np.asarray(es.dst)
        arrays[f"{key}{_SEP}mask"] = np.asarray(es.mask)
        arrays[f"{key}{_SEP}dst_count"] = np.asarray(es.dst_count)
        arrays[f"{key}{_SEP}row_ptr"] = np.asarray(es.row_ptr)
        if es.val is not None:
            arrays[f"{key}{_SEP}val"] = np.asarray(es.val)
    arrays["patient_lab_degree"] = np.asarray(graph.patient_lab_degree)

    np.savez_compressed(path.with_suffix(".npz"), **arrays)
    sidecar = {
        "format_version": 1,
        "node_counts": {k: v for k, v in graph.node_counts},
        "edges": edge_index,
        "meta": bundle.meta.to_dict(),
    }
    save_json(sidecar, path.with_suffix(".meta.json"))
    logger.info("Saved graph to %s(.npz/.meta.json)", path)
    return path.with_suffix(".npz")


def load_graph(path: str | Path) -> GraphBundle:
    path = Path(path)
    if path.suffix == ".npz":
        path = path.with_suffix("")
    sidecar = load_json(path.with_suffix(".meta.json"))
    with np.load(path.with_suffix(".npz")) as data:
        edges: Dict[EdgeTypeKey, EdgeSet] = {}
        host_edges: Dict[EdgeTypeKey, tuple] = {}
        for entry in sidecar["edges"]:
            et = tuple(entry["edge_type"])
            key = _SEP.join(et)
            n_valid = int(entry["num_valid"])
            src_host = data[f"{key}{_SEP}src"][:n_valid]
            dst_host = data[f"{key}{_SEP}dst"][:n_valid]
            host_edges[et] = (
                src_host,
                dst_host,
                data[f"{key}{_SEP}val"][:n_valid] if entry["has_val"] else None,
            )
            from multi_modal_gnn_tpu.graph.hetero import (
                build_dense_adjacency,
                build_window_plan,
            )

            win_src, win_local, win_tile_map, num_windows = build_window_plan(
                src_host.astype(np.int32), dst_host.astype(np.int32), int(entry["num_dst"])
            )
            # dense adjacency is derived (not stored) — rebuild under the
            # budget recorded in the bundle's config, default 256 MB
            dense_budget = (
                (sidecar.get("meta", {}).get("config") or {})
                .get("graph", {})
                .get("dense_adjacency_max_bytes", 268_435_456)
            )
            dense = build_dense_adjacency(
                src_host.astype(np.int32),
                dst_host.astype(np.int32),
                int(entry["num_src"]),
                int(entry["num_dst"]),
                data[f"{key}{_SEP}dst_count"],
                dense_budget,
                dst_sorted=True,  # stored arrays are the sorted host view
            )
            # span-DMA plan is likewise derived, under the bundle's config
            from multi_modal_gnn_tpu.graph.hetero import (
                SPAN_MIN_SRC,
                build_src_span_plan,
            )

            span_rows_cfg = (
                (sidecar.get("meta", {}).get("config") or {})
                .get("graph", {})
                .get("src_span_rows", 256)
            )
            span = None
            if (
                span_rows_cfg
                and dense is None
                and int(entry["num_src"]) >= SPAN_MIN_SRC
                and n_valid
            ):
                span = build_src_span_plan(
                    win_src, win_local, win_tile_map,
                    int(entry["num_src"]), int(span_rows_cfg),
                )
            edges[et] = EdgeSet(
                src=jnp.asarray(data[f"{key}{_SEP}src"]),
                dst=jnp.asarray(data[f"{key}{_SEP}dst"]),
                mask=jnp.asarray(data[f"{key}{_SEP}mask"]),
                val=jnp.asarray(data[f"{key}{_SEP}val"]) if entry["has_val"] else None,
                dst_count=jnp.asarray(data[f"{key}{_SEP}dst_count"]),
                row_ptr=jnp.asarray(data[f"{key}{_SEP}row_ptr"]),
                win_src=jnp.asarray(win_src),
                win_local=jnp.asarray(win_local),
                win_tile_map=jnp.asarray(win_tile_map),
                dense_adj=jnp.asarray(dense) if dense is not None else None,
                span_src=jnp.asarray(span[0]) if span is not None else None,
                span_local=jnp.asarray(span[1]) if span is not None else None,
                span_tile_map=jnp.asarray(span[2]) if span is not None else None,
                span_base=jnp.asarray(span[3]) if span is not None else None,
                num_valid=int(entry["num_valid"]),
                num_src=int(entry["num_src"]),
                num_dst=int(entry["num_dst"]),
                num_windows=num_windows,
                span_rows=int(span_rows_cfg) if span is not None else 0,
            )
        degree = jnp.asarray(data["patient_lab_degree"])

    graph = HeteroGraph(
        edges=edges,
        patient_lab_degree=degree,
        node_counts=tuple(sorted(sidecar["node_counts"].items())),
    )
    meta = GraphMeta.from_dict(sidecar.get("meta", {}))
    logger.info("Loaded graph from %s", path)
    return GraphBundle(graph=graph, meta=meta, host_edges=host_edges)
