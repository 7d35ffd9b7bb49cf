"""Pre-training graph-structure visualization (reference: src/visualize_graph.py).

Produces under <output>/graph_visualizations/:
  * graph_overview — node/edge count panels, degree histogram, stats text;
  * patient_<id>_subgraph — radial ego-network of a patient with typed
    colors and lab-value edge labels;
  * network_sample — spring-layout plot of a sampled subgraph.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List, Optional

import matplotlib.pyplot as plt
import numpy as np

from multi_modal_gnn_tpu.graph.schema import (
    DIAGNOSIS,
    LAB,
    MEDICATION,
    PATIENT,
    PATIENT_DIAGNOSIS,
    PATIENT_LAB,
    PATIENT_MEDICATION,
)
from multi_modal_gnn_tpu.graph.stats import compute_graph_statistics

logger = logging.getLogger(__name__)

_TYPE_COLORS = {
    PATIENT: "#4878a8",
    LAB: "#d1615d",
    DIAGNOSIS: "#6aa56e",
    MEDICATION: "#e49444",
}


def _host_edges(bundle, et):
    if bundle.host_edges and et in bundle.host_edges:
        return bundle.host_edges[et]
    es = bundle.graph.edges[et]
    mask = np.asarray(es.mask) > 0
    val = np.asarray(es.val)[mask] if es.val is not None else None
    return np.asarray(es.src)[mask], np.asarray(es.dst)[mask], val


def _save(fig, path: Path):
    path.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    logger.info("Wrote %s", path)


def extract_patient_subgraph(
    bundle, patient_idx: int, max_neighbors: int = 12
) -> Dict[str, list]:
    """A patient's direct neighbors per modality, capped for readability
    (reference src/visualize_graph.py:37-99)."""
    out: Dict[str, list] = {"labs": [], "diagnoses": [], "medications": []}
    meta = bundle.meta
    for key, et, names in (
        ("labs", PATIENT_LAB, meta.lab_names),
        ("diagnoses", PATIENT_DIAGNOSIS, None),
        ("medications", PATIENT_MEDICATION, None),
    ):
        src, dst, val = _host_edges(bundle, et)
        sel = np.where(src == patient_idx)[0][:max_neighbors]
        for pos in sel:
            idx = int(dst[pos])
            if names is not None:
                label = names.get(idx, f"{et[2]}_{idx}")
            elif et[2] in meta.indexers:
                label = str(meta.indexers[et[2]].id_of(idx))
            else:
                label = f"{et[2]}_{idx}"
            out[key].append(
                {"index": idx, "label": label, "value": float(val[pos]) if val is not None else None}
            )
    return out


def plot_patient_subgraph(bundle, patient_idx: int, out: Path) -> None:
    """Radial ego plot: patient center, typed neighbors on rings."""
    sub = extract_patient_subgraph(bundle, patient_idx)
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.scatter([0], [0], s=600, color=_TYPE_COLORS[PATIENT], zorder=3)
    ax.annotate("patient", (0, 0), ha="center", va="center", fontsize=8, color="white")

    groups = [(sub["labs"], LAB, 1.0), (sub["diagnoses"], DIAGNOSIS, 1.8),
              (sub["medications"], MEDICATION, 2.6)]
    for items, ntype, radius in groups:
        n = len(items)
        for i, item in enumerate(items):
            theta = 2 * np.pi * i / max(n, 1) + 0.15 * radius
            x, y = radius * np.cos(theta), radius * np.sin(theta)
            ax.plot([0, x], [0, y], color="lightgray", lw=0.8, zorder=1)
            ax.scatter([x], [y], s=250, color=_TYPE_COLORS[ntype], zorder=3)
            label = item["label"][:16]
            if item["value"] is not None:
                label += f"\n{item['value']:.2f}"
            ax.annotate(label, (x, y), ha="center", va="center", fontsize=6)
    handles = [
        plt.Line2D([0], [0], marker="o", ls="", color=c, label=t)
        for t, c in _TYPE_COLORS.items()
    ]
    ax.legend(handles=handles, loc="upper right")
    ax.set_axis_off()
    ax.set_title(f"Patient node {patient_idx} neighborhood")
    _save(fig, out / f"patient_{patient_idx}_subgraph.png")


def plot_graph_overview(bundle, out: Path) -> None:
    """Counts + degree histogram + stats text (src/visualize_graph.py:259-413)."""
    stats = compute_graph_statistics(bundle.graph)
    fig, axes = plt.subplots(2, 2, figsize=(11, 8))

    nodes = stats["num_nodes"]
    axes[0, 0].bar(nodes.keys(), nodes.values(),
                   color=[_TYPE_COLORS.get(k, "gray") for k in nodes])
    axes[0, 0].set_title("Nodes per type")

    fwd_edges = {k.split("__")[1]: v for k, v in stats["num_edges"].items() if "rev_" not in k}
    axes[0, 1].bar(fwd_edges.keys(), fwd_edges.values(), color="#4878a8")
    axes[0, 1].set_title("Edges per relation (forward)")
    axes[0, 1].tick_params(axis="x", rotation=20)

    degree = np.asarray(bundle.graph.patient_lab_degree)
    axes[1, 0].hist(degree[degree > 0], bins=30, color="#6aa56e", edgecolor="white")
    axes[1, 0].set_title("Patient lab-degree")

    text = [f"patient-lab density: {stats.get('patient_lab_density', 0):.2%}"]
    for rel, d in stats.get("patient_degree", {}).items():
        text.append(f"{rel.split('__')[1]}: mean {d['mean']:.1f} max {d['max']}")
    axes[1, 1].text(0.05, 0.95, "\n".join(text), va="top", family="monospace", fontsize=9)
    axes[1, 1].set_axis_off()
    axes[1, 1].set_title("Statistics")
    _save(fig, out / "graph_overview.png")


def plot_network_sample(bundle, out: Path, num_patients: int = 25) -> None:
    """Spring-layout plot of a sampled patient-induced subgraph."""
    import networkx as nx

    g = nx.Graph()
    rng = np.random.default_rng(0)
    degree = np.asarray(bundle.graph.patient_lab_degree)
    candidates = np.where(degree > 0)[0]
    sample = rng.choice(candidates, size=min(num_patients, len(candidates)), replace=False)
    sample_set = set(int(s) for s in sample)

    for et in (PATIENT_LAB, PATIENT_DIAGNOSIS, PATIENT_MEDICATION):
        src, dst, _ = _host_edges(bundle, et)
        for s, d in zip(src, dst):
            if int(s) in sample_set:
                g.add_node(f"p{s}", ntype=PATIENT)
                g.add_node(f"{et[2][:3]}{d}", ntype=et[2])
                g.add_edge(f"p{s}", f"{et[2][:3]}{d}")

    pos = nx.spring_layout(g, seed=0, k=0.25)
    fig, ax = plt.subplots(figsize=(9, 9))
    for ntype, color in _TYPE_COLORS.items():
        nodes = [n for n, d in g.nodes(data=True) if d["ntype"] == ntype]
        nx.draw_networkx_nodes(g, pos, nodelist=nodes, node_color=color,
                               node_size=30, ax=ax, label=ntype)
    nx.draw_networkx_edges(g, pos, alpha=0.15, ax=ax)
    ax.legend()
    ax.set_axis_off()
    ax.set_title(f"Sampled network ({len(sample_set)} patients, {g.number_of_nodes()} nodes)")
    _save(fig, out / "network_sample.png")


def visualize_graph_structure(
    config, bundle, output_dir: str | Path = "outputs", patient_ids: Optional[List[int]] = None
) -> Path:
    """Driver (reference src/visualize_graph.py:528-600): overview + low/
    median/high-degree patient subgraphs + network sample."""
    out = Path(output_dir) / "graph_visualizations"
    plot_graph_overview(bundle, out)

    if patient_ids is None:
        degree = np.asarray(bundle.graph.patient_lab_degree)
        observed = np.where(degree > 0)[0]
        order = observed[np.argsort(degree[observed])]
        patient_ids = [int(order[0]), int(order[len(order) // 2]), int(order[-1])]
        n_extra = max(config.visualization.num_example_subgraphs - len(patient_ids), 0)
        rng = np.random.default_rng(1)
        extras = [int(x) for x in rng.choice(observed, size=min(n_extra, len(observed)), replace=False)]
        patient_ids.extend(x for x in extras if x not in patient_ids)

    if config.visualization.generate_subgraphs:
        for pid in patient_ids:
            plot_patient_subgraph(bundle, pid, out)
    plot_network_sample(bundle, out)
    return out
