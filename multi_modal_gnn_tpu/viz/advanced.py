"""Advanced post-training analyses (reference: src/advanced_visualizations.py).

Produces under <output>/advanced_visualizations/:
  * parity_by_frequency — per lab-frequency-decile parity panels with R^2/MAE;
  * error_vs_degree — MAE per patient-degree bucket with the hybrid-head
    threshold line;
  * per_lab_calibration.csv + calibration plot — per-lab linear fit
    (pred = a*true + b) and the MAE delta a post-hoc calibration would give;
  * lab_embeddings_tsne — lab embeddings colored by clinical panel keywords;
  * patient_embeddings_tsne — patient embeddings colored by lab-degree.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

from multi_modal_gnn_tpu.evaluation.metrics import compute_regression_metrics
from multi_modal_gnn_tpu.utils.io import save_dataframe

logger = logging.getLogger(__name__)

# clinical panel keyword buckets (reference src/advanced_visualizations.py:270-347)
_PANELS = {
    "CBC": ["wbc", "rbc", "hgb", "hemoglobin", "hct", "hematocrit", "platelet", "mch", "mpv",
            "monos", "lymphs", "eos", "polys", "basos"],
    "CMP": ["sodium", "potassium", "chloride", "bicarbonate", "bun", "creatinine", "glucose",
            "calcium", "anion"],
    "LFT": ["alt", "ast", "alkaline", "bilirubin", "albumin", "protein"],
    "Coag": ["pt", "ptt", "inr", "fibrinogen"],
    "ABG": ["pao2", "paco2", "ph", "hco3", "base", "o2", "fio2"],
}


def _save(fig, path: Path):
    path.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    logger.info("Wrote %s", path)


def create_parity_plots_by_frequency(
    preds: np.ndarray, targets: np.ndarray, lab_idx: np.ndarray, lab_counts: np.ndarray, out: Path,
    n_bins: int = 4,
):
    freq = lab_counts[lab_idx]
    try:
        bins = pd.qcut(freq, q=n_bins, labels=False, duplicates="drop")
    except ValueError:
        bins = np.zeros(len(freq), dtype=int)
    n_actual = int(np.max(bins)) + 1
    fig, axes = plt.subplots(1, n_actual, figsize=(4 * n_actual, 4), squeeze=False)
    for b in range(n_actual):
        m = bins == b
        ax = axes[0, b]
        if m.sum() < 2:
            ax.set_visible(False)
            continue
        met = compute_regression_metrics(preds[m], targets[m])
        ax.scatter(targets[m], preds[m], s=5, alpha=0.3, color="#4878a8")
        lim = [targets[m].min(), targets[m].max()]
        ax.plot(lim, lim, "k--", lw=1)
        ax.set_title(f"freq bin {b + 1}/{n_actual}\nR2 {met['r2']:.3f} MAE {met['mae']:.3f}",
                     fontsize=9)
    _save(fig, out / "parity_by_frequency.png")


def create_error_vs_degree_plot(
    preds: np.ndarray, targets: np.ndarray, patient_idx: np.ndarray, degree: np.ndarray,
    threshold: int, out: Path,
):
    deg = degree[patient_idx]
    edges = [1, 3, 6, 10, 16, 25, 40, np.inf]
    labels, maes, counts = [], [], []
    for lo, hi in zip(edges[:-1], edges[1:]):
        m = (deg >= lo) & (deg < hi)
        if m.sum() > 0:
            labels.append(f"{lo}-{'' if np.isinf(hi) else int(hi) - 1}+" if np.isinf(hi) else f"{lo}-{int(hi)-1}")
            maes.append(np.abs(preds[m] - targets[m]).mean())
            counts.append(int(m.sum()))
    fig, ax = plt.subplots(figsize=(7, 4.5))
    bars = ax.bar(labels, maes, color="#4878a8")
    for bar, c in zip(bars, counts):
        ax.annotate(f"n={c}", (bar.get_x() + bar.get_width() / 2, bar.get_height()),
                    ha="center", va="bottom", fontsize=8)
    ax.axvline(1.5, color="#d1615d", ls="--", label=f"hybrid threshold ({threshold})")
    ax.set_xlabel("patient lab-degree bucket")
    ax.set_ylabel("MAE")
    ax.set_title("Error vs patient connectivity")
    ax.legend()
    _save(fig, out / "error_vs_degree.png")


def create_per_lab_calibration_table(
    preds: np.ndarray, targets: np.ndarray, lab_idx: np.ndarray, lab_names: Dict[int, str],
    out: Path,
) -> pd.DataFrame:
    """Per-lab linear fit pred = a*true + b and the MAE improvement a linear
    recalibration (true_hat = (pred - b)/a) would deliver."""
    rows = []
    for lab in np.unique(lab_idx):
        m = lab_idx == lab
        if m.sum() < 5:
            continue
        t, p = targets[m], preds[m]
        a, b = np.polyfit(t, p, deg=1)
        mae = np.abs(p - t).mean()
        if abs(a) > 1e-6:
            recal = (p - b) / a
            mae_recal = np.abs(recal - t).mean()
        else:
            mae_recal = mae
        rows.append(
            {
                "lab_index": int(lab),
                "lab_name": lab_names.get(int(lab), f"Lab_{lab}"),
                "slope": float(a),
                "intercept": float(b),
                "mae": float(mae),
                "mae_recalibrated": float(mae_recal),
                "mae_delta": float(mae - mae_recal),
                "num_samples": int(m.sum()),
            }
        )
    df = pd.DataFrame(rows).sort_values("mae_delta", ascending=False) if rows else pd.DataFrame()
    if len(df):
        out.mkdir(parents=True, exist_ok=True)
        save_dataframe(df, out / "per_lab_calibration.csv")
        fig, axes = plt.subplots(1, 3, figsize=(13, 4))
        axes[0].hist(df["slope"], bins=20, color="#4878a8")
        axes[0].axvline(1.0, color="k", ls="--")
        axes[0].set_title("calibration slopes (1.0 = perfect)")
        axes[1].hist(df["intercept"], bins=20, color="#6aa56e")
        axes[1].axvline(0.0, color="k", ls="--")
        axes[1].set_title("calibration intercepts")
        top = df.head(10)
        axes[2].barh(top["lab_name"], top["mae_delta"], color="#e49444")
        axes[2].invert_yaxis()
        axes[2].set_title("top recalibration gains (MAE delta)")
        _save(fig, out / "per_lab_calibration.png")
    return df


def _panel_of(name: str) -> str:
    low = name.lower()
    for panel, keywords in _PANELS.items():
        if any(k in low for k in keywords):
            return panel
    return "Other"


def create_embedding_visualizations(
    lab_emb: np.ndarray,
    patient_emb: np.ndarray,
    lab_names: Dict[int, str],
    degree: np.ndarray,
    out: Path,
):
    from sklearn.manifold import TSNE

    if len(lab_emb) >= 5:
        proj = TSNE(
            n_components=2, random_state=0, init="pca",
            perplexity=min(30, max(2, len(lab_emb) // 3)),
        ).fit_transform(lab_emb)
        panels = [_panel_of(lab_names.get(i, "")) for i in range(len(lab_emb))]
        fig, ax = plt.subplots(figsize=(7, 6))
        for panel in sorted(set(panels)):
            m = np.array([p == panel for p in panels])
            ax.scatter(proj[m, 0], proj[m, 1], s=40, label=panel, alpha=0.8)
        for i in range(len(lab_emb)):
            ax.annotate(str(lab_names.get(i, i))[:10], proj[i], fontsize=5, alpha=0.6)
        ax.legend()
        ax.set_title("Lab embeddings (t-SNE) by clinical panel")
        _save(fig, out / "lab_embeddings_tsne.png")

    if len(patient_emb) >= 10:
        sample = np.random.default_rng(0).choice(
            len(patient_emb), size=min(1500, len(patient_emb)), replace=False
        )
        proj = TSNE(n_components=2, random_state=0, init="pca").fit_transform(
            patient_emb[sample]
        )
        fig, ax = plt.subplots(figsize=(7, 6))
        sc = ax.scatter(proj[:, 0], proj[:, 1], c=degree[sample], s=8, cmap="viridis")
        fig.colorbar(sc, label="lab-degree")
        ax.set_title("Patient embeddings (t-SNE) by connectivity")
        _save(fig, out / "patient_embeddings_tsne.png")


def run_advanced_visualizations(
    config, bundle, trainer, output_dir: str | Path = "outputs"
) -> Path:
    """Driver (reference src/advanced_visualizations.py:392-504)."""
    from multi_modal_gnn_tpu.graph.schema import PATIENT_LAB

    out = Path(output_dir) / "advanced_visualizations"
    test_p, test_l, targets = trainer.masker.split_arrays("test")
    preds = trainer.predict("test", state=trainer.best_state)
    degree = np.asarray(bundle.graph.patient_lab_degree)
    lab_counts = np.asarray(bundle.graph.edges[PATIENT_LAB].dst_count)

    create_parity_plots_by_frequency(preds, targets, test_l, lab_counts, out)
    create_error_vs_degree_plot(
        preds, targets, test_p, degree, config.model.degree_threshold, out
    )
    create_per_lab_calibration_table(preds, targets, test_l, bundle.meta.lab_names, out)

    import jax

    state = trainer.best_state or trainer.state
    x_dict = jax.jit(
        lambda v: trainer.model.apply(v, train=False, method=trainer.model.encode_nodes)
    )({"params": state.params, "batch_stats": state.batch_stats})
    create_embedding_visualizations(
        np.asarray(x_dict["lab"]),
        np.asarray(x_dict["patient"]),
        bundle.meta.lab_names,
        degree,
        out,
    )
    return out
