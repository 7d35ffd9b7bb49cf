"""Standard visualizations (reference: src/visualize.py).

Panels produced (one PNG each under <output>/visualizations/):
  * degree_distribution — patient lab-degree histogram + box;
  * missingness_heatmap — patient x lab observed/missing matrix;
  * training_curves — train/val loss + LR schedule with best-epoch marker;
  * parity_plot — predictions vs targets with MAE/RMSE/R^2 box;
  * error_distribution — residual histogram + normal Q-Q;
  * per_lab_performance — best/worst lab MAE bars;
  * embeddings — 2-D projection of node embeddings (PCA; t-SNE optional).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Optional

import matplotlib.pyplot as plt
import numpy as np

from multi_modal_gnn_tpu.evaluation.metrics import compute_per_lab_metrics, compute_regression_metrics

logger = logging.getLogger(__name__)


def _save(fig, path: Path):
    path.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    logger.info("Wrote %s", path)


def plot_degree_distribution(degree: np.ndarray, out: Path):
    degree = degree[degree > 0]
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    axes[0].hist(degree, bins=30, color="#4878a8", edgecolor="white")
    axes[0].set_xlabel("labs per patient")
    axes[0].set_ylabel("patients")
    axes[0].set_title("Patient lab-degree distribution")
    axes[1].boxplot(degree, orientation="vertical")
    axes[1].set_title(f"median={np.median(degree):.0f}, mean={degree.mean():.1f}")
    _save(fig, out / "degree_distribution.png")


def plot_missingness_heatmap(
    patient_idx: np.ndarray, lab_idx: np.ndarray, num_patients: int, num_labs: int, out: Path,
    max_patients: int = 400,
):
    mat = np.zeros((num_patients, num_labs), dtype=bool)
    mat[patient_idx, lab_idx] = True
    # order patients by coverage for a readable banded plot
    order = np.argsort(-mat.sum(axis=1))
    mat = mat[order][:max_patients]
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.imshow(mat, aspect="auto", cmap="Blues", interpolation="nearest")
    ax.set_xlabel("lab index")
    ax.set_ylabel(f"patients (top {len(mat)} by coverage)")
    ax.set_title(f"Observed-lab matrix (density {mat.mean():.1%})")
    _save(fig, out / "missingness_heatmap.png")


def plot_training_curves(history: Dict, out: Path):
    train, val = history.get("train_loss", []), history.get("val_loss", [])
    lrs = history.get("learning_rates", [])
    if not train:
        return
    best = int(np.argmin(val)) if val else None
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    epochs = np.arange(1, len(train) + 1)
    axes[0].plot(epochs, train, label="train", color="#4878a8")
    if val:
        axes[0].plot(epochs, val, label="val", color="#d1615d")
        axes[0].axvline(best + 1, ls="--", color="gray", label=f"best epoch {best + 1}")
    axes[0].set_xlabel("epoch")
    axes[0].set_ylabel("loss")
    axes[0].legend()
    axes[0].set_title("Training curves")
    if lrs:
        axes[1].plot(epochs, lrs, color="#6aa56e")
        axes[1].set_yscale("log")
        axes[1].set_xlabel("epoch")
        axes[1].set_ylabel("learning rate")
        axes[1].set_title("LR schedule")
    _save(fig, out / "training_curves.png")


def plot_parity(predictions: np.ndarray, targets: np.ndarray, out: Path):
    m = compute_regression_metrics(predictions, targets)
    fig, ax = plt.subplots(figsize=(5.5, 5.5))
    ax.scatter(targets, predictions, s=6, alpha=0.3, color="#4878a8")
    lim = [min(targets.min(), predictions.min()), max(targets.max(), predictions.max())]
    ax.plot(lim, lim, "k--", lw=1)
    ax.set_xlabel("actual (normalized)")
    ax.set_ylabel("predicted (normalized)")
    ax.set_title("Parity plot")
    ax.text(
        0.03, 0.97,
        f"MAE {m['mae']:.3f}\nRMSE {m['rmse']:.3f}\nR2 {m['r2']:.3f}",
        transform=ax.transAxes, va="top",
        bbox=dict(facecolor="white", alpha=0.8, edgecolor="gray"),
    )
    _save(fig, out / "parity_plot.png")


def plot_error_distribution(predictions: np.ndarray, targets: np.ndarray, out: Path):
    residuals = predictions - targets
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    axes[0].hist(residuals, bins=50, color="#4878a8", edgecolor="white")
    axes[0].axvline(0, color="k", lw=1)
    axes[0].set_title(f"Residuals (mean {residuals.mean():.3f}, std {residuals.std():.3f})")
    try:
        from scipy import stats

        stats.probplot(residuals, dist="norm", plot=axes[1])
        axes[1].set_title("Normal Q-Q")
    except ImportError:  # pragma: no cover
        axes[1].set_visible(False)
    _save(fig, out / "error_distribution.png")


def plot_per_lab_performance(
    predictions: np.ndarray,
    targets: np.ndarray,
    lab_idx: np.ndarray,
    lab_names: Dict[int, str],
    out: Path,
    top_n: int = 10,
):
    df = compute_per_lab_metrics(predictions, targets, lab_idx, lab_names)
    if not len(df):
        return
    best = df.head(top_n)
    worst = df.tail(top_n)
    fig, axes = plt.subplots(1, 2, figsize=(12, max(4, 0.35 * top_n)))
    axes[0].barh(best["lab_name"], best["mae"], color="#6aa56e")
    axes[0].invert_yaxis()
    axes[0].set_title(f"Best {len(best)} labs (MAE)")
    axes[1].barh(worst["lab_name"], worst["mae"], color="#d1615d")
    axes[1].invert_yaxis()
    axes[1].set_title(f"Worst {len(worst)} labs (MAE)")
    for ax in axes:
        ax.set_xlabel("MAE")
    _save(fig, out / "per_lab_performance.png")


def plot_embeddings(
    embeddings_by_type: Dict[str, np.ndarray], out: Path, method: str = "pca"
):
    """2-D projection of node embeddings colored by node type."""
    all_emb = np.concatenate(list(embeddings_by_type.values()), axis=0)
    if method == "umap":
        # exact reference tool (src/visualize.py:421-502) when installed;
        # callers substitute pca beforehand when umap-learn is unavailable
        from umap import UMAP

        proj = UMAP(n_components=2, random_state=0).fit_transform(all_emb)
    elif method == "tsne" and len(all_emb) <= 5000:
        from sklearn.manifold import TSNE

        proj = TSNE(n_components=2, random_state=0, init="pca").fit_transform(all_emb)
    else:
        from sklearn.decomposition import PCA

        proj = PCA(n_components=2, random_state=0).fit_transform(all_emb)
    fig, ax = plt.subplots(figsize=(6.5, 6))
    offset = 0
    colors = {"patient": "#4878a8", "lab": "#d1615d", "diagnosis": "#6aa56e", "medication": "#e49444"}
    for ntype, emb in embeddings_by_type.items():
        n = len(emb)
        ax.scatter(
            proj[offset : offset + n, 0], proj[offset : offset + n, 1],
            s=8, alpha=0.5, label=f"{ntype} ({n})", color=colors.get(ntype),
        )
        offset += n
    ax.legend()
    ax.set_title(f"Node embeddings ({method.upper()})")
    _save(fig, out / "embeddings.png")


def create_all_visualizations(
    config,
    bundle,
    trainer=None,
    history: Optional[Dict] = None,
    output_dir: str | Path = "outputs",
) -> Path:
    """Orchestrator (reference src/visualize.py:509-575)."""
    out = Path(output_dir) / "visualizations"
    graph = bundle.graph
    vc = config.visualization

    host = bundle.patient_lab_host()
    if host is not None:
        p_idx, l_idx, _ = host
    else:
        es = graph.patient_lab
        mask = np.asarray(es.mask) > 0
        p_idx, l_idx = np.asarray(es.src)[mask], np.asarray(es.dst)[mask]

    if vc.plot_degree_distribution:
        plot_degree_distribution(np.asarray(graph.patient_lab_degree), out)
    if vc.missingness_heatmap:
        plot_missingness_heatmap(
            p_idx, l_idx, graph.num_nodes("patient"), graph.num_nodes("lab"), out
        )
    if history:
        plot_training_curves(history, out)

    if trainer is not None:
        test_p, test_l, targets = trainer.masker.split_arrays("test")
        preds = trainer.predict("test", state=trainer.best_state)
        if vc.generate_parity_plots:
            plot_parity(preds, targets, out)
        plot_error_distribution(preds, targets, out)
        plot_per_lab_performance(
            preds, targets, test_l, bundle.meta.lab_names, out, top_n=vc.top_labs_to_plot
        )
        if vc.generate_embeddings:
            import jax

            x_dict = jax.jit(
                lambda v: trainer.model.apply(v, train=False, method=trainer.model.encode_nodes)
            )({"params": (trainer.best_state or trainer.state).params,
               "batch_stats": (trainer.best_state or trainer.state).batch_stats})
            emb = {k: np.asarray(v) for k, v in x_dict.items()}
            method = vc.dim_reduction
            if method == "umap":
                # use umap-learn when installed (reference tool,
                # src/visualize.py:421-502); otherwise substitute PCA and
                # say so — umap is an optional extra, not a core dependency
                try:
                    import umap  # noqa: F401
                except ImportError:
                    logger.warning(
                        "visualization.dim_reduction=umap requested but "
                        "umap-learn is not installed; substituting PCA"
                    )
                    method = "pca"
            plot_embeddings(emb, out, method=method)
    return out
