"""Leakage audit and robust-metrics module.

Capability-parity with the reference audit script (src/audit_leakage.py):
  * edge-level patient-overlap accounting across splits (:28-69 — overlap is
    expected and valid for edge-level splits; the audit documents it);
  * masked-value visibility checks (:72-117): no raw node features, only
    patient->lab edges carry attributes, splits mutually exclusive;
  * a stricter whole-patient holdout splitter with no-overlap invariants
    (:124-198);
  * split-strategy comparison (:201-257) and SMAPE/WAPE/percentile-
    winsorized robust metrics (:264-334);
  * writes ``audit_report.json``.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.graph.build import GraphBundle
from multi_modal_gnn_tpu.graph.hetero import HeteroGraph
from multi_modal_gnn_tpu.training.masker import EdgeMasker, SplitBatch, _pad_batch
from multi_modal_gnn_tpu.utils.io import save_json

logger = logging.getLogger(__name__)


# ============================================================================
# Split audits
# ============================================================================

def audit_patient_leakage(masker: EdgeMasker) -> Dict:
    """Patient-overlap accounting for the edge-level splits."""
    patients = {
        split: set(masker.split_arrays(split)[0].tolist())
        for split in ("train", "val", "test")
    }
    tr, va, te = patients["train"], patients["val"], patients["test"]
    return {
        "split_type": "edge_level",
        "num_train_patients": len(tr),
        "num_val_patients": len(va),
        "num_test_patients": len(te),
        "train_val_overlap": len(tr & va),
        "train_test_overlap": len(tr & te),
        "val_test_overlap": len(va & te),
        "all_splits_overlap": len(tr & va & te),
        "total_unique_patients": len(tr | va | te),
        "note": "Edge-level splits: patient overlap across splits is expected and valid",
    }


def audit_masked_value_visibility(graph: HeteroGraph, masker: EdgeMasker) -> Dict:
    """Verify held-out values cannot leak through features or supervision."""
    report: Dict = {}

    # 1. No raw node features exist at all in this graph representation —
    #    nodes are pure ID spaces (counts only), embeddings are learned.
    report["masked_values_in_node_features"] = False
    report["node_feature_leak_details"] = "nodes carry no features; ID embeddings only"

    # 2. Only patient->lab edges carry a value attribute.
    attr_relations = [
        "__".join(et) for et, es in graph.edges.items() if es.val is not None
    ]
    report["edge_attr_relations"] = attr_relations
    report["masked_values_in_other_edges"] = attr_relations != ["patient__has_lab__lab"]

    # 3. Split membership must partition the edge list (including the
    #    optional conformal "cal" split carved out of val).
    idx = {s: masker.split_indices(s) for s in masker.split_sizes()}
    union = np.concatenate(list(idx.values()))
    overlap = len(union) != len(np.unique(union))
    exhaustive = len(np.unique(union)) == masker.num_edges
    report["supervision_leak"] = bool(overlap)
    report["splits_exhaustive"] = bool(exhaustive)
    report["supervision_leak_details"] = (
        "train/val/test splits are mutually exclusive and exhaustive"
        if not overlap and exhaustive
        else "SPLIT OVERLAP DETECTED"
    )

    # 4. The value targets of val/test edges never enter the training loss:
    #    the supervision mask is drawn over the train batch only (by
    #    construction in Trainer._train_step_impl); we assert index-disjointness.
    tr_set = set(idx["train"].tolist())
    report["train_only_supervision"] = all(
        tr_set.isdisjoint(v.tolist()) for s, v in idx.items() if s != "train"
    )
    return report


# ============================================================================
# Patient-holdout splitter (stricter alternative)
# ============================================================================

class PatientHoldoutSplitter:
    """Whole-patient holdout: entire patients (all their lab edges) assigned
    to one split — tests generalization to completely unseen patients."""

    def __init__(
        self,
        graph: HeteroGraph,
        train_split: float = 0.7,
        val_split: float = 0.15,
        test_split: float = 0.15,
        seed: int = 42,
        host_edges: Optional[tuple] = None,
        pad_multiple: int = 256,
    ):
        if host_edges is not None:
            src, dst, val = host_edges
            self._p = np.asarray(src, dtype=np.int32)
            self._l = np.asarray(dst, dtype=np.int32)
            self._v = np.asarray(val, dtype=np.float32)
        else:
            es = graph.patient_lab
            mask = np.asarray(es.mask) > 0
            self._p = np.asarray(es.src)[mask].astype(np.int32)
            self._l = np.asarray(es.dst)[mask].astype(np.int32)
            self._v = np.asarray(es.val)[mask].astype(np.float32)
        self.pad_multiple = pad_multiple

        unique_patients = np.unique(self._p)
        rng = np.random.default_rng(seed)
        perm = rng.permutation(len(unique_patients))
        n_train = int(train_split * len(unique_patients))
        n_val = int(val_split * len(unique_patients))
        self.train_patients = set(unique_patients[perm[:n_train]].tolist())
        self.val_patients = set(unique_patients[perm[n_train : n_train + n_val]].tolist())
        self.test_patients = set(unique_patients[perm[n_train + n_val :]].tolist())

        assert not (self.train_patients & self.val_patients)
        assert not (self.train_patients & self.test_patients)
        assert not (self.val_patients & self.test_patients)

        in_split = {
            "train": np.isin(self._p, list(self.train_patients)),
            "val": np.isin(self._p, list(self.val_patients)),
            "test": np.isin(self._p, list(self.test_patients)),
        }
        self._split_indices = {k: np.where(m)[0] for k, m in in_split.items()}
        self._batches: Dict[str, SplitBatch] = {}
        logger.info(
            "Patient-holdout splits: %d/%d/%d patients, %d/%d/%d edges",
            len(self.train_patients), len(self.val_patients), len(self.test_patients),
            *(len(self._split_indices[s]) for s in ("train", "val", "test")),
        )

    # EdgeMasker-compatible surface (Trainer can consume this splitter)
    mask_fraction = 0.2

    def split_sizes(self) -> Dict[str, int]:
        return {k: len(v) for k, v in self._split_indices.items()}

    def split_indices(self, split: str) -> np.ndarray:
        return self._split_indices[split]

    def split_arrays(self, split: str):
        idx = self._split_indices[split]
        return self._p[idx], self._l[idx], self._v[idx]

    def get_split(self, split: str) -> SplitBatch:
        if split not in self._batches:
            idx = self._split_indices[split]
            self._batches[split], _ = _pad_batch(
                self._p[idx], self._l[idx], self._v[idx], self.pad_multiple
            )
        return self._batches[split]

    @property
    def num_edges(self) -> int:
        return len(self._p)


# ============================================================================
# Robust metrics
# ============================================================================

def compute_robust_metrics(
    y_true: np.ndarray, y_pred: np.ndarray, winsorize_pct: float = 5.0
) -> Dict:
    """MAE/RMSE/R^2 + SMAPE + WAPE + percentile-winsorized variants
    (reference src/audit_leakage.py:264-334)."""
    y_true = np.asarray(y_true, dtype=np.float64)
    y_pred = np.asarray(y_pred, dtype=np.float64)
    residuals = y_pred - y_true
    abs_res = np.abs(residuals)

    mae = float(abs_res.mean())
    rmse = float(np.sqrt((residuals**2).mean()))
    ss_tot = float(((y_true - y_true.mean()) ** 2).sum())
    r2 = float(1 - (residuals**2).sum() / ss_tot) if ss_tot > 0 else 0.0
    smape = float(100 * np.mean(abs_res / (np.abs(y_true) + np.abs(y_pred) + 1e-8)))
    wape = float(100 * abs_res.sum() / (np.abs(y_true).sum() + 1e-8))

    lower = np.percentile(abs_res, winsorize_pct)
    upper = np.percentile(abs_res, 100 - winsorize_pct)
    capped = np.clip(abs_res, lower, upper)
    out_of_band = (abs_res < lower) | (abs_res > upper)

    return {
        "mae": mae,
        "rmse": rmse,
        "r2": r2,
        "smape": smape,
        "wape": wape,
        "mae_winsorized": float(capped.mean()),
        "rmse_winsorized": float(np.sqrt((np.clip(residuals, -upper, upper) ** 2).mean())),
        "winsorize_percentile": winsorize_pct,
        "num_outliers_capped": int(out_of_band.sum()),
        "outlier_percentage": float(100 * out_of_band.mean()),
        "max_residual": float(abs_res.max()),
        "p95_residual": float(np.percentile(abs_res, 95)),
    }


# ============================================================================
# Full audit
# ============================================================================

def run_full_audit(
    config: Config,
    bundle: GraphBundle,
    trainer=None,
    output_dir: Optional[str | Path] = None,
    compare_holdout: bool = False,
) -> Dict:
    """End-to-end audit (reference src/audit_leakage.py:341-480): split
    hygiene + visibility checks + robust metrics on the trained model, and
    optionally a patient-holdout comparison run."""
    from multi_modal_gnn_tpu.training.masker import masker_from_config

    graph = bundle.graph
    # shared config->masker factory (training/masker.py): the audited split
    # partition is exactly the one every other entry point derives
    masker = trainer.masker if trainer is not None else masker_from_config(config, bundle)

    report: Dict = {
        "patient_leakage": audit_patient_leakage(masker),
        "masked_value_visibility": audit_masked_value_visibility(graph, masker),
    }

    if trainer is not None:
        _, _, y_true = masker.split_arrays("test")
        y_pred = trainer.predict("test", state=trainer.best_state)
        report["robust_metrics_edge_level"] = compute_robust_metrics(y_true, y_pred)

    if compare_holdout and trainer is not None:
        from multi_modal_gnn_tpu.models.factory import build_model
        from multi_modal_gnn_tpu.training.trainer import Trainer

        holdout = PatientHoldoutSplitter(
            graph,
            train_split=tc.train_split,
            val_split=tc.val_split,
            test_split=tc.test_split,
            seed=tc.seed,
            host_edges=bundle.patient_lab_host(),
        )
        holdout.mask_fraction = tc.mask_fraction
        model = build_model(config, graph)
        h_trainer = Trainer(model, graph, holdout, config)
        h_trainer.fit()
        _, _, y_true = holdout.split_arrays("test")
        y_pred = h_trainer.predict("test", state=h_trainer.best_state)
        report["split_strategy_comparison"] = {
            "edge_level": report.get("robust_metrics_edge_level"),
            "patient_holdout": compute_robust_metrics(y_true, y_pred),
            "note": "patient holdout is the harder task; lower metrics expected",
        }

    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        save_json(report, output_dir / "audit_report.json")
        logger.info("Audit report written to %s", output_dir / "audit_report.json")
    return report
