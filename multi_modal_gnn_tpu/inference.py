"""Per-patient inference reports.

Capability-parity with the reference inference stage (src/inference.py):
for each selected patient, classify every lab as measured (train/val split),
masked (test split — prediction vs actual), or truly missing (no edge), and
report denormalized predictions; sample a coverage-diverse set of patients;
write ``inference_examples.json``.

TPU-first difference: the reference runs a full-graph GNN forward per patient
per lab-group (src/inference.py:92-159); here all report patients' pairs are
batched into ONE jitted prediction call over (num_patients x num_labs) pairs.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.graph.build import GraphBundle
from multi_modal_gnn_tpu.graph.schema import LAB, PATIENT
from multi_modal_gnn_tpu.utils.io import save_json

logger = logging.getLogger(__name__)


class Denormalizer:
    """Maps graph lab indices to original-unit values.

    Prefers the fitted :class:`LabNormalizer` persisted by the preprocess
    stage (interim ``normalizer.parquet``) — every method's inverse is the
    affine ``value * scale + center`` — so minmax/robust/none configs
    denormalize correctly.  Falls back to ``GraphMeta.lab_stats`` (raw-value
    mean/std), which is only exact for zscore; the fallback logs once when
    the configured method isn't zscore.  Reference recomputes mean/std from
    interim parquet and assumes zscore (src/inference.py:296-299).
    """

    def __init__(self, meta, normalizer_frame=None, method: str = "zscore"):
        self.meta = meta
        self._method = method
        self._affine: Dict[int, tuple] = {}
        if normalizer_frame is not None and len(normalizer_frame):
            from multi_modal_gnn_tpu.graph.schema import LAB as _LAB

            indexer = meta.indexers.get(_LAB)
            by_id = {
                row["lab_id"]: (float(row["center"]), float(row["scale"]))
                for _, row in normalizer_frame.iterrows()
            }
            nmethod = (
                str(normalizer_frame["method"].iloc[0])
                if "method" in normalizer_frame.columns
                else method
            )
            self._method = nmethod
            if indexer is not None:
                for lab_id, cs in by_id.items():
                    idx = indexer.get(lab_id)
                    if idx is not None:
                        self._affine[int(idx)] = (0.0, 1.0) if nmethod == "none" else cs
        elif method != "zscore":
            logger.warning(
                "No fitted normalizer available; falling back to raw-value "
                "mean/std, which is only exact for zscore (configured: %s)",
                method,
            )

    def __call__(self, lab_idx: int, value: float) -> float:
        affine = self._affine.get(int(lab_idx))
        if affine is not None:
            center, scale = affine
            if scale == 0:
                # LabNormalizer's degenerate-scale transform shifts by center
                # (scale treated as 1) for zscore/robust and collapses to 0
                # for minmax; invert accordingly instead of collapsing every
                # prediction to the center value
                return float(center if self._method == "minmax" else value + center)
            return float(value * scale + center)
        stats = self.meta.lab_stats.get(int(lab_idx))
        if not stats:
            return float(value)
        return float(value * stats.get("std", 1.0) + stats.get("mean", 0.0))


def load_fitted_normalizer_frame(interim_dir) -> Optional[object]:
    """The preprocess stage's persisted normalizer table, if present."""
    path = Path(interim_dir) / "normalizer.parquet"
    if not path.exists():
        return None
    from multi_modal_gnn_tpu.utils.io import load_dataframe

    return load_dataframe(path)


def load_patient_context(
    bundle: GraphBundle, patient_idx: int, cohort=None, max_items: int = 10
) -> Dict:
    """Demographic + diagnosis + medication context for a patient
    (reference src/inference.py:27-51).  Diagnoses/medications come from the
    graph's own host edge lists + indexers; age/gender from the cohort frame
    when provided (interim cohort.parquet)."""
    from multi_modal_gnn_tpu.graph.schema import PATIENT_DIAGNOSIS, PATIENT_MEDICATION

    meta = bundle.meta
    context: Dict = {
        "patient_id": meta.indexers[PATIENT].id_of(patient_idx)
        if PATIENT in meta.indexers
        else patient_idx
    }
    for key, et in (("diagnoses", PATIENT_DIAGNOSIS), ("medications", PATIENT_MEDICATION)):
        items: List = []
        if bundle.host_edges and et in bundle.host_edges:
            src, dst, _ = bundle.host_edges[et]
            idxs = dst[src == patient_idx][:max_items]
            indexer = meta.indexers.get(et[2])
            items = [indexer.id_of(int(i)) if indexer else int(i) for i in idxs]
        context[key] = items
    if cohort is not None and "SUBJECT_ID" in cohort.columns:
        row = cohort[cohort["SUBJECT_ID"] == context["patient_id"]]
        if len(row):
            context["age"] = float(row.iloc[0].get("AGE", float("nan")))
            context["gender"] = str(row.iloc[0].get("GENDER", "N/A"))
    return context


def classify_patient_labs(masker, patient_idx: int) -> Dict[str, Dict[int, float]]:
    """Split a patient's observed labs by masker membership.

    Returns {"measured": {lab_idx: value}, "masked": {lab_idx: value}} where
    "masked" means the edge landed in the held-out test split.
    """
    p, l, v = masker._p, masker._l, masker._v
    positions = np.where(p == patient_idx)[0]
    test_positions = set(masker.split_indices("test").tolist())
    measured, masked = {}, {}
    for pos in positions:
        target = masked if pos in test_positions else measured
        target[int(l[pos])] = float(v[pos])
    return {"measured": measured, "masked": masked}


def select_example_patients(
    masker, num_patients: int, num_examples: int, rng: np.random.Generator
) -> List[int]:
    """Coverage-diverse patient sampling: lowest / median / highest lab-count
    tiers plus random fill (reference src/inference.py:334-362)."""
    degree = np.bincount(masker._p, minlength=num_patients)
    observed = np.where(degree > 0)[0]
    if len(observed) == 0:
        return []
    order = observed[np.argsort(degree[observed])]
    picks: List[int] = []
    for idx in (0, len(order) // 2, len(order) - 1):
        pid = int(order[idx])
        if pid not in picks:
            picks.append(pid)
    remaining = [int(x) for x in observed if x not in picks]
    rng.shuffle(remaining)
    picks.extend(remaining[: max(num_examples - len(picks), 0)])
    return picks[:num_examples]


def predict_for_patients(
    trainer, bundle: GraphBundle, patient_indices: List[int], denorm=None,
    conformal=None,
) -> Dict[int, Dict]:
    """Batched prediction of EVERY lab for each patient (single jitted call),
    then classification into measured / masked / truly-missing groups.

    ``conformal`` (optional :class:`evaluation.conformal.ConformalCalibrator`):
    attaches a coverage-guaranteed ``interval`` (original units) and
    ``normalized_interval`` to every predicted entry."""
    graph = bundle.graph
    meta = bundle.meta
    if denorm is None:
        denorm = Denormalizer(meta)
    num_labs = graph.num_nodes(LAB)
    masker = trainer.masker

    pairs_p = np.repeat(np.asarray(patient_indices, dtype=np.int32), num_labs)
    pairs_l = np.tile(np.arange(num_labs, dtype=np.int32), len(patient_indices))
    preds = trainer.predict_pairs(pairs_p, pairs_l)
    radius = conformal.radius(np.arange(num_labs)) if conformal is not None else None

    def _interval(lab_idx: int, pred_n: float) -> Dict:
        if radius is None:
            return {}
        lo_n, hi_n = pred_n - radius[lab_idx], pred_n + radius[lab_idx]
        # the denormalizing map is a per-lab monotone affine, so the
        # transformed bounds keep their coverage; sort defensively for the
        # degenerate-scale branches
        lo, hi = sorted((denorm(lab_idx, lo_n), denorm(lab_idx, hi_n)))
        return {
            "interval": [lo, hi],
            "normalized_interval": [float(lo_n), float(hi_n)],
        }

    out: Dict[int, Dict] = {}
    for i, pid in enumerate(patient_indices):
        patient_preds = preds[i * num_labs : (i + 1) * num_labs]
        groups = classify_patient_labs(masker, pid)
        measured, masked, missing = {}, {}, {}
        for lab_idx in range(num_labs):
            name = meta.lab_names.get(lab_idx, f"Lab_{lab_idx}")
            pred_n = float(patient_preds[lab_idx])
            if lab_idx in groups["masked"]:
                actual_n = groups["masked"][lab_idx]
                masked[name] = {
                    "predicted": denorm(lab_idx, pred_n),
                    "actual": denorm(lab_idx, actual_n),
                    "error": abs(denorm(lab_idx, pred_n) - denorm(lab_idx, actual_n)),
                    "normalized_predicted": pred_n,
                    "normalized_actual": actual_n,
                    **_interval(lab_idx, pred_n),
                }
            elif lab_idx in groups["measured"]:
                actual_n = groups["measured"][lab_idx]
                measured[name] = {
                    "value": denorm(lab_idx, actual_n),
                    "normalized": actual_n,
                }
            else:
                missing[name] = {
                    "predicted": denorm(lab_idx, pred_n),
                    "normalized_predicted": pred_n,
                    "note": "Lab was never measured for this patient",
                    **_interval(lab_idx, pred_n),
                }
        patient_entity = (
            meta.indexers[PATIENT].id_of(pid) if PATIENT in meta.indexers else pid
        )
        out[pid] = {
            "patient_id": patient_entity,
            "num_measured": len(measured),
            "measured_labs": measured,
            "masked_labs": masked,
            "truly_missing_labs": missing,
        }
    return out


def print_patient_report(report: Dict, detailed: bool = False) -> str:
    """Human-readable per-patient report (src/inference.py:181-257)."""
    lines = [
        "=" * 66,
        f"Patient {report['patient_id']} — {report['num_measured']} labs measured",
        "=" * 66,
    ]
    ctx = report.get("context") or {}
    demo_bits = [
        f"age {ctx['age']:.0f}" if "age" in ctx else None,
        f"gender {ctx['gender']}" if "gender" in ctx else None,
    ]
    if any(demo_bits):
        lines.append("  " + ", ".join(b for b in demo_bits if b))
    if ctx.get("diagnoses"):
        lines.append(f"  diagnoses: {', '.join(str(d) for d in ctx['diagnoses'])}")
    if ctx.get("medications"):
        lines.append(f"  medications: {', '.join(str(m) for m in ctx['medications'])}")
    if report["masked_labs"]:
        lines.append("\nHeld-out (test) labs — prediction vs actual:")
        for name, info in sorted(report["masked_labs"].items()):
            iv = info.get("interval")
            iv_s = f"  [{iv[0]:.2f}, {iv[1]:.2f}]" if iv else ""
            lines.append(
                f"  {name:<30} pred {info['predicted']:>10.2f}  "
                f"actual {info['actual']:>10.2f}  err {info['error']:.2f}{iv_s}"
            )
    if detailed and report["measured_labs"]:
        lines.append("\nMeasured labs:")
        for name, info in sorted(report["measured_labs"].items()):
            lines.append(f"  {name:<30} {info['value']:>10.2f}")
    if report["truly_missing_labs"]:
        lines.append(f"\nImputed (never measured): {len(report['truly_missing_labs'])} labs")
        if detailed:
            for name, info in sorted(report["truly_missing_labs"].items()):
                lines.append(f"  {name:<30} pred {info['predicted']:>10.2f}")
    text = "\n".join(lines)
    print(text)
    return text


def run_inference(
    config: Config,
    bundle: GraphBundle,
    trainer,
    output_dir: str | Path,
    patient_id: Optional[int] = None,
    num_examples: int = 5,
    detailed: bool = False,
    cohort=None,
) -> Dict:
    """Generate inference examples and aggregate error statistics
    (src/inference.py:260-415).  ``cohort``: optional demographics frame
    (interim cohort.parquet) enriching each report with age/gender."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    meta = bundle.meta
    num_patients = bundle.graph.num_nodes(PATIENT)
    rng = np.random.default_rng(config.train.seed)

    if patient_id is not None:
        idx = meta.indexers[PATIENT].get(patient_id) if PATIENT in meta.indexers else None
        if idx is None:
            raise ValueError(f"Unknown patient id: {patient_id}")
        patient_indices = [idx]
    else:
        patient_indices = select_example_patients(
            trainer.masker, num_patients, num_examples, rng
        )

    denorm = Denormalizer(
        meta,
        normalizer_frame=load_fitted_normalizer_frame(config.data.interim_dir),
        method=config.feature_space.labs.normalize,
    )
    # conformal interval radii (evaluation.extras.conformal_alpha, default
    # 0.1; falsy disables) — same validation-split calibration the
    # evaluation stage reports coverage for
    conformal = None
    alpha = config.evaluation.extras.get("conformal_alpha", 0.1)
    if alpha:
        from multi_modal_gnn_tpu.evaluation.conformal import calibrate_from_trainer

        try:
            # predict_for_patients predicts with the LIVE state
            # (predict_pairs default); calibrate with the same one
            conformal = calibrate_from_trainer(
                trainer, alpha=float(alpha), state=trainer.state
            )
        except ValueError as e:  # val split too small for this level
            logger.warning("Conformal intervals skipped: %s", e)
    reports = predict_for_patients(
        trainer, bundle, patient_indices, denorm=denorm, conformal=conformal
    )
    for idx, report in reports.items():
        report["context"] = load_patient_context(bundle, idx, cohort=cohort)
        print_patient_report(report, detailed=detailed)

    errors = [
        info["error"]
        for r in reports.values()
        for info in r["masked_labs"].values()
    ]
    norm_errors = [
        abs(info["normalized_predicted"] - info["normalized_actual"])
        for r in reports.values()
        for info in r["masked_labs"].values()
    ]
    summary = {
        "num_patients": len(reports),
        "num_masked_predictions": len(errors),
        "mean_abs_error_original_units": float(np.mean(errors)) if errors else None,
        "mean_abs_error_normalized": float(np.mean(norm_errors)) if norm_errors else None,
    }
    if conformal is not None:
        in_interval = [
            info["normalized_interval"][0]
            <= info["normalized_actual"]
            <= info["normalized_interval"][1]
            for r in reports.values()
            for info in r["masked_labs"].values()
            if "normalized_interval" in info
        ]
        summary["interval_alpha"] = conformal.alpha
        summary["interval_coverage_on_masked"] = (
            float(np.mean(in_interval)) if in_interval else None
        )
    result = {"examples": list(reports.values()), "summary": summary}
    save_json(result, output_dir / "inference_examples.json")
    logger.info("Inference summary: %s", summary)
    return result
