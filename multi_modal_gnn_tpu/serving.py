"""Production serving: cached-node-state prediction + AOT-exported artifacts.

The reference's inference path re-runs the full GNN forward for every
request (src/inference.py:92-159 — ``predict_lab_values`` recomputes
``encode_nodes`` + 2 propagation layers per patient).  For a FROZEN
(params, graph) pair that work is constant, and every prediction channel of
both model families is node-factorable (models/rgcn.py "serving" section):

  * serving computes the node state ONCE (one eval-mode forward), and
  * each request runs only the pair heads on its (patient, lab) batch —
    microseconds instead of a full-graph propagation.

Two surfaces:

``build_serving_fn(trainer)``
    In-process: returns ``(fn, state)`` where ``fn(p_idx, l_idx) -> preds``
    is a jitted closure over the cached state.  Exactness vs
    ``predict_lab_values(train=False)`` is pinned in tests/test_serving.py.

``export_serving(trainer, bundle, path)`` / ``ServingModel.load(path)``
    Out-of-process: serializes the serving function per padding bucket via
    ``jax.export`` (versioned StableHLO, lowered for BOTH cpu and tpu), with
    the params + node state stored ONCE in ``weights.npz`` and passed as
    runtime arguments, plus a JSON manifest (buckets, node counts, lab
    names/stats for denormalization, model hash).  A serving host needs only
    this artifact directory and jax — no model code, config, graph builder,
    or checkpoint machinery.  Requests of any size are chunked to the largest
    bucket and padded to the smallest fitting one, so the compiled set is
    closed (no recompiles, ever).
"""

from __future__ import annotations

import dataclasses
import json
import logging
from pathlib import Path
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_gnn_tpu.graph.schema import LAB, PATIENT

logger = logging.getLogger(__name__)

_MANIFEST = "serving.json"
DEFAULT_BUCKETS = (256, 4096)


def _serving_variables(trainer) -> dict:
    """Assemble eval-mode variables exactly as the trainer's eval step does.

    ``trainer._prepare_params`` is deliberately NOT called: it is an
    inside-the-step hook (the explicit 2-D trainer reconstructs its
    model-axis-sharded patient table with axis_index/psum, which only
    resolve under shard_map).  Outside any step, ``state.params`` is already
    the full global view for every trainer — the 2-D trainer's table is a
    global [rows, dim] jax.Array merely *sharded* over the model axis.

    Serves the BEST-validation state when fit() recorded one (the same
    state train_pipeline's test loss and evaluate_model report); the live
    state is only used for trainers that never ran fit/validate."""
    state = trainer.best_state if trainer.best_state is not None else trainer.state
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    return variables


def compute_node_state(trainer) -> Dict[str, jax.Array]:
    """One eval-mode forward -> the frozen per-node serving state.

    value_context models see the same visibility template as the trainer's
    eval step (``_visible_graph`` with no knockout: train-split values)."""
    graph = trainer._visible_graph(trainer.graph, None)
    model = trainer.serving_model  # axis-free twin: works outside shard_map
    state = jax.jit(
        lambda v: model.apply(v, graph, method=model.compute_node_state)
    )(_serving_variables(trainer))
    return state


def _weighted_fn(model) -> Callable:
    """fn(weights, p_idx, l_idx) with weights = (variables, node_state) —
    the weight pytree stays an ARGUMENT so the export stores it once in
    ``weights.npz`` instead of baking a constant copy into every bucket's
    executable."""

    def fn(weights, patient_idx: jax.Array, lab_idx: jax.Array) -> jax.Array:
        variables, state = weights
        return model.apply(
            variables, state, patient_idx, lab_idx,
            method=model.predict_pairs_cached,
        )

    return fn


def build_serving_fn(
    trainer, state: Optional[Dict[str, jax.Array]] = None
) -> Tuple[Callable, Dict[str, jax.Array]]:
    """Jitted ``fn(patient_idx, lab_idx) -> predictions`` over cached state."""
    if state is None:
        state = compute_node_state(trainer)
    weights = (_serving_variables(trainer), state)
    wfn = jax.jit(_weighted_fn(trainer.serving_model))
    return (lambda p, l: wfn(weights, p, l)), state


def export_serving(
    trainer,
    bundle,
    path,
    buckets: Tuple[int, ...] = DEFAULT_BUCKETS,
    cold_start=None,
    conformal=None,
    conformal_cold=None,
) -> Path:
    """Write the AOT serving artifact: one serialized StableHLO function per
    padding bucket + a manifest.  ``bundle`` supplies lab names/stats for
    the manifest (denormalization happens host-side in ServingModel).

    ``cold_start`` (optional ``evaluation.baselines.ALSBaseline``, fitted on
    the train split): ships its lab factors in ``coldstart.npz`` so the
    served model can fold in UNSEEN patients from their observed labs —
    the one request type the transductive graph model cannot answer.

    ``conformal`` (optional ``evaluation.conformal.ConformalCalibrator``,
    e.g. ``calibrate_from_trainer(trainer)``): ships per-lab interval radii
    in ``conformal.json`` so ``predict(..., return_interval=True)`` can
    return distribution-free coverage-guaranteed bounds.

    ``conformal_cold`` (optional, ``calibrate_cold_start(cold_start,
    trainer.masker, ...)``): separate radii for the fold-in channel, whose
    residual distribution differs from the graph model's — ships as
    ``conformal_cold.json`` for ``predict_cold_start(...,
    return_interval=True)``."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    state = compute_node_state(trainer)
    weights = (_serving_variables(trainer), state)
    leaves, treedef = jax.tree_util.tree_flatten(weights)
    np.savez(path / "weights.npz", **{f"w{i}": np.asarray(a) for i, a in enumerate(leaves)})
    base = _weighted_fn(trainer.serving_model)
    # the treedef is structural (it compiles into the program); only the
    # arrays stay runtime arguments, so a serving host never needs model code
    wfn = jax.jit(lambda ls, p, l: base(jax.tree_util.tree_unflatten(treedef, ls), p, l))
    leaf_specs = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in leaves]
    buckets = tuple(sorted(set(int(b) for b in buckets)))

    for b in buckets:
        spec = jax.ShapeDtypeStruct((b,), jnp.int32)
        # lower for both platforms so the artifact runs on CPU serving
        # hosts and on TPU, wherever it was exported
        exported = jax.export.export(wfn, platforms=("cpu", "tpu"))(
            leaf_specs, spec, spec
        )
        (path / f"pairs_b{b}.bin").write_bytes(exported.serialize())

    if cold_start is not None:
        extra = {}
        if getattr(cold_start, "mem_proj", None) is not None and getattr(
            cold_start, "H", None
        ) is not None and np.size(getattr(cold_start, "mem_proj")) > 0:
            # side-information factors (SideInfoALSBaseline): cold start can
            # then condition on dx/rx memberships too — including patients
            # with ZERO observed labs
            extra = {"H": cold_start.H, "mem_proj": cold_start.mem_proj}
        np.savez(
            path / "coldstart.npz",
            C=cold_start.C,
            lab_bias=cold_start.lab_bias,
            reg=np.float64(cold_start.reg),
            **extra,
        )

    if conformal is not None:
        conformal.save(path / "conformal.json")
    if conformal_cold is not None:
        if cold_start is None:
            raise ValueError("conformal_cold requires cold_start factors")
        conformal_cold.save(path / "conformal_cold.json")

    meta = bundle.meta
    manifest = {
        "format": "multi_modal_gnn_tpu.serving/v1",
        "buckets": list(buckets),
        "num_patients": int(trainer.graph.num_nodes(PATIENT)),
        "num_labs": int(trainer.graph.num_nodes(LAB)),
        "model_hash": trainer.config.model_hash(),
        "architecture": trainer.config.model.architecture,
        "lab_names": {int(k): v for k, v in meta.lab_names.items()},
        "lab_stats": {int(k): v for k, v in meta.lab_stats.items()},
        "normalize_method": trainer.config.feature_space.labs.normalize,
        "export_platform": jax.default_backend(),
    }
    (path / _MANIFEST).write_text(json.dumps(manifest, indent=1))
    logger.info("Serving artifact exported to %s (buckets %s)", path, buckets)
    return path


@dataclasses.dataclass
class ServingModel:
    """Loads an ``export_serving`` artifact and serves predictions.

    ``predict`` pads each request to the smallest bucket that fits (chunking
    by the largest bucket first), so every call hits a pre-compiled
    executable.  ``denormalize=True`` maps predictions back to original lab
    units via the manifest's per-lab stats (zscore; other normalizations
    ship their fitted normalizer separately — see inference.Denormalizer).
    """

    manifest: dict
    _fns: Dict[int, Callable]
    _weights: list
    _cold: Optional[dict] = None
    _denorm_mean: Optional[np.ndarray] = None
    _denorm_std: Optional[np.ndarray] = None
    _conformal: Optional[object] = None  # evaluation.conformal.ConformalCalibrator
    _conformal_cold: Optional[object] = None  # fold-in channel calibrator

    @classmethod
    def load(cls, path) -> "ServingModel":
        path = Path(path)
        manifest = json.loads((path / _MANIFEST).read_text())
        with np.load(path / "weights.npz") as z:
            weights = [jnp.asarray(z[f"w{i}"]) for i in range(len(z.files))]
        fns: Dict[int, Callable] = {}
        for b in manifest["buckets"]:
            exported = jax.export.deserialize(
                (path / f"pairs_b{b}.bin").read_bytes()
            )
            fns[int(b)] = exported.call
        cold = None
        cs_path = path / "coldstart.npz"
        if cs_path.exists():
            with np.load(cs_path) as z:
                cold = {k: z[k] for k in z.files}
        conformal = conformal_cold = None
        if (path / "conformal.json").exists() or (path / "conformal_cold.json").exists():
            from multi_modal_gnn_tpu.evaluation.conformal import ConformalCalibrator

            if (path / "conformal.json").exists():
                conformal = ConformalCalibrator.load(path / "conformal.json")
            if (path / "conformal_cold.json").exists():
                conformal_cold = ConformalCalibrator.load(path / "conformal_cold.json")
        # vectorized denormalization tables (identity where stats are
        # missing or the normalization is not zscore)
        n_lab = manifest["num_labs"]
        mean, std = np.zeros(n_lab), np.ones(n_lab)
        if manifest.get("normalize_method", "zscore") == "zscore":
            for k, s in manifest.get("lab_stats", {}).items():
                i = int(k)
                if 0 <= i < n_lab:
                    mean[i] = float(s.get("mean", 0.0))
                    std[i] = float(s.get("std", 1.0))
        return cls(
            manifest=manifest, _fns=fns, _weights=weights, _cold=cold,
            _denorm_mean=mean, _denorm_std=std, _conformal=conformal,
            _conformal_cold=conformal_cold,
        )

    @property
    def buckets(self):
        return sorted(self._fns)

    def _call_padded(self, p: np.ndarray, l: np.ndarray) -> np.ndarray:
        n = len(p)
        bucket = next((b for b in self.buckets if b >= n), None)
        if bucket is None:
            raise ValueError(
                f"request of {n} pairs exceeds the largest bucket "
                f"{self.buckets[-1]} — use predict(), which chunks"
            )
        pad = bucket - n
        p_pad = np.concatenate([p, np.zeros(pad, np.int32)])
        l_pad = np.concatenate([l, np.zeros(pad, np.int32)])
        out = self._fns[bucket](self._weights, jnp.asarray(p_pad), jnp.asarray(l_pad))
        return np.asarray(out)[:n]

    def predict(
        self,
        patient_idx,
        lab_idx,
        denormalize: bool = False,
        return_interval: bool = False,
    ):
        """Point predictions; with ``return_interval=True``, also the
        conformal ``(lower, upper)`` bounds — distribution-free
        ``1 - alpha`` coverage from the shipped calibration
        (``export_serving(..., conformal=...)``).  Denormalization applies
        the same per-lab affine map to the bounds (std > 0, so the
        interval stays ordered and keeps its coverage).

        ``denormalize=True`` maps to original units only for ``zscore``
        normalization artifacts: the manifest's denorm tables carry per-lab
        mean/std fitted by the z-score normalizer, and are identity for
        minmax/robust/none (same contract as ``inference.Denormalizer``) —
        for those, predictions AND interval bounds stay in normalized
        units."""
        p = np.asarray(patient_idx, dtype=np.int32).reshape(-1)
        l = np.asarray(lab_idx, dtype=np.int32).reshape(-1)
        if p.shape != l.shape:
            raise ValueError(f"patient/lab shape mismatch: {p.shape} vs {l.shape}")
        if return_interval and self._conformal is None:
            raise ValueError(
                "artifact has no conformal.json — re-export with "
                "export_serving(..., conformal=calibrate_from_trainer(trainer))"
            )
        if len(p) == 0:
            empty = np.zeros(0, np.float32)
            return (empty, empty, empty) if return_interval else empty
        n_pat, n_lab = self.manifest["num_patients"], self.manifest["num_labs"]
        if p.min() < 0 or p.max() >= n_pat:
            raise ValueError(f"patient index out of range [0, {n_pat})")
        if l.min() < 0 or l.max() >= n_lab:
            raise ValueError(f"lab index out of range [0, {n_lab})")

        big = self.buckets[-1]
        chunks = [
            self._call_padded(p[i : i + big], l[i : i + big])
            for i in range(0, len(p), big)
        ]
        preds = np.concatenate(chunks)
        lo = hi = None
        if return_interval:
            lo, hi = self._conformal.intervals(preds, l)
        if denormalize:
            preds = preds * self._denorm_std[l] + self._denorm_mean[l]
            if return_interval:
                lo = lo * self._denorm_std[l] + self._denorm_mean[l]
                hi = hi * self._denorm_std[l] + self._denorm_mean[l]
        return (preds, lo, hi) if return_interval else preds

    def predict_patient(self, patient_idx: int, denormalize: bool = False):
        """All labs for one patient -> {lab_name: prediction}."""
        num_labs = self.manifest["num_labs"]
        labs = np.arange(num_labs, dtype=np.int32)
        preds = self.predict(
            np.full(num_labs, patient_idx, np.int32), labs, denormalize=denormalize
        )
        names = self.manifest["lab_names"]
        return {names.get(str(i), names.get(i, f"Lab_{i}")): float(v)
                for i, v in zip(labs, preds)}

    def predict_cold_start(
        self,
        observed: Dict[int, float],
        denormalize: bool = False,
        memberships: "np.ndarray | None" = None,
        return_interval: bool = False,
    ) -> Dict[str, float]:
        """All-lab predictions for an UNSEEN patient from their observed
        NORMALIZED lab values, via the shipped ALS fold-in factors (one
        closed-form ridge solve — see ALSBaseline.fold_in).  Requires the
        artifact to have been exported with ``cold_start=``.

        ``memberships`` (binary dx/rx feature vector, same layout as
        training.warmstart.bundle_membership_matrix rows): if the artifact
        was exported from a SideInfoALSBaseline, predictions additionally
        condition on the patient's diagnoses/medications — which answers
        even the zero-observed-labs request.

        ``return_interval=True``: values become ``{"predicted": v,
        "interval": [lo, hi]}`` using the FOLD-IN channel's own radii
        (``export_serving(..., conformal_cold=...)``) — the graph model's
        radii do not transfer to this predictor."""
        if self._cold is None:
            raise ValueError(
                "artifact has no coldstart.npz — re-export with "
                "export_serving(..., cold_start=fitted_ALSBaseline)"
            )
        if return_interval and self._conformal_cold is None:
            raise ValueError(
                "artifact has no conformal_cold.json — re-export with "
                "export_serving(..., conformal_cold=calibrate_cold_start(...))"
            )
        n_lab = self.manifest["num_labs"]
        obs_l = np.asarray(sorted(observed), dtype=np.int64)
        if len(obs_l) and (obs_l.min() < 0 or obs_l.max() >= n_lab):
            raise ValueError(f"observed lab index out of range [0, {n_lab})")
        obs_v = np.asarray([observed[int(i)] for i in obs_l], dtype=np.float64)
        # the shipped factors ARE a baseline's (C, lab_bias, reg, [H,
        # mem_proj]): rebuild it so the fold-in math lives in exactly one place
        rank = self._cold["C"].shape[1]
        if memberships is not None:
            if "mem_proj" not in self._cold:
                raise ValueError(
                    "artifact has no side-information factors — re-export "
                    "with export_serving(..., cold_start=fitted_SideInfoALSBaseline)"
                )
            from multi_modal_gnn_tpu.evaluation.baselines import SideInfoALSBaseline

            si = SideInfoALSBaseline(
                1, n_lab, rank=rank, mem_rank=self._cold["H"].shape[1],
                reg=float(self._cold["reg"]),
            )
            si.C = self._cold["C"]
            si.lab_bias = self._cold["lab_bias"]
            si.H = self._cold["H"]
            si.mem_proj = self._cold["mem_proj"]
            preds = si.predict_cold_start(
                obs_l, obs_v, np.arange(n_lab), memberships
            )
        else:
            from multi_modal_gnn_tpu.evaluation.baselines import ALSBaseline

            als = ALSBaseline(1, n_lab, rank=rank, reg=float(self._cold["reg"]))
            als.C = self._cold["C"]
            als.lab_bias = self._cold["lab_bias"]
            preds = als.predict_cold_start(obs_l, obs_v, np.arange(n_lab))
        lo = hi = None
        if return_interval:
            lo, hi = self._conformal_cold.intervals(preds, np.arange(n_lab))
        if denormalize:
            preds = preds * self._denorm_std + self._denorm_mean
            if return_interval:
                lo = lo * self._denorm_std + self._denorm_mean
                hi = hi * self._denorm_std + self._denorm_mean
        names = self.manifest["lab_names"]
        if return_interval:
            return {
                names.get(str(i), names.get(i, f"Lab_{i}")): {
                    "predicted": float(v),
                    "interval": [float(lo[i]), float(hi[i])],
                }
                for i, v in enumerate(preds)
            }
        return {names.get(str(i), names.get(i, f"Lab_{i}")): float(v)
                for i, v in enumerate(preds)}
