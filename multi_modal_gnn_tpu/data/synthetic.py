"""Synthetic EHR cohort generator.

The reference repo ships no raw data (only result artifacts), so tests and
benchmarks here run on a generated cohort whose *shape* matches the eICU demo
statistics recorded in SURVEY.md section 0 — 1,834 patients / 50 labs /
114 diagnoses / 100 medications, ~61k patient-lab edges (mean lab-degree
~33.5, with a low-degree tail that exercises the degree-aware hybrid head) —
and whose *values* carry a recoverable low-rank latent structure:

    z_p ~ N(0, I_k)           patient latent state
    value_norm(p, l) = signal * <w_l, z_p> + sqrt(1 - signal^2) * eps

so a model that shares information across a patient's labs (exactly what the
GNN does) can explain about ``signal^2`` of the variance, while per-lab mean
baselines explain none.  Diagnosis and medication membership are also driven
by z_p, giving the relational structure real signal.

The generator emits dataframes in the same schema the preprocess stage
produces (SUBJECT_ID / ITEMID / VALUE / VALUE_NORMALIZED ...), so the entire
downstream pipeline — graph build, training, evaluation, inference — runs
identically on synthetic and real data.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np
import pandas as pd

from multi_modal_gnn_tpu.config import Config


@dataclass(frozen=True)
class SyntheticSpec:
    num_patients: int = 1834
    num_labs: int = 50
    num_diagnoses: int = 114
    num_medications: int = 100
    mean_labs_per_patient: float = 33.5
    mean_diagnoses_per_patient: float = 3.0
    mean_medications_per_patient: float = 8.7
    latent_dim: int = 8
    # sqrt of the latent-explainable fraction of normalized-value variance
    signal_strength: float = 0.6
    seed: int = 0

    @staticmethod
    def eicu_demo() -> "SyntheticSpec":
        """Matched to the eICU demo statistics (README.md:88-109 of reference)."""
        return SyntheticSpec()

    @staticmethod
    def scale_100k() -> "SyntheticSpec":
        """The BASELINE.json scale config: 100k patients / 500 labs / ~5M edges."""
        return SyntheticSpec(
            num_patients=100_000,
            num_labs=500,
            num_diagnoses=500,
            num_medications=300,
            mean_labs_per_patient=50.0,
            mean_diagnoses_per_patient=4.0,
            mean_medications_per_patient=10.0,
        )

    @staticmethod
    def mimic_scale() -> "SyntheticSpec":
        """MIMIC-III-shaped cohort: ~46k adult ICU patients, 700+ distinct
        labs (the reference's top-K filter default keeps ~100-500 of 726,
        io_mimic.py:442-516) — the vocabulary regime where the pair-head
        kernel's narrow lab tiles pay off (labs_pad 768 -> 3-6x narrowing
        at 128-256 rows vs 500-lab scale_100k's 2-4x)."""
        return SyntheticSpec(
            num_patients=46_000,
            num_labs=720,
            num_diagnoses=800,
            num_medications=400,
            mean_labs_per_patient=120.0,
            mean_diagnoses_per_patient=6.0,
            mean_medications_per_patient=15.0,
        )

    @staticmethod
    def tiny(seed: int = 0) -> "SyntheticSpec":
        """Small config for fast unit tests."""
        return SyntheticSpec(
            num_patients=120,
            num_labs=12,
            num_diagnoses=10,
            num_medications=8,
            mean_labs_per_patient=7.0,
            mean_diagnoses_per_patient=2.0,
            mean_medications_per_patient=2.0,
            latent_dim=4,
            seed=seed,
        )


def _sample_memberships(
    rng: np.random.Generator,
    num_patients: int,
    num_items: int,
    mean_per_patient: float,
    item_popularity: np.ndarray,
    affinity: np.ndarray | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sample (patient, item) membership pairs with power-law item popularity
    and optional latent affinity tilt.  Returns (patient_idx, item_idx)."""
    # per-patient counts: gamma-poisson for overdispersion, clipped to >= 1
    rate = rng.gamma(shape=2.5, scale=mean_per_patient / 2.5, size=num_patients)
    counts = np.maximum(rng.poisson(rate), 1)
    counts = np.minimum(counts, num_items)

    total = int(counts.sum())
    patient_idx = np.repeat(np.arange(num_patients, dtype=np.int64), counts)

    # Gumbel top-k per patient, vectorized: perturb log-popularity and take
    # the per-patient top-count items — samples without replacement.
    logp = np.log(item_popularity + 1e-12)
    item_idx = np.empty(total, dtype=np.int64)
    offset = 0
    # chunk patients to bound memory for the 100k config
    chunk = max(1, min(num_patients, int(2e7 // max(num_items, 1)) or 1))
    for start in range(0, num_patients, chunk):
        stop = min(start + chunk, num_patients)
        n = stop - start
        scores = logp[None, :] + rng.gumbel(size=(n, num_items))
        if affinity is not None:
            scores = scores + affinity[start:stop]
        order = np.argsort(-scores, axis=1)
        # flat gather of each row's top-count items (bit-identical to the
        # per-row slice loop: same ranking, same output order)
        cc = counts[start:stop]
        m = int(cc.sum())
        rows = np.repeat(np.arange(n, dtype=np.int64), cc)
        cols = np.arange(m, dtype=np.int64) - np.repeat(np.cumsum(cc) - cc, cc)
        item_idx[offset : offset + m] = order[rows, cols]
        offset += m
    return patient_idx, item_idx


@dataclass(frozen=True)
class SyntheticLatents:
    """The generator's ground-truth latent structure, for computing the
    Bayes-optimal conditional performance ceiling (evaluation/ceiling.py).

    ``value_norm = signal * <w_lab[l], z[p]> + sqrt(1 - signal^2) * eps``.
    """

    z: np.ndarray  # [num_patients, latent_dim]
    w_lab: np.ndarray  # [num_labs, latent_dim], unit rows
    signal: float


def generate_synthetic_tables(
    spec: SyntheticSpec, return_latents: bool = False
) -> Dict[str, pd.DataFrame] | Tuple[Dict[str, pd.DataFrame], SyntheticLatents]:
    """Generate preprocess-contract dataframes (cohort / labs_normalized /
    diagnoses / medications / labitems / demographics).

    With ``return_latents=True`` also returns the ground-truth
    :class:`SyntheticLatents` (same tables, identical RNG stream)."""
    rng = np.random.default_rng(spec.seed)

    # ---- latent structure -------------------------------------------------
    z = rng.standard_normal((spec.num_patients, spec.latent_dim))
    w_lab = rng.standard_normal((spec.num_labs, spec.latent_dim))
    w_lab /= np.linalg.norm(w_lab, axis=1, keepdims=True) + 1e-12

    # ---- cohort / demographics -------------------------------------------
    subject_ids = 100000 + np.arange(spec.num_patients)
    age = np.clip(rng.normal(63, 16, spec.num_patients), 18, 90).round(1)
    gender = rng.choice(["M", "F"], size=spec.num_patients)
    cohort = pd.DataFrame(
        {"SUBJECT_ID": subject_ids, "AGE": age, "GENDER": gender}
    )

    # ---- labs -------------------------------------------------------------
    lab_item_ids = 51000 + np.arange(spec.num_labs)
    lab_popularity = (1.0 / (np.arange(spec.num_labs) + 1.0)) ** 0.6
    lab_popularity /= lab_popularity.sum()
    p_idx, l_idx = _sample_memberships(
        rng,
        spec.num_patients,
        spec.num_labs,
        spec.mean_labs_per_patient,
        lab_popularity,
    )
    latent_part = np.einsum("ek,ek->e", z[p_idx], w_lab[l_idx])
    noise = rng.standard_normal(len(p_idx))
    s = spec.signal_strength
    value_norm = s * latent_part + np.sqrt(max(1.0 - s * s, 0.0)) * noise

    # raw values: per-lab affine scale so normalization/denormalization paths
    # are exercised for real
    lab_mean = rng.uniform(0.5, 150.0, spec.num_labs)
    lab_std = rng.uniform(0.05, 30.0, spec.num_labs)
    value_raw = value_norm * lab_std[l_idx] + lab_mean[l_idx]

    labs = pd.DataFrame(
        {
            "SUBJECT_ID": subject_ids[p_idx],
            "ITEMID": lab_item_ids[l_idx],
            "VALUE": value_raw.astype(np.float32),
            "VALUE_NORMALIZED": value_norm.astype(np.float32),
        }
    )

    # ---- diagnoses: membership tilted by latent state ---------------------
    w_dx = rng.standard_normal((spec.num_diagnoses, spec.latent_dim))
    dx_popularity = (1.0 / (np.arange(spec.num_diagnoses) + 1.0)) ** 0.8
    dx_popularity /= dx_popularity.sum()
    dx_aff_full = z @ w_dx.T * 0.5
    dxp_idx, dx_idx = _sample_memberships(
        rng,
        spec.num_patients,
        spec.num_diagnoses,
        spec.mean_diagnoses_per_patient,
        dx_popularity,
        affinity=dx_aff_full,
    )
    icd3 = np.array([f"{250 + i:03d}" for i in range(spec.num_diagnoses)])
    diagnoses = pd.DataFrame(
        {"SUBJECT_ID": subject_ids[dxp_idx], "ICD3_CODE": icd3[dx_idx]}
    )

    # ---- medications ------------------------------------------------------
    w_rx = rng.standard_normal((spec.num_medications, spec.latent_dim))
    rx_popularity = (1.0 / (np.arange(spec.num_medications) + 1.0)) ** 0.8
    rx_popularity /= rx_popularity.sum()
    rx_aff_full = z @ w_rx.T * 0.5
    rxp_idx, rx_idx = _sample_memberships(
        rng,
        spec.num_patients,
        spec.num_medications,
        spec.mean_medications_per_patient,
        rx_popularity,
        affinity=rx_aff_full,
    )
    drug_names = np.array([f"drug_{i:03d}" for i in range(spec.num_medications)])
    medications = pd.DataFrame(
        {"SUBJECT_ID": subject_ids[rxp_idx], "DRUG": drug_names[rx_idx]}
    )

    labitems = pd.DataFrame(
        {
            "ITEMID": lab_item_ids,
            "LABEL": [f"synthetic lab {i}" for i in range(spec.num_labs)],
        }
    )

    tables = {
        "cohort": cohort,
        "labs_normalized": labs,
        "diagnoses": diagnoses,
        "medications": medications,
        "labitems": labitems,
        "demographics": cohort.copy(),
    }
    if return_latents:
        return tables, SyntheticLatents(z=z, w_lab=w_lab, signal=float(s))
    return tables


def make_synthetic_bundle(spec: SyntheticSpec | None = None, config: Config | None = None):
    """One-call helper: generate tables and build the device graph bundle."""
    from multi_modal_gnn_tpu.graph.build import build_heterogeneous_graph

    spec = spec or SyntheticSpec.tiny()
    config = config or Config()
    tables = generate_synthetic_tables(spec)
    return build_heterogeneous_graph(
        labs=tables["labs_normalized"],
        diagnoses=tables["diagnoses"],
        medications=tables["medications"],
        cohort=tables["cohort"],
        labitems=tables["labitems"],
        config=config,
    )
