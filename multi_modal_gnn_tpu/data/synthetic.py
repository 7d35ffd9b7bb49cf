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

import dataclasses
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

    # ---- phenomenology ----------------------------------------------------
    # "flat": the original jointly-Gaussian rank-k generator (above docstring;
    #   bit-identical RNG stream to rounds 1-2 — every existing pin depends
    #   on it).  All fields below are ignored.
    # "eicu": calibrated against the reference's MEASURED real-data behavior
    #   (outputs/evaluation_results.json, per_lab_metrics.csv, the
    #   Iteration-2->7 ladder in outputs/things_to_improve.txt).  Adds the
    #   structure real z-scored EHR labs have that a flat isotropic Gaussian
    #   lacks:
    #     * a DOMINANT severity factor with a skewed heavy tail (gamma),
    #     * per-lab heterogeneous signal shares, rising with lab rarity
    #       (rare panels are ordered on sick patients and track severity),
    #     * severity-coupled lab ORDERING (sicker -> more labs, and
    #       preferentially the rare ones: MNAR missingness),
    #     * severity-coupled noise scale (sicker -> wilder deviations: a
    #       scale-mixture, hence heavy-tailed residuals — what the
    #       reference's +-3-sigma winsorization guard exists for), and
    #     * per-lab student-t measurement noise.
    #   signal_strength is IGNORED in this mode; the per-lab share fields
    #   below define the signal geometry.
    phenomenology: str = "flat"
    sev_shape: float = 2.0  # gamma shape of the severity factor (skew 2/sqrt(k))
    sev_share_common: float = 0.035  # severity variance share, most common lab
    sev_share_rare: float = 0.26  # ... rarest lab (v2.2: 0.22 -> 0.26, holds
    # the rare > common stratum ordering against the v2.2 composition)
    sev_share_power: float = 1.5  # rarity->share curve exponent
    sev_share_conc: float = 8.0  # Beta concentration of per-lab share jitter
    minor_share_lo: float = 0.05  # per-lab share of the minor (rank k-1) factors
    minor_share_hi: float = 0.22
    noise_df_min: float = 4.5  # per-lab student-t dof (log-uniform)
    noise_df_max: float = 30.0
    hetero_noise: float = 0.38  # noise scale ~ exp(hetero_noise * severity)
    degree_sev_coupling: float = 0.55  # lab-count rate ~ exp(coupling * severity)
    rare_sev_affinity: float = 1.0  # rare-lab ordering tilt toward sick patients
    # wild-value contamination (real EHR artifacts: unit mix-ups, entry
    # errors) — a small fraction of entries displaced by several sigma.
    # These crush RAW R^2 quadratically while barely moving MAE, which is
    # exactly why the reference's +-3-sigma winsorization guard moves its
    # headline metric so much (Iter 6 raw 0.034 -> Iter 7 guarded 0.242).
    contamination_frac: float = 0.012
    contamination_scale: float = 2.8
    # per-lab MAE-spread mechanisms (reference per_lab_metrics.csv spans
    # 0.138-0.856, std 0.19, with the spread carried by a fat LOW tail of
    # ~10 labs at MAE 0.14-0.35).  Two lab archetypes produce it there:
    #
    #  * "paired" labs (AST/ALT, per-lab R^2 0.72/0.71, MAE 0.22/0.26; FiO2
    #    0.91/0.139): the lab is near-determined by patient state that is
    #    itself well-OBSERVED — modeled as pairs sharing one dedicated
    #    minor-factor direction with a dominant share, so conditioning on
    #    the observed twin pins the target (v2.1's lone "special" labs
    #    capped at R^2 ~0.65: a lone high-share lab is still behind the
    #    latent-estimation noise floor);
    #  * "spike" labs (CPK test-stratum variance 0.137 with MAE 0.138;
    #    troponin, bilirubin, triglycerides): a TIGHT bulk plus rare large
    #    condition spikes, so the 100-sample test stratum's realized
    #    variance is spike-count luck (0.05-2.5) and the winsorized MAE
    #    lands at 0.14-0.35 on low realizations.  v2.2 (round 4) models
    #    this as an explicit bulk+spike mixture — a student-t near df=2
    #    CANNOT produce it: its finite-sample std is set by draws far
    #    inside the asymptotic tail, so renormalization inflates the bulk
    #    to ~0.3 (measured; see scripts/calibrate_spread.py).  Spike labs
    #    carry almost no latent signal (heavy_signal_scale), skip the
    #    severity noise-scale mixture (their spikes are condition events,
    #    not severity-proportional), and are excluded from the
    #    contamination channel (their spikes ARE their wild-value process).
    special_lab_frac: float = 0.08  # fraction of labs that are twin-paired
    special_share: float = 0.93  # paired labs' total signal share
    heavy_lab_frac: float = 0.08  # fraction with spike-mixture noise
    heavy_signal_scale: float = 0.15  # spike labs' signal-share multiplier
    heavy_bulk: float = 0.16  # spike labs' bulk noise std (pre-renorm)
    heavy_spike_prob: float = 0.015  # per-entry spike probability
    heavy_spike_scale: float = 4.5  # spike magnitude scale
    # ---- v2.3 (round 5): count profile / degree shape / quantization ------
    # per-lab count profile (eicu mode): "ref" pins the popularity curve to
    # the reference's own measured per-lab sample histogram
    # (ref outputs/per_lab_metrics.csv num_samples, 53-278 at the 15% test
    # split => ~19%-99% patient coverage; quantile-interpolated when
    # num_labs != 50) with a fixed-point calibration against the
    # Gumbel-top-k sampler; "zipf" keeps the v2.2 1/rank curve.  The v2.2
    # residual per-lab-MAE-spread gap was diagnosed as exactly this count
    # dispersion (docs/ROUND4.md item 2: ref test n spans 53-278, v2.2's
    # ~137-271).
    count_profile: str = "zipf"
    # gamma shape of the per-patient lab-count rate (the pre-v2.3 sampler
    # hardcoded 2.5); larger = less overdispersed degrees
    degree_shape: float = 2.5
    # a brief-stay subpopulation ordered only a few panels (rate re-drawn
    # around brief_mean): the source of the reference's tiny low-degree
    # stratum (9 of 9,224 test edges at degree 1-5) once the "ref" count
    # profile's near-universal panels push every ordinary patient past
    # degree ~15.  0 disables.
    brief_frac: float = 0.0
    brief_mean: float = 5.0
    # extra per-lab Gumbel rank-noise toward the rare end (scale
    # 1 + rank_noise_rare * r^1.5): rare panels are patient-idiosyncratic —
    # without this a strict global ranking floors every rare lab's coverage
    # at P(count > rank) ~ 27%, above the reference's 19% (see
    # _sample_memberships noise_scale doc)
    rank_noise_rare: float = 0.0
    # cap on the per-patient lab count, as a fraction of num_labs (1.0
    # disables).  Without it the severity-tilted gamma-Poisson rate clips a
    # QUARTER of the cohort at ALL 50 labs (measured, v2.3 calibration),
    # flooring every rare lab's coverage at that population — no real
    # patient receives the complete union of panels
    degree_cap_frac: float = 1.0
    # per-lab measurement quantization step, in units of the lab's
    # pre-standardization SD (0 disables; per-lab log-jitter x/÷2).  Real
    # lab values carry device/reporting precision, so z-scored targets live
    # on a per-lab GRID and near-zero targets are RARE — the mechanism
    # behind the reference's finite MAPE fingerprint (167.2% overall,
    # per-lab 57-396%).  A continuous symmetric marginal cannot produce it:
    # the v2.2 cohort measures E[1/|t|] ~ 40 => MAPE ~2690%
    # (VERDICT r4 weak #2).
    quant_step: float = 0.0

    @staticmethod
    def eicu_demo() -> "SyntheticSpec":
        """Matched to the eICU demo statistics (README.md:88-109 of reference)."""
        return SyntheticSpec()

    @staticmethod
    def eicu_real(seed: int = 0) -> "SyntheticSpec":
        """eICU-demo-sized cohort with the calibrated real-data phenomenology
        (``phenomenology="eicu"``) — the generator-validation cohort on which
        the reference's measured iteration ladder is reproduced
        (scripts/validate_generator.py, README "Generator validation").
        v2.3 (round 5): reference-matched per-lab count profile, brief-stay
        low-degree subpopulation, per-lab value quantization (the MAPE
        fingerprint), 3 twin pairs at share 0.95 + 5 spike labs + damped
        minor shares — the calibration that holds the rare>common margin
        (>= 0.02) on data seeds 0-2
        (outputs/diagnostics/generator_validation_v23h_ds*.json)."""
        return SyntheticSpec(
            phenomenology="eicu",
            seed=seed,
            count_profile="ref",
            degree_shape=12.0,
            brief_frac=0.012,
            brief_mean=4.0,
            rank_noise_rare=2.0,
            degree_cap_frac=0.88,
            quant_step=0.25,
            special_lab_frac=0.12,
            special_share=0.95,
            heavy_lab_frac=0.10,
            sev_share_rare=0.29,
            contamination_frac=0.024,
            minor_share_lo=0.04,
            minor_share_hi=0.18,
        )

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


_SPEC_PRESETS = {
    "eicu_demo": SyntheticSpec.eicu_demo,
    "eicu_real": SyntheticSpec.eicu_real,
    "scale_100k": SyntheticSpec.scale_100k,
    "mimic_scale": SyntheticSpec.mimic_scale,
    "tiny": SyntheticSpec.tiny,
}


def spec_from_config(config: Config) -> SyntheticSpec:
    """Resolve the SyntheticSpec the pipeline should generate from the
    config's ``data.synthetic`` block (round-tripped through
    ``DataConfig.extras`` — unknown-key preservation, config.py ``_take``).

    Schema (all keys optional)::

        data:
          dataset: synthetic
          synthetic:
            preset: eicu_real   # eicu_demo | eicu_real | tiny |
                                # scale_100k | mimic_scale
            seed: 0             # ... plus any SyntheticSpec field override

    Absent block -> ``eicu_demo`` (the flat generator every pre-round-4
    artifact was produced on).  This is the product-surface route to the
    VALIDATED phenomenology: ``preset: eicu_real`` sends the whole 8-step
    pipeline through the calibrated eicu generator (README "Generator
    validation") instead of the flat rank-k one.
    """
    from multi_modal_gnn_tpu.config import ConfigError

    raw = config.data.extras.get("synthetic", {}) or {}
    if not isinstance(raw, dict):
        raise ConfigError(
            f"data.synthetic must be a mapping, got {type(raw).__name__}"
        )
    raw = dict(raw)
    preset = str(raw.pop("preset", "eicu_demo"))
    if preset not in _SPEC_PRESETS:
        raise ConfigError(
            f"data.synthetic.preset must be one of "
            f"{sorted(_SPEC_PRESETS)}, got {preset!r}"
        )
    spec = _SPEC_PRESETS[preset]()
    fields = {f.name: f for f in dataclasses.fields(SyntheticSpec)}
    unknown = set(raw) - set(fields)
    if unknown:
        raise ConfigError(
            f"unknown data.synthetic key(s) {sorted(unknown)}; "
            f"valid: preset + {sorted(fields)}"
        )
    overrides = {}
    for k, v in raw.items():
        # YAML numbers arrive as int/float interchangeably; coerce to the
        # dataclass field's declared type so frozen-spec hashing stays stable
        ftype = fields[k].type
        if ftype in ("int", int):
            overrides[k] = int(v)
        elif ftype in ("float", float):
            overrides[k] = float(v)
        else:
            overrides[k] = v
    return dataclasses.replace(spec, **overrides) if overrides else spec


def _sample_memberships(
    rng: np.random.Generator,
    num_patients: int,
    num_items: int,
    mean_per_patient: float,
    item_popularity: np.ndarray,
    affinity: np.ndarray | None = None,
    rate_tilt: np.ndarray | None = None,
    rate: np.ndarray | None = None,
    noise_scale: np.ndarray | None = None,
    max_count: int | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sample (patient, item) membership pairs with power-law item popularity
    and optional latent affinity tilt.  Returns (patient_idx, item_idx).

    ``rate_tilt`` multiplies each patient's count rate (mean-normalized so the
    cohort mean stays at ``mean_per_patient``) — the eicu phenomenology's
    severity->degree coupling (sicker patients get more labs ordered).
    ``rate`` supplies the per-patient count rates directly (v2.3: degree
    shape / brief-stay control lives at the caller), skipping the internal
    gamma draw; the legacy draw is kept bit-identical for callers that omit
    it (the flat generator's stream is pinned).
    ``noise_scale`` (per item) scales the Gumbel rank perturbation: rank
    ordering for items with scale >> 1 becomes patient-idiosyncratic rather
    than popularity-driven.  Without it, a strict global ranking makes every
    high-count patient sweep up EVERY item, flooring rare-item coverage at
    P(count > rank) — the v2.3 "ref" count profile needs rare panels that
    even 45-lab patients routinely miss (the reference's rarest lab covers
    only ~19% of patients at mean degree 33.5)."""
    # per-patient counts: gamma-poisson for overdispersion, clipped to >= 1
    if rate is None:
        rate = rng.gamma(shape=2.5, scale=mean_per_patient / 2.5, size=num_patients)
    if rate_tilt is not None:
        rate = rate * (rate_tilt / rate_tilt.mean())
    counts = np.maximum(rng.poisson(rate), 1)
    counts = np.minimum(counts, num_items if max_count is None else max_count)

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
        g = rng.gumbel(size=(n, num_items))
        if noise_scale is not None:
            g = g * noise_scale[None, :]
        scores = logp[None, :] + g
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


# The reference's measured per-lab test-split sample counts (ref
# outputs/per_lab_metrics.csv ``num_samples`` column, 50 labs, 15% edge
# split of the real eICU demo cohort) — the calibration target for
# ``count_profile="ref"``.  Spans 53 (triglycerides) to 278 (Hct):
# the top panels are measured on ~97-99% of patients, the rare quartile on
# ~19-32%.
_REF_LAB_TEST_COUNTS = np.array([
    197, 219, 207, 203, 182, 213, 227, 267, 94, 88, 58, 124, 108, 278, 251,
    246, 260, 239, 178, 88, 173, 173, 112, 251, 231, 71, 255, 208, 202, 196,
    157, 250, 240, 265, 265, 268, 88, 206, 139, 107, 109, 106, 255, 232, 267,
    194, 212, 53, 100, 112,
], dtype=np.float64)


def _ref_count_shares(num_labs: int) -> np.ndarray:
    """Per-lab count shares, descending, quantile-interpolated from the
    reference histogram to ``num_labs`` rows."""
    prof = np.sort(_REF_LAB_TEST_COUNTS)[::-1]
    if num_labs != len(prof):
        prof = np.interp(
            np.linspace(0.0, 1.0, num_labs), np.linspace(0.0, 1.0, len(prof)), prof
        )
    return prof / prof.sum()


@dataclass(frozen=True)
class SyntheticLatents:
    """The generator's ground-truth latent structure, for computing
    performance ceilings.

    Flat mode: ``value_norm = signal * <w_lab[l], z[p]> + sqrt(1-signal^2) * eps``
    (``w_eff``/``noise_var`` are None) — the EXACT Bayes conditional
    ceiling applies (``ceiling.gaussian_conditional_ceiling``, fed
    ``w_lab``/``signal``).  eicu mode: feed ``w_eff``/``noise_var``/
    ``mean_shift`` to ``ceiling.lmmse_conditional_ceiling`` instead — the
    flat-ceiling API would silently discard the per-lab loading magnitudes
    and heteroscedastic noise and report a wrong number.

    eicu mode: after the per-lab observed-set standardization,
    ``value_norm ~= <w_eff[l], z[p]> - mean_shift[l] + noise`` with per-lab
    effective noise variance ``noise_var[l]`` (approximate: the noise is a
    severity-coupled scale mixture of student-t's, so a linear-Gaussian
    ceiling computed from these is LMMSE, not exact Bayes).  ``z[:, 0]`` is
    the severity factor.
    """

    z: np.ndarray  # [num_patients, latent_dim]
    w_lab: np.ndarray  # [num_labs, latent_dim], unit rows (flat mode)
    signal: float
    w_eff: np.ndarray | None = None  # [num_labs, latent_dim] effective loadings
    noise_var: np.ndarray | None = None  # [num_labs] effective noise variance
    mean_shift: np.ndarray | None = None  # [num_labs] standardization offset
    sev_share: np.ndarray | None = None  # [num_labs] pre-selection share
    special_labs: np.ndarray | None = None  # setting-like lab rows (eicu mode)
    heavy_labs: np.ndarray | None = None  # tail-concentrated lab rows (eicu mode)


def _standardized_gamma(rng: np.random.Generator, shape_k: float, size: int) -> np.ndarray:
    """Gamma(k, 1) standardized to mean 0 / var 1 (skew 2/sqrt(k))."""
    g = rng.gamma(shape_k, 1.0, size)
    return (g - shape_k) / np.sqrt(shape_k)


def _standardized_t(rng: np.random.Generator, df: np.ndarray) -> np.ndarray:
    """Student-t with per-element dof, standardized to unit variance (df > 2)."""
    t = rng.standard_t(df)
    return t * np.sqrt((df - 2.0) / df)


def _generate_eicu_tables(
    spec: SyntheticSpec, return_latents: bool
) -> Dict[str, pd.DataFrame] | Tuple[Dict[str, pd.DataFrame], SyntheticLatents]:
    """The ``phenomenology="eicu"`` generator (see SyntheticSpec docstring).

    Calibration targets are the reference's MEASURED real-data artifacts
    (/root/reference/outputs/evaluation_results.json, per_lab_metrics.csv,
    things_to_improve.txt): rare-lab R^2 above common, degree-16+ carrying
    the overall number, a low-degree stratum with small variance and
    negative R^2, a wide per-lab MAE spread, MAE/RMSE ~ 0.68 (heavier than
    Gaussian), and a +-3-sigma winsorization rate near 2.35%.
    """
    rng = np.random.default_rng(spec.seed)
    n, L, k = spec.num_patients, spec.num_labs, spec.latent_dim

    # ---- latents: dominant severity factor + isotropic minor factors ------
    s = _standardized_gamma(rng, spec.sev_shape, n)  # severity, skewed
    u = rng.standard_normal((n, k - 1))
    z = np.concatenate([s[:, None], u], axis=1)

    # ---- per-lab signal geometry ------------------------------------------
    # rarity rank: lab 0 most common (popularity below is rank-decaying)
    r = np.arange(L) / max(L - 1, 1)
    mean_sev = spec.sev_share_common + (
        spec.sev_share_rare - spec.sev_share_common
    ) * r**spec.sev_share_power
    c = spec.sev_share_conc
    sev_share = rng.beta(c * mean_sev, c * (1.0 - mean_sev))
    minor_share = rng.uniform(spec.minor_share_lo, spec.minor_share_hi, L)
    tot = sev_share + minor_share
    over = tot > 0.9
    sev_share = np.where(over, sev_share * 0.9 / tot, sev_share)
    minor_share = np.where(over, minor_share * 0.9 / tot, minor_share)
    # twin-paired labs (AST/ALT-style; see SyntheticSpec archetype doc):
    # adjacent-popularity pairs share ONE dedicated minor-factor direction
    # with a dominant share, so each twin is near-determined by the other
    # OBSERVED twin — the model-reachable top of the per-lab R^2 spread
    # routine-panel damping: the reference's WORST-explained labs are its
    # most common ones (platelets/MPV/monos, per-lab R^2 -0.03..0.08, MAE
    # 0.77-0.86 — idiosyncratic CBC components), so the minor share ramps
    # DOWN toward the common end; without this, common labs are the
    # easiest to explain (most data per lab) and the measured
    # very-common < common < rare stratum ordering inverts
    minor_share = minor_share * (0.45 + 0.55 * r**1.2)
    n_special = int(round(spec.special_lab_frac * L))
    n_pairs = n_special // 2
    # pair placement mirrors the reference's: one twin pair very-common
    # (AST/ALT, n=227/213 of 255 — inside its top-quartile stratum, which
    # stays low anyway because the routine panels around them are damped)
    # and one in the RARE quartile (FiO2, n=124, per-lab R^2 0.91 — the
    # single lab that carries much of the reference's rare-stratum 0.400);
    # rare pairs stay co-observed because the MNAR affinity tilt orders
    # rare panels together on sick patients
    pair_bases = (
        np.linspace(0.08 * L, 0.7 * L, n_pairs).round().astype(int)
        if n_pairs
        else np.empty(0, dtype=int)
    )
    special = np.unique(np.concatenate([pair_bases, pair_bases + 1])) if n_pairs else (
        np.empty(0, dtype=int)
    )
    if n_pairs:
        sev_share[special] = spec.special_share * 0.15
        minor_share[special] = spec.special_share * 0.85
    w_minor = rng.standard_normal((L, k - 1))
    w_minor /= np.linalg.norm(w_minor, axis=1, keepdims=True) + 1e-12
    for j, b in enumerate(pair_bases):
        e = np.zeros(k - 1)
        e[j % (k - 1)] = 1.0
        w_minor[b] = e
        w_minor[b + 1] = e
    df_lab = np.exp(
        rng.uniform(np.log(spec.noise_df_min), np.log(spec.noise_df_max), L)
    )
    # routine-panel noise is near-GAUSSIAN (platelets/MPV/-monos: MAE
    # 0.77-0.86 at RMSE ~1.08 — E|resid|/std ~ 0.74-0.8, the Gaussian
    # ratio; heavy-tailed noise would sit lower): pin the most common
    # non-archetype labs at the max dof — the top of the per-lab MAE spread
    routine = r < 0.12
    df_lab = np.where(routine, spec.noise_df_max, df_lab)
    # spike labs (CPK-style; see SyntheticSpec archetype doc): tight bulk +
    # rare condition spikes — test-stratum variance realization is spike
    # luck, the bottom of the per-lab MAE spread
    n_heavy = int(round(spec.heavy_lab_frac * L))
    heavy = np.empty(0, dtype=int)
    if n_heavy:
        # spike labs live in the RARER popularity band, as in the reference
        # (CPK n=88, troponin 100, triglycerides 53 — all in its rare
        # quartile).  Placement matters for the stratified fingerprint:
        # under the +-3-sigma guard a spike lab is a pooled-R^2 GENERATOR
        # (its targets keep the spike variance while its residuals get
        # capped), and the reference's rare-stratum 0.400 is carried by
        # exactly this composition (its spike labs + FiO2) on top of the
        # rising severity share
        candidates = np.setdiff1d(np.arange(int(0.5 * L), L), special)
        heavy = rng.choice(candidates, min(n_heavy, len(candidates)), replace=False)
        # near-zero signal: the bulk must be TIGHT for low-variance
        # realizations to exist at all
        sev_share[heavy] = sev_share[heavy] * spec.heavy_signal_scale
        minor_share[heavy] = minor_share[heavy] * spec.heavy_signal_scale
    noise_share = 1.0 - sev_share - minor_share

    # ---- cohort / demographics (severity nudges age upward) ---------------
    subject_ids = 100000 + np.arange(n)
    age = np.clip(rng.normal(63, 16, n) + 3.0 * s, 18, 90).round(1)
    gender = rng.choice(["M", "F"], size=n)
    cohort = pd.DataFrame({"SUBJECT_ID": subject_ids, "AGE": age, "GENDER": gender})

    # ---- lab ordering: severity-coupled counts + rare-lab MNAR tilt -------
    lab_item_ids = 51000 + np.arange(L)
    if spec.count_profile == "ref":
        lab_popularity = _ref_count_shares(L)
    else:
        lab_popularity = (1.0 / (np.arange(L) + 1.0)) ** 1.0
        lab_popularity /= lab_popularity.sum()
    affinity = np.outer(s, spec.rare_sev_affinity * r**1.5).astype(np.float32)
    # v2.3: the count tilt rides CLIPPED severity — the raw exp(c*s) tilt
    # on the gamma severity's unbounded tail floods the count distribution's
    # extremes (sickest patients clip at ALL labs, flooring every rare lab's
    # count at the high-degree population; the healthy side inflates the
    # 6-15 band ~3x over the reference's 1.06% edge share).  Ordering
    # still tracks severity (corr(degree, severity) pin in
    # tests/test_generator_validation.py); only the tails saturate, as the
    # reference's own tiny low/medium strata imply.
    tilt = np.exp(spec.degree_sev_coupling * np.clip(s, -0.6, 1.6))
    tilt_n = tilt / tilt.mean()
    # clipping Poisson counts at L truncates the sick tail and drags the
    # realized mean degree below target — solve a deterministic inflation
    # factor on a throwaway stream so the cohort mean stays on spec.  Brief
    # stays (v2.3) are excluded from the solve: their small fixed-mean rate
    # never clips, and the main subpopulation's target mean is raised so
    # the cohort mean stays at mean_labs_per_patient.
    rank_noise = None
    if spec.rank_noise_rare > 0:
        # twin-paired labs are EXEMPT (scale 1): their ordering is
        # clinically coupled (AST/ALT arrive on the same panel; FiO2 rides
        # the vent settings) — idiosyncratic rank noise would decorrelate
        # twin co-observation and kill the paired-lab mechanism that
        # carries the reference's rare-stratum R^2 (measured v2.3a: rare
        # 0.243 vs common 0.250 with noised twins; the conditioning twin
        # must actually be OBSERVED)
        rank_noise = 1.0 + spec.rank_noise_rare * r**1.5
        rank_noise[special] = 1.0
    shape = spec.degree_shape
    bf = spec.brief_frac
    main_mean = (spec.mean_labs_per_patient - bf * spec.brief_mean) / max(
        1.0 - bf, 1e-9
    )
    cap = L if spec.degree_cap_frac >= 1.0 else max(int(round(spec.degree_cap_frac * L)), 1)
    probe = np.random.default_rng(spec.seed ^ 0xC0FFEE)
    g_probe = probe.gamma(shape, 1.0 / shape, size=n)
    lo_c, hi_c = 1.0, 6.0
    for _ in range(40):
        mid = 0.5 * (lo_c + hi_c)
        realized = np.minimum(mid * main_mean * g_probe * tilt_n, cap).mean()
        lo_c, hi_c = (mid, hi_c) if realized < main_mean else (lo_c, mid)
    c_inflate = 0.5 * (lo_c + hi_c)
    rate = rng.gamma(shape, 1.0 / shape, size=n) * c_inflate * main_mean * tilt_n
    if bf > 0:
        # brief stays are the HEALTHY quick discharges (the reference's
        # low-degree stratum has tiny target variance: RMSE 0.437 at
        # r2 -0.26 => stratum variance ~0.15, ref evaluation_results.json
        # by_patient_degree) — draw them from the below-median-severity half
        # so their few common-panel values stay near-normal via the
        # severity-coupled noise scale
        is_brief = (rng.random(n) < 2.0 * bf) & (s < np.median(s))
        brief_rate = spec.brief_mean * rng.gamma(2.0, 0.5, size=n)
        rate = np.where(is_brief, brief_rate, rate)
    if spec.count_profile == "ref":
        # fixed-point calibration of the popularity weights: Gumbel-top-k
        # without replacement + the MNAR affinity tilt distort realized
        # counts away from the raw weights (near-universal panels saturate,
        # rare panels ride the severity tilt), so iterate
        # log-weight += log(target share) - log(realized share) on a
        # throwaway stream until the REALIZED profile matches the
        # reference histogram
        target = _ref_count_shares(L)
        logp = np.log(target)
        cal = np.random.default_rng(spec.seed ^ 0xFACADE)
        for _ in range(12):
            w = np.exp(logp)
            _, li_c = _sample_memberships(
                cal, n, L, main_mean, w / w.sum(), affinity=affinity,
                rate=rate, noise_scale=rank_noise, max_count=cap,
            )
            realized = np.bincount(li_c, minlength=L) + 1.0
            # over-relaxed multiplicative update (eta 1.5): the saturated
            # near-universal panels move only ~(target/realized) per plain
            # step and need the extra gain to converge in ~10 iterations
            logp += 1.5 * (np.log(target) - np.log(realized / realized.sum()))
        lab_popularity = np.exp(logp)
        lab_popularity /= lab_popularity.sum()
    p_idx, l_idx = _sample_memberships(
        rng,
        n,
        L,
        main_mean,
        lab_popularity,
        affinity=affinity,
        rate=rate,
        noise_scale=rank_noise,
        max_count=cap,
    )

    # ---- values: severity signal + scale-mixture minor/noise --------------
    m = np.exp(spec.hetero_noise * s)
    m = m / np.sqrt(np.mean(m**2))  # unit mean-square noise scale
    minor_part = np.einsum("ek,ek->e", u[p_idx], w_minor[l_idx])
    eps = _standardized_t(rng, df_lab[l_idx])
    # spike labs: replace their t noise with the bulk+spike mixture (see
    # SyntheticSpec archetype doc — a finite-sample t cannot concentrate
    # enough), with per-lab jittered (bulk, prob, scale) so the archetype
    # population spans the realization range; spikes skew positive
    # (condition ELEVATIONS: CPK/troponin/bilirubin rise, rarely fall).
    # They are also EXEMPT from the severity noise-scale mixture m[p]
    # (spikes are condition events, not severity-proportional), which
    # would otherwise fatten the bulk into an ordinary broad body.
    m_e = m[p_idx]
    if len(heavy):
        b_l = spec.heavy_bulk * np.exp(rng.uniform(-0.4, 0.4, len(heavy)))
        p_l = spec.heavy_spike_prob * np.exp(rng.uniform(-0.6, 0.6, len(heavy)))
        s_l = spec.heavy_spike_scale * np.exp(rng.uniform(-0.3, 0.3, len(heavy)))
        lab_to_h = np.full(L, -1)
        lab_to_h[heavy] = np.arange(len(heavy))
        hm = lab_to_h[l_idx] >= 0
        hidx = lab_to_h[l_idx[hm]]
        nh = int(hm.sum())
        bulk = rng.standard_normal(nh) * b_l[hidx]
        is_spike = rng.random(nh) < p_l[hidx]
        mag = s_l[hidx] * (0.5 + np.abs(rng.standard_normal(nh)))
        sgn = np.where(rng.random(nh) < 0.8, 1.0, -1.0)
        eps[hm] = np.where(is_spike, sgn * mag, bulk)
        m_e = np.where(hm, 1.0, m_e)
    core = (
        np.sqrt(sev_share[l_idx]) * s[p_idx]
        + m_e
        * (np.sqrt(minor_share[l_idx]) * minor_part + np.sqrt(noise_share[l_idx]) * eps)
    )
    if spec.contamination_frac > 0:
        bad = rng.random(len(core)) < spec.contamination_frac
        if len(heavy):
            # heavy labs own their tail (student-t df ~2): stacking entry-
            # error outliers on top would floor every small-stratum variance
            # realization near the contamination variance and erase the
            # CPK-like low-MAE regime the heavy labs exist to produce
            bad &= ~np.isin(l_idx, heavy)
        wild = rng.standard_normal(len(core))
        core = np.where(
            bad, core + spec.contamination_scale * np.sign(wild) * (0.5 + np.abs(wild)), core
        )

    if spec.quant_step > 0:
        # v2.3 measurement quantization (SyntheticSpec.quant_step doc): snap
        # each entry to a per-lab grid whose step is quant_step of the lab's
        # own pre-standardization SD (log-jittered x/÷2 across labs), so the
        # post-standardization grid step is ~quant_step regardless of the
        # lab's scale.  This is what bounds near-zero z-scored targets and
        # makes MAPE finite, as in the reference's real data.
        cnt_q = np.maximum(np.bincount(l_idx, minlength=L), 1).astype(np.float64)
        mean_q = np.bincount(l_idx, weights=core, minlength=L) / cnt_q
        var_q = (
            np.bincount(l_idx, weights=core**2, minlength=L) / cnt_q - mean_q**2
        )
        step = (
            spec.quant_step
            * np.sqrt(np.maximum(var_q, 1e-12))
            * np.exp(rng.uniform(-0.5, 0.5, L))
        )
        # random per-lab grid PHASE: real grids anchor at zero in RAW units
        # (mg/dL etc.), so relative to the distribution the grid sits at an
        # arbitrary offset — without this, every near-symmetric lab puts a
        # grid point essentially AT its mean and z-scored mass CONCENTRATES
        # at ~0 (measured: P(|t|<0.05) rose 0.06 -> 0.10)
        phase = rng.uniform(0.0, 1.0, L)
        raw = core.copy()
        for _ in range(4):
            core = step[l_idx] * (
                np.round(raw / step[l_idx] - phase[l_idx]) + phase[l_idx]
            )
            # near-zero-grid guard: a lab whose POST-standardization grid
            # lands a point at ~0 carries z-scored mass exactly where
            # 1/|t| explodes — one such lab moves overall MAPE by
            # hundreds of points (measured: 982% on one seed vs 159-194%
            # on its siblings; the reference's per-lab MAPE tops out at
            # 396%, so real grids evidently avoid it too).  Bump the
            # phase of offending labs and re-snap.
            cq = np.maximum(np.bincount(l_idx, minlength=L), 1).astype(np.float64)
            mq = np.bincount(l_idx, weights=core, minlength=L) / cq
            vq = np.bincount(l_idx, weights=core**2, minlength=L) / cq - mq**2
            sq = np.sqrt(np.maximum(vq, 1e-12))
            zq = np.abs(core - mq[l_idx]) / sq[l_idx]
            min_z = np.full(L, np.inf)
            np.minimum.at(min_z, l_idx, zq)
            bad = min_z < 0.04
            if not bad.any():
                break
            phase = np.where(bad, (phase + 0.23) % 1.0, phase)

    # per-lab standardization over the OBSERVED entries — exactly what the
    # reference preprocess does (z-score fitted on aggregated observed pairs,
    # src/preprocess.py:113-150), so VALUE_NORMALIZED has mean 0 / var 1 per
    # lab over the observed set despite the severity-selected sampling.
    cnt = np.bincount(l_idx, minlength=L).astype(np.float64)
    safe = np.maximum(cnt, 1.0)
    obs_mean = np.bincount(l_idx, weights=core, minlength=L) / safe
    obs_var = np.bincount(l_idx, weights=core**2, minlength=L) / safe - obs_mean**2
    obs_std = np.sqrt(np.maximum(obs_var, 1e-12))
    value_norm = (core - obs_mean[l_idx]) / obs_std[l_idx]

    lab_mean = rng.uniform(0.5, 150.0, L)
    lab_std = rng.uniform(0.05, 30.0, L)
    value_raw = value_norm * lab_std[l_idx] + lab_mean[l_idx]
    labs = pd.DataFrame(
        {
            "SUBJECT_ID": subject_ids[p_idx],
            "ITEMID": lab_item_ids[l_idx],
            "VALUE": value_raw.astype(np.float32),
            "VALUE_NORMALIZED": value_norm.astype(np.float32),
        }
    )

    # ---- diagnoses / medications: severity-loaded membership --------------
    def _membership_frame(num_items, mean_per, id_fmt, col):
        w = rng.standard_normal((num_items, k))
        w[:, 0] *= 2.0  # comorbidity burden tracks severity
        pop = (1.0 / (np.arange(num_items) + 1.0)) ** 0.8
        pop /= pop.sum()
        rr = np.arange(num_items) / max(num_items - 1, 1)
        aff = (z @ w.T * 0.5 + np.outer(s, 0.6 * rr)).astype(np.float32)
        pi, ii = _sample_memberships(
            rng, n, num_items, mean_per, pop, affinity=aff,
            rate_tilt=np.exp(0.4 * s),
        )
        names = np.array([id_fmt(i) for i in range(num_items)])
        return pd.DataFrame({"SUBJECT_ID": subject_ids[pi], col: names[ii]})

    diagnoses = _membership_frame(
        spec.num_diagnoses, spec.mean_diagnoses_per_patient,
        lambda i: f"{250 + i:03d}", "ICD3_CODE",
    )
    medications = _membership_frame(
        spec.num_medications, spec.mean_medications_per_patient,
        lambda i: f"drug_{i:03d}", "DRUG",
    )

    labitems = pd.DataFrame(
        {"ITEMID": lab_item_ids, "LABEL": [f"synthetic lab {i}" for i in range(L)]}
    )
    tables = {
        "cohort": cohort,
        "labs_normalized": labs,
        "diagnoses": diagnoses,
        "medications": medications,
        "labitems": labitems,
        "demographics": cohort.copy(),
    }
    if not return_latents:
        return tables

    # effective (post-standardization) linear model for the LMMSE ceiling
    mbar = float(m.mean())
    w_eff = np.concatenate(
        [np.sqrt(sev_share)[:, None], np.sqrt(minor_share)[:, None] * w_minor * mbar],
        axis=1,
    ) / obs_std[:, None]
    explained = np.einsum("ek,ek->e", w_eff[l_idx] * obs_std[l_idx, None], z[p_idx])
    resid = core - explained
    resid_mean = np.bincount(l_idx, weights=resid, minlength=L) / safe
    noise_var = (
        np.bincount(l_idx, weights=resid**2, minlength=L) / safe - resid_mean**2
    ) / np.maximum(obs_var, 1e-12)
    latents = SyntheticLatents(
        z=z,
        w_lab=w_eff / (np.linalg.norm(w_eff, axis=1, keepdims=True) + 1e-12),
        signal=float(np.sqrt(np.clip(1.0 - noise_var.mean(), 0.0, 1.0))),
        w_eff=w_eff,
        noise_var=noise_var,
        mean_shift=obs_mean / obs_std,
        sev_share=sev_share,
        special_labs=np.asarray(special, dtype=np.int64),
        heavy_labs=np.asarray(heavy, dtype=np.int64),
    )
    return tables, latents


def generate_synthetic_tables(
    spec: SyntheticSpec, return_latents: bool = False
) -> Dict[str, pd.DataFrame] | Tuple[Dict[str, pd.DataFrame], SyntheticLatents]:
    """Generate preprocess-contract dataframes (cohort / labs_normalized /
    diagnoses / medications / labitems / demographics).

    With ``return_latents=True`` also returns the ground-truth
    :class:`SyntheticLatents` (same tables, identical RNG stream)."""
    if spec.phenomenology == "eicu":
        return _generate_eicu_tables(spec, return_latents)
    if spec.phenomenology != "flat":
        raise ValueError(f"unknown phenomenology: {spec.phenomenology!r}")
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
