"""CI pins for the calibrated real-data phenomenology generator
(data/synthetic.py ``phenomenology="eicu"``) — VERDICT round-2 item 1;
v2.2 calibration (round 4): per-lab MAE spread archetypes (twin pairs,
spike labs, Gaussian routine panels — SyntheticSpec archetype doc);
v2.3 calibration (round 5, VERDICT r4 weak #1/#2/#3/#7): reference-matched
per-lab count profile, per-lab value quantization (the finite-MAPE
mechanism), brief-stay low-degree stratum, rare>common margin held on data
seeds 0-2 (outputs/diagnostics/generator_validation_v23h_ds*.json).

Two layers of protection:

  * data-level fingerprint (cheap, no training): the generative mechanisms
    that carry the reference's measured behavior — severity-degree coupling,
    low-degree stratum with small variance, rarity-rising severity share,
    heavy tails — are asserted directly on the generated tables (variance
    comparisons on +-3-clipped values: the v2.2 spike labs make small-
    stratum RAW variance a realization lottery by design);
  * the faithful-config ladder rung (one 100-epoch train on the eICU-sized
    cohort, the reference's own recipe): the trained model's guarded /
    raw / stratified numbers, measured on the pinned seeds
    (data 0 / split 42, v2.3 calibration,
    outputs/diagnostics/generator_validation_v23h_ds0.json): raw
    R^2 = 0.0556, guarded R^2 = 0.2766 with 1.91% capped, MAPE 124%,
    rare-lab R^2 0.328 > common 0.281 (margin +0.047; +0.020/+0.027 on
    data seeds 1/2), guarded MAE 0.5670, per-lab MAE 0.17-0.73 std 0.117
    (the reference's real-data values: raw-rung 0.034, guarded 0.2419,
    2.35% capped, MAPE 167.2%, rare 0.400 > common 0.219, MAE 0.6087,
    per-lab MAE 0.138-0.856 std 0.191).  The guarded level swings
    0.277-0.413 across data seeds (9k-edge test realization + spike-draw
    luck), so floors sit under the weakest seed; cross-platform jitter is
    ~0.0005 (v2.2 record).

Cross-seed replication lives in outputs/diagnostics/
generator_validation_v23h_ds{0,1,2}.json (scripts/validate_generator.py).
"""

import dataclasses

import numpy as np
import pytest

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, generate_synthetic_tables
from multi_modal_gnn_tpu.evaluation.metrics import (
    compute_regression_metrics,
    stratify_by_lab_frequency,
    winsorize_residuals,
)
from multi_modal_gnn_tpu.graph.build import build_heterogeneous_graph
from multi_modal_gnn_tpu.graph.schema import LAB
from multi_modal_gnn_tpu.models.factory import build_model
from multi_modal_gnn_tpu.training.masker import EdgeMasker
from multi_modal_gnn_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def eicu_real_tables():
    spec = SyntheticSpec.eicu_real(seed=0)
    return spec, *generate_synthetic_tables(spec, return_latents=True)


def test_data_fingerprint(eicu_real_tables):
    spec, tables, lat = eicu_real_tables
    labs = tables["labs_normalized"]
    v = labs["VALUE_NORMALIZED"].to_numpy().astype(np.float64)
    p = labs["SUBJECT_ID"].to_numpy() - 100000
    l = labs["ITEMID"].to_numpy() - 51000

    # cohort shape: ~61k edges, mean degree ~33.5 (reference README.md:88-109)
    assert abs(len(labs) / spec.num_patients - 33.5) < 4.0

    # per-lab standardization contract: mean ~0 / var ~1 over observed entries
    for lab in (0, spec.num_labs // 2, spec.num_labs - 1):
        m = l == lab
        assert abs(v[m].mean()) < 1e-6 and abs(v[m].var() - 1.0) < 1e-5

    # severity-degree coupling: sicker patients get more labs
    deg = np.bincount(p, minlength=spec.num_patients)
    sev = lat.z[:, 0]
    assert np.corrcoef(deg, sev)[0, 1] > 0.3

    # degree-stratified variance: the low-degree stratum is healthy ->
    # near-normal values with small spread (the reference's low-MAE
    # stratum).  Compared on +-3-clipped values: the low stratum's RAW
    # variance is a spike-realization lottery under the spike labs (one
    # 8-sigma draw moves it by ~0.3), while the clipped statistic is
    # stable (v2.3 seed 0: 0.476 vs high 0.744; the ~100-entry brief-stay
    # stratum still swings 0.27-0.65 across seeds)
    deg_e = deg[p]
    vc = np.clip(v, -3, 3)
    low, high = vc[deg_e <= 5], vc[deg_e >= 16]
    assert low.var() < 0.55 < high.var()

    # v2.3 count-profile pin: the sorted per-lab count shares match the
    # reference's own measured histogram (ref outputs/per_lab_metrics.csv
    # num_samples; VERDICT r4 item 2) — measured RMSE 4.4e-4 across seeds
    from multi_modal_gnn_tpu.data.synthetic import _ref_count_shares

    cnt = np.bincount(l, minlength=spec.num_labs)
    share = np.sort(cnt)[::-1] / cnt.sum()
    assert float(np.sqrt(((share - _ref_count_shares(spec.num_labs)) ** 2).mean())) < 2e-3

    # v2.3 quantization pin: z-scored targets live on per-lab grids with no
    # near-zero point (the finite-MAPE mechanism; measured E[1/|t|] 4.3-4.5
    # vs the v2.2 continuum's 21-40, min grid |t| 0.040-0.044)
    assert float(np.mean(1.0 / np.maximum(np.abs(v), 1e-9))) < 10.0
    min_z = np.full(spec.num_labs, np.inf)
    np.minimum.at(min_z, l, np.abs(v))
    assert float(min_z.min()) >= 0.03

    # rarity-rising severity share: rare labs track severity more
    cnt = np.bincount(l, minlength=spec.num_labs)
    q25, q75 = np.percentile(cnt, 25), np.percentile(cnt, 75)
    rare, vcom = cnt[l] < q25, cnt[l] > q75
    c2 = lambda m: np.corrcoef(v[m], sev[p[m]])[0, 1] ** 2  # noqa: E731
    assert c2(rare) > c2(vcom) + 0.05

    # heavy tails (scale mixture + student-t + contamination)
    kurt = ((v - v.mean()) ** 4).mean() / v.var() ** 2 - 3
    assert kurt > 4.0


def test_flat_mode_unchanged():
    """The flat generator is bit-identical to rounds 1-2 (every quality pin
    depends on its RNG stream): spot-check a stable statistic."""
    t = generate_synthetic_tables(SyntheticSpec.tiny(seed=3))
    v = t["labs_normalized"]["VALUE_NORMALIZED"].to_numpy()
    assert len(v) == 760
    np.testing.assert_allclose(float(v.mean()), -0.0125962, atol=1e-5)


def test_faithful_ladder_rung(eicu_real_tables):
    """The faithful architecture + the reference's own recipe (100 epochs,
    MAE loss, plateau scheduler, gate@6, inverse-variance lab weights)
    reproduces the reference's measured fingerprint on the calibrated
    cohort.  Measured here (v2.3, seed 0): raw 0.0556 / guarded 0.2766 /
    capped 1.91% / rare 0.328 > common 0.281 / guarded MAE 0.5670 / MAPE
    124% / per-lab MAE std 0.117 (reference: 0.034 / 0.2419 / 2.35% /
    0.400 > 0.219 / 0.6087 / 167.2% / 0.191)."""
    spec, tables, _ = eicu_real_tables
    config = Config()
    bundle = build_heterogeneous_graph(
        labs=tables["labs_normalized"],
        diagnoses=tables["diagnoses"],
        medications=tables["medications"],
        cohort=tables["cohort"],
        labitems=tables["labitems"],
        config=config,
    )
    tc = dataclasses.replace(config.train, epochs=100, scan_chunk=10)
    cfg = dataclasses.replace(config, train=tc)
    masker = EdgeMasker(bundle.graph, seed=42, host_edges=bundle.patient_lab_host())
    trainer = Trainer(build_model(cfg, bundle.graph), bundle.graph, masker, cfg)
    trainer.fit(scan_chunk=10)
    best = trainer.best_state if trainer.best_state is not None else trainer.state
    te_p, te_l, te_v = masker.split_arrays("test")
    preds = trainer.predict("test", state=best).astype(np.float64)

    raw = compute_regression_metrics(preds, te_v)
    preds_w, capped = winsorize_residuals(preds, te_v, te_l, sigma=3.0)
    wins = compute_regression_metrics(preds_w, te_v)

    # the guarded headline and the guard jump (raw-rung vs guarded rung);
    # v2.3 seed-0 measured: guarded 0.2766 / MAE 0.5670 / raw 0.0556
    # (3-seed guarded band 0.277-0.413 — the 9k-edge test realization swings
    # with spike-draw luck, so the floor sits under the weakest seed);
    # cross-platform jitter measured ~0.0005 (module docstring)
    assert wins["r2"] >= 0.25, f"guarded R^2 regressed: {wins['r2']:.4f}"
    assert wins["mae"] <= 0.60, f"guarded MAE regressed: {wins['mae']:.4f}"
    assert raw["r2"] <= wins["r2"] - 0.15, (
        f"winsorization jump collapsed: raw {raw['r2']:.4f} vs "
        f"guarded {wins['r2']:.4f}"
    )
    # guard rate in the reference's regime (2.35% there; 1.91% measured)
    assert 0.005 <= capped / len(te_v) <= 0.05

    # the MAPE fingerprint (VERDICT r4 weak #2): the reference measures
    # 167.18% on real data; the v2.2 continuum generator landed 2693%
    # because near-zero z-scored targets had full density — v2.3's per-lab
    # quantization grids bound it (measured 121-124% across seeds)
    assert 100.0 <= wins["mape"] <= 500.0, f"MAPE fingerprint: {wins['mape']:.0f}%"

    # stratified fingerprint (VERDICT r4 weak #7): rare labs beat common
    # WITH MARGIN (reference: 0.400 > 0.219; v2.3 margins +0.047/+0.020/
    # +0.027 on data seeds 0-2, generator_validation_v23h_ds*.json)
    all_l = np.concatenate([masker.split_arrays(s)[1] for s in ("train", "val", "test")])
    lab_counts = np.bincount(all_l, minlength=bundle.graph.num_nodes(LAB))
    strat = stratify_by_lab_frequency(preds_w, te_v, te_l, lab_counts)
    assert (
        strat["rare (bottom 25%)"]["r2"]
        >= strat["common (middle 50%)"]["r2"] + 0.02
    ), (strat["rare (bottom 25%)"]["r2"], strat["common (middle 50%)"]["r2"])

    # per-lab MAE spread (VERDICT r3 item 2 / r4 weak #1): v2.3 measured
    # min 0.17 / max 0.73 / std 0.117 on seed 0 (v2.2: 0.205/0.738/0.111;
    # reference 0.138/0.856/0.191); floors leave realization margin
    from multi_modal_gnn_tpu.evaluation.metrics import compute_per_lab_metrics

    per_lab = compute_per_lab_metrics(preds_w, te_v, te_l)
    mae_arr = np.asarray(per_lab["mae"])
    assert float(mae_arr.std()) >= 0.09, f"per-lab MAE std collapsed: {mae_arr.std():.3f}"
    assert float(mae_arr.min()) <= 0.25, f"low-MAE archetypes gone: min {mae_arr.min():.3f}"
    assert float(mae_arr.max()) >= 0.65, f"high-MAE routine panels gone: max {mae_arr.max():.3f}"


def test_huber_sideinfo_channel_beats_faithful(eicu_real_tables):
    """The framework's robust quality channel on the validated cohort
    (beyond-reference): Huber-IRLS side-info plant (baselines.py
    huber_delta) reaches epoch-0 raw R^2 = 0.103 = 88% of the conditional
    LMMSE ceiling (0.117), guarded 0.27 after an MAE fine-tune — above the
    faithful recipe's 0.223 (generator_validation_channels_huber.json).
    Pinned at the closed-form epoch-0 plant (deterministic given seeds):
    raw >= 0.08, and strictly above the plain least-squares plant, which
    heavy tails break (measured -0.02 raw)."""
    spec, tables, _ = eicu_real_tables
    config = Config()
    bundle = build_heterogeneous_graph(
        labs=tables["labs_normalized"],
        diagnoses=tables["diagnoses"],
        medications=tables["medications"],
        cohort=tables["cohort"],
        labitems=tables["labitems"],
        config=config,
    )
    cfg = dataclasses.replace(
        config,
        model=dataclasses.replace(
            config.model,
            edge_head=dataclasses.replace(
                config.model.edge_head,
                extras={"bilinear_rank": 17, "bilinear_source": "embedding"},
            ),
        ),
    )
    from multi_modal_gnn_tpu.training.warmstart import (
        bundle_membership_matrix,
        warm_start_trainer,
    )

    masker = EdgeMasker(bundle.graph, seed=42, host_edges=bundle.patient_lab_host())
    _, _, te_v = masker.split_arrays("test")
    memberships = bundle_membership_matrix(bundle)

    def plant_r2(huber_delta):
        trainer = Trainer(build_model(cfg, bundle.graph), bundle.graph, masker, cfg)
        warm_start_trainer(
            trainer, rank=8, reg=12.0, memberships=memberships,
            huber_delta=huber_delta,
        )
        return compute_regression_metrics(
            trainer.predict("test").astype(np.float64), te_v
        )["r2"]

    r2_huber = plant_r2(0.7)
    r2_plain = plant_r2(None)
    assert r2_huber >= 0.08, f"huber side-info plant regressed: {r2_huber:.4f}"
    assert r2_huber > r2_plain + 0.03, (r2_huber, r2_plain)


def test_cold_start_conformal_on_validated_cohort(eicu_real_tables):
    """VERDICT r3 item 4(b)/(c): cold-start (ALS fold-in) conformal
    coverage on the heavy-tailed cohort, pinned in CI with the STRICT
    calibration split — and the finite-sample worst-lab Beta bound pinned
    alongside the marginal rate (a marginal-only pin would pass even with
    several labs' radii badly wrong in opposite directions)."""
    spec, tables, _ = eicu_real_tables
    config = Config()
    bundle = build_heterogeneous_graph(
        labs=tables["labs_normalized"],
        diagnoses=tables["diagnoses"],
        medications=tables["medications"],
        cohort=tables["cohort"],
        labitems=tables["labitems"],
        config=config,
    )
    from multi_modal_gnn_tpu.evaluation.baselines import ALSBaseline
    from multi_modal_gnn_tpu.evaluation.conformal import calibrate_cold_start
    from multi_modal_gnn_tpu.graph.schema import PATIENT

    masker = EdgeMasker(
        bundle.graph, seed=42, host_edges=bundle.patient_lab_host(),
        calibration_split=0.5,
    )
    nP, nL = bundle.graph.num_nodes(PATIENT), bundle.graph.num_nodes(LAB)
    tr_p, tr_l, tr_v = masker.split_arrays("train")
    als = ALSBaseline(nP, nL, rank=8, reg=12.0, huber_delta=0.7).fit(tr_v, tr_p, tr_l)
    cal = calibrate_cold_start(als, masker, nL, alpha=0.1)

    # simulate the serving request on the held-out test split
    te_p, te_l, te_v = masker.split_arrays("test")
    order = np.argsort(tr_p, kind="stable")
    tr_p_s, tr_l_s, tr_v_s = tr_p[order], tr_l[order], tr_v[order]
    preds = np.empty(len(te_v))
    for pid in np.unique(te_p):
        q = te_p == pid
        lo = np.searchsorted(tr_p_s, pid, "left")
        hi = np.searchsorted(tr_p_s, pid, "right")
        preds[q] = als.predict_cold_start(tr_l_s[lo:hi], tr_v_s[lo:hi], te_l[q])
    out = cal.evaluate(preds, te_v, te_l)
    assert 0.87 <= out["coverage"] <= 0.93, out["coverage"]
    # the finite-sample promise: every own-radius lab certifies >= 0.8
    # conditional coverage with 95% confidence (Beta(k, n+1-k) quantile)
    assert out["worst_lab_coverage_bound"] >= 0.80, out["worst_lab_coverage_bound"]
    assert out["global_coverage_bound"] >= 0.885, out["global_coverage_bound"]


def test_conformal_coverage_on_validated_cohort(eicu_real_tables):
    """Conformal intervals deliver their guarantee ON the heavy-tailed
    phenomenology while the Gaussian interval mis-calibrates — the
    measured result of scripts/conformal_quality.py
    (outputs/diagnostics/conformal_quality_v2.json), pinned at the
    closed-form epoch-0 robust plant (deterministic given seeds; v2.2
    cohort measured: coverage 0.8936 @ 90%, 0.7958 @ 80%; Gaussian
    0.8756 @ the 80% target with 1.35x the width)."""
    spec, tables, _ = eicu_real_tables
    config = Config()
    bundle = build_heterogeneous_graph(
        labs=tables["labs_normalized"],
        diagnoses=tables["diagnoses"],
        medications=tables["medications"],
        cohort=tables["cohort"],
        labitems=tables["labitems"],
        config=config,
    )
    cfg = dataclasses.replace(
        config,
        model=dataclasses.replace(
            config.model,
            edge_head=dataclasses.replace(
                config.model.edge_head,
                extras={"bilinear_rank": 17, "bilinear_source": "embedding"},
            ),
        ),
    )
    from multi_modal_gnn_tpu.evaluation.conformal import ConformalCalibrator
    from multi_modal_gnn_tpu.training.warmstart import (
        bundle_membership_matrix,
        warm_start_trainer,
    )

    masker = EdgeMasker(bundle.graph, seed=42, host_edges=bundle.patient_lab_host())
    _, va_l, va_v = masker.split_arrays("val")
    _, te_l, te_v = masker.split_arrays("test")
    trainer = Trainer(build_model(cfg, bundle.graph), bundle.graph, masker, cfg)
    warm_start_trainer(
        trainer, rank=8, reg=12.0,
        memberships=bundle_membership_matrix(bundle), huber_delta=0.7,
    )
    val_pred = trainer.predict("val").astype(np.float64)
    te_pred = trainer.predict("test").astype(np.float64)
    num_labs = bundle.graph.num_nodes(LAB)

    for alpha, lo, hi in ((0.1, 0.87, 0.92), (0.2, 0.77, 0.83)):
        cal = ConformalCalibrator.fit(val_pred, va_v, va_l, num_labs, alpha=alpha)
        out = cal.evaluate(te_pred, te_v, te_l)
        assert lo <= out["coverage"] <= hi, (alpha, out["coverage"])

    # the Gaussian pred +/- z*sigma interval over-covers the 80% target by
    # > 5 points AND is > 1.2x wider — the tails inflate sigma
    cal80 = ConformalCalibrator.fit(val_pred, va_v, va_l, num_labs, alpha=0.2)
    sigma = float(np.std(val_pred - va_v))
    g_radius = 1.2816 * sigma
    g_cov = float(np.mean(np.abs(te_pred - te_v) <= g_radius))
    assert g_cov >= 0.85, g_cov
    assert 2 * g_radius >= 1.2 * cal80.evaluate(te_pred, te_v, te_l)["mean_width"]
