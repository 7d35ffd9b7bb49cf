"""CI pins for the calibrated real-data phenomenology generator
(data/synthetic.py ``phenomenology="eicu"``) — VERDICT round-2 item 1.

Two layers of protection:

  * data-level fingerprint (cheap, no training): the generative mechanisms
    that carry the reference's measured behavior — severity-degree coupling,
    low-degree stratum with small variance, rarity-rising severity share,
    heavy tails — are asserted directly on the generated tables;
  * the faithful-config ladder rung (one 100-epoch train on the eICU-sized
    cohort, the reference's own recipe): the trained model's guarded /
    raw / stratified numbers, measured on the pinned seeds
    (data 0 / split 42, v2.1 calibration): raw R^2 = 0.058, guarded
    R^2 = 0.223 with 2.0% capped, rare-lab R^2 0.259 > common 0.224 >
    very-common 0.201 (monotone, like the reference), guarded MAE 0.613,
    low-degree stratum R^2 -0.14 at MAE 0.436 (the reference's real-data
    values: raw-rung 0.034, guarded 0.242, 2.35% capped, rare 0.400 >
    common 0.219 > very-common 0.218, MAE 0.609, low-degree -0.26 at
    0.348).  Floors carry margin for float-platform jitter only — the run
    is deterministic given seeds.

Cross-seed replication lives in outputs/diagnostics/
generator_validation_ds{1,2}.json (scripts/validate_generator.py).
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
    # near-normal values with small spread (the reference's low-MAE stratum)
    deg_e = deg[p]
    low, high = v[deg_e <= 5], v[deg_e >= 16]
    assert low.var() < 0.5 < high.var()

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
    cohort.  Measured here (v2.1): raw 0.058 / guarded 0.223 / capped 2.0% /
    rare 0.341 > common 0.259 / guarded MAE 0.609."""
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

    # the guarded headline and the guard jump (raw-rung vs guarded rung)
    assert wins["r2"] >= 0.19, f"guarded R^2 regressed: {wins['r2']:.4f}"
    assert wins["mae"] <= 0.66, f"guarded MAE regressed: {wins['mae']:.4f}"
    assert raw["r2"] <= wins["r2"] - 0.12, (
        f"winsorization jump collapsed: raw {raw['r2']:.4f} vs "
        f"guarded {wins['r2']:.4f}"
    )
    # guard rate in the reference's regime (2.35% there)
    assert 0.005 <= capped / len(te_v) <= 0.05

    # stratified fingerprint: rare labs beat common (reference: 0.400>0.219)
    all_l = np.concatenate([masker.split_arrays(s)[1] for s in ("train", "val", "test")])
    lab_counts = np.bincount(all_l, minlength=bundle.graph.num_nodes(LAB))
    strat = stratify_by_lab_frequency(preds_w, te_v, te_l, lab_counts)
    assert strat["rare (bottom 25%)"]["r2"] > strat["common (middle 50%)"]["r2"]


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


def test_conformal_coverage_on_validated_cohort(eicu_real_tables):
    """Conformal intervals deliver their guarantee ON the heavy-tailed
    phenomenology while the Gaussian interval mis-calibrates — the
    measured result of scripts/conformal_quality.py
    (outputs/diagnostics/conformal_quality_v1.json), pinned at the
    closed-form epoch-0 robust plant (deterministic given seeds; measured
    coverage 0.8946 @ 90%, 0.7907 @ 80%; Gaussian 0.8744 @ the 80% target
    with 1.32x the width)."""
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
