"""Split-conformal intervals: quantile math, coverage, serving round-trip."""

import math

import numpy as np
import pytest

from multi_modal_gnn_tpu.evaluation.conformal import (
    ConformalCalibrator,
    calibrate_from_trainer,
    conformal_quantile,
)


# ---------------------------------------------------------------- pure math


def test_conformal_quantile_is_corrected_order_statistic():
    rng = np.random.default_rng(0)
    for n in (10, 20, 101):
        scores = rng.exponential(size=n)
        for alpha in (0.05, 0.1, 0.25):
            k = math.ceil((n + 1) * (1 - alpha))
            expect = float("inf") if k > n else float(np.sort(scores)[k - 1])
            assert conformal_quantile(scores, alpha) == expect


def test_conformal_quantile_small_n_is_inf():
    # n=5 cannot certify alpha=0.1 (needs ceil(6*0.9)=6 > 5)
    assert conformal_quantile(np.ones(5), 0.1) == float("inf")
    assert conformal_quantile(np.array([]), 0.1) == float("inf")


def test_fit_rejects_uncertifiable_alpha():
    with pytest.raises(ValueError):
        ConformalCalibrator.fit(np.zeros(5), np.zeros(5), np.zeros(5, int), 2, alpha=0.1)
    with pytest.raises(ValueError):
        ConformalCalibrator.fit(np.zeros(50), np.zeros(50), np.zeros(50, int), 2, alpha=1.5)


# ------------------------------------------------------- calibration behavior


def _two_scale_problem(n_per_lab=2000, scales=(0.1, 1.0), seed=0):
    rng = np.random.default_rng(seed)
    labs, preds, targets = [], [], []
    for lab, s in enumerate(scales):
        mu = rng.normal(size=n_per_lab)
        labs.append(np.full(n_per_lab, lab))
        preds.append(mu)
        targets.append(mu + s * rng.normal(size=n_per_lab))
    return (
        np.concatenate(preds),
        np.concatenate(targets),
        np.concatenate(labs),
        len(scales),
    )


def test_per_lab_radii_adapt_to_residual_scale():
    preds, targets, labs, n_labs = _two_scale_problem()
    cal = ConformalCalibrator.fit(preds, targets, labs, n_labs, alpha=0.1)
    # lab 0 has 10x smaller noise -> much tighter interval
    assert cal.q_lab[0] < cal.q_lab[1] / 5
    # radii approximate the noise-scale * z_{0.95}
    assert cal.q_lab[1] == pytest.approx(1.645, rel=0.1)


def test_small_labs_fall_back_to_global_radius():
    preds, targets, labs, n_labs = _two_scale_problem(n_per_lab=500)
    # add a 5-sample lab 2 with tiny residuals: must NOT get its own radius
    preds = np.concatenate([preds, np.zeros(5)])
    targets = np.concatenate([targets, 1e-3 * np.ones(5)])
    labs = np.concatenate([labs, np.full(5, 2)])
    cal = ConformalCalibrator.fit(preds, targets, labs, 3, alpha=0.1, min_per_lab=30)
    assert cal.q_lab[2] == cal.q_global
    assert cal.cal_counts[2] == 5


def test_marginal_coverage_on_exchangeable_split():
    # calibrate on one half, measure on the other: coverage ~ 1 - alpha
    preds, targets, labs, n_labs = _two_scale_problem(n_per_lab=4000, seed=3)
    rng = np.random.default_rng(7)
    perm = rng.permutation(len(preds))
    cal_idx, test_idx = perm[: len(perm) // 2], perm[len(perm) // 2 :]
    cal = ConformalCalibrator.fit(
        preds[cal_idx], targets[cal_idx], labs[cal_idx], n_labs, alpha=0.1
    )
    out = cal.evaluate(preds[test_idx], targets[test_idx], labs[test_idx])
    assert 0.88 <= out["coverage"] <= 0.93
    # per-lab (Mondrian) calibration gives per-lab coverage too
    assert out["per_lab_min_coverage"] >= 0.87
    assert out["mean_width"] > 0
    lo, hi = cal.intervals(preds[test_idx], labs[test_idx])
    assert np.all(lo <= preds[test_idx]) and np.all(preds[test_idx] <= hi)


def test_roundtrip_serialization(tmp_path):
    preds, targets, labs, n_labs = _two_scale_problem(n_per_lab=200)
    cal = ConformalCalibrator.fit(preds, targets, labs, n_labs, alpha=0.2)
    p = tmp_path / "conformal.json"
    cal.save(p)
    back = ConformalCalibrator.load(p)
    assert back.alpha == cal.alpha
    np.testing.assert_array_equal(back.q_lab, cal.q_lab)
    np.testing.assert_array_equal(back.cal_counts, cal.cal_counts)
    assert back.min_per_lab == cal.min_per_lab


# ------------------------------------------------------------- integration


def _train_briefly(bundle, cfg, epochs=3):
    from multi_modal_gnn_tpu.models.factory import build_model
    from multi_modal_gnn_tpu.training.masker import EdgeMasker
    from multi_modal_gnn_tpu.training.trainer import Trainer

    masker = EdgeMasker(bundle.graph, seed=cfg.train.seed)
    model = build_model(cfg, bundle.graph)
    trainer = Trainer(model, bundle.graph, masker, cfg)
    for _ in range(epochs):
        trainer.train_epoch()
    return trainer


def test_evaluate_model_emits_conformal_block(tiny_bundle, config, tmp_path):
    from multi_modal_gnn_tpu.evaluation.evaluate import evaluate_model

    trainer = _train_briefly(tiny_bundle, config)
    results = evaluate_model(trainer, tiny_bundle, config, output_dir=tmp_path)
    conf = results["conformal"]
    assert conf["target_coverage"] == pytest.approx(0.9)
    # guarantee is marginal over calibration draws; on one tiny cohort allow slack
    assert 0.8 <= conf["coverage"] <= 1.0
    assert conf["mean_width"] > 0
    assert (tmp_path / "conformal.json").exists()
    import json

    saved = json.loads((tmp_path / "evaluation_results.json").read_text())
    assert saved["conformal"]["coverage"] == pytest.approx(conf["coverage"])


def test_evaluate_model_conformal_disabled(tiny_bundle, config):
    import dataclasses

    from multi_modal_gnn_tpu.evaluation.evaluate import evaluate_model

    cfg = config.replace(
        evaluation=dataclasses.replace(config.evaluation, extras={"conformal_alpha": None})
    )
    trainer = _train_briefly(tiny_bundle, cfg)
    results = evaluate_model(trainer, tiny_bundle, cfg)
    assert "conformal" not in results


def test_inference_reports_carry_intervals(tiny_bundle, config, tmp_path):
    from multi_modal_gnn_tpu.inference import run_inference

    trainer = _train_briefly(tiny_bundle, config)
    result = run_inference(config, tiny_bundle, trainer, tmp_path, num_examples=3)
    assert result["summary"]["interval_alpha"] == pytest.approx(0.1)
    masked = [
        info
        for ex in result["examples"]
        for info in ex["masked_labs"].values()
    ]
    missing = [
        info
        for ex in result["examples"]
        for info in ex["truly_missing_labs"].values()
    ]
    for info in masked + missing:
        lo, hi = info["normalized_interval"]
        assert lo <= info["normalized_predicted"] <= hi
        dlo, dhi = info["interval"]
        assert dlo <= dhi
    if masked:
        cov = result["summary"]["interval_coverage_on_masked"]
        assert 0.0 <= cov <= 1.0


def test_serving_interval_roundtrip(tiny_bundle, config, tmp_path):
    from multi_modal_gnn_tpu.serving import ServingModel, export_serving

    trainer = _train_briefly(tiny_bundle, config)
    cal = calibrate_from_trainer(trainer, alpha=0.2)
    export_serving(trainer, tiny_bundle, tmp_path, buckets=(128,), conformal=cal)
    served = ServingModel.load(tmp_path)

    rng = np.random.default_rng(0)
    p = rng.integers(0, tiny_bundle.graph.num_nodes("patient"), 60).astype(np.int32)
    l = rng.integers(0, tiny_bundle.graph.num_nodes("lab"), 60).astype(np.int32)
    preds, lo, hi = served.predict(p, l, return_interval=True)
    np.testing.assert_allclose(preds, served.predict(p, l), rtol=1e-6)
    assert np.all(lo <= preds) and np.all(preds <= hi)
    np.testing.assert_allclose(hi - lo, 2 * cal.q_lab[l], rtol=1e-6)

    # denormalized bounds scale by the per-lab std and stay ordered
    pd_, lod, hid = served.predict(p, l, denormalize=True, return_interval=True)
    assert np.all(lod <= pd_) and np.all(pd_ <= hid)
    np.testing.assert_allclose(
        hid - lod, (hi - lo) * served._denorm_std[l], rtol=1e-6
    )

    # artifact without calibration refuses interval requests
    export_serving(trainer, tiny_bundle, tmp_path / "plain", buckets=(128,))
    plain = ServingModel.load(tmp_path / "plain")
    with pytest.raises(ValueError, match="conformal"):
        plain.predict(p, l, return_interval=True)


def test_cold_start_calibration_sideinfo_variant(tiny_bundle, config):
    """calibrate_cold_start routes through the side-info fold-in when given
    the membership matrix — radii finite, per-lab gather works."""
    from multi_modal_gnn_tpu.evaluation.baselines import SideInfoALSBaseline
    from multi_modal_gnn_tpu.evaluation.conformal import calibrate_cold_start
    from multi_modal_gnn_tpu.training.masker import EdgeMasker
    from multi_modal_gnn_tpu.training.warmstart import bundle_membership_matrix

    masker = EdgeMasker(tiny_bundle.graph, seed=config.train.seed)
    n_pat = tiny_bundle.graph.num_nodes("patient")
    n_lab = tiny_bundle.graph.num_nodes("lab")
    tr_p, tr_l, tr_v = masker.split_arrays("train")
    memberships = bundle_membership_matrix(tiny_bundle)
    si = SideInfoALSBaseline(n_pat, n_lab, rank=4, reg=8.0).fit(
        tr_v, tr_p, tr_l, memberships
    )
    cal = calibrate_cold_start(
        si, masker, n_lab, alpha=0.2, memberships=memberships
    )
    assert np.all(np.isfinite(cal.q_lab)) and cal.q_global > 0
    lo, hi = cal.intervals(np.zeros(5), np.arange(5) % n_lab)
    assert np.all(lo < hi)


def test_uncertainty_visualizations(tiny_bundle, config, tmp_path):
    from multi_modal_gnn_tpu.viz import run_uncertainty_visualizations

    trainer = _train_briefly(tiny_bundle, config)
    out = run_uncertainty_visualizations(config, tiny_bundle, trainer, tmp_path)
    assert out is not None
    for name in (
        "interval_width_per_lab.png",
        "coverage_per_lab.png",
        "coverage_calibration.png",
    ):
        f = out / name
        assert f.exists() and f.stat().st_size > 5_000, name


def test_cold_start_interval_roundtrip(tiny_bundle, config, tmp_path):
    from multi_modal_gnn_tpu.evaluation.baselines import ALSBaseline
    from multi_modal_gnn_tpu.evaluation.conformal import calibrate_cold_start
    from multi_modal_gnn_tpu.serving import ServingModel, export_serving

    trainer = _train_briefly(tiny_bundle, config)
    n_pat = tiny_bundle.graph.num_nodes("patient")
    n_lab = tiny_bundle.graph.num_nodes("lab")
    tr_p, tr_l, tr_v = trainer.masker.split_arrays("train")
    als = ALSBaseline(n_pat, n_lab, rank=4, reg=8.0).fit(tr_v, tr_p, tr_l)
    cold_cal = calibrate_cold_start(als, trainer.masker, n_lab, alpha=0.2)

    # the calibration simulates the fold-in request: radii cover fold-in
    # residuals on the exchangeable test split at ~the target level
    _, te_l_all, te_v_all = trainer.masker.split_arrays("test")
    te_p_all = trainer.masker.split_arrays("test")[0]
    covered = []
    order = np.argsort(tr_p, kind="stable")
    tr_p_s, tr_l_s, tr_v_s = tr_p[order], tr_l[order], tr_v[order]
    for pid in np.unique(te_p_all):
        q = te_p_all == pid
        lo_i = np.searchsorted(tr_p_s, pid, "left")
        hi_i = np.searchsorted(tr_p_s, pid, "right")
        preds = als.predict_cold_start(
            tr_l_s[lo_i:hi_i], tr_v_s[lo_i:hi_i], te_l_all[q]
        )
        r = cold_cal.radius(te_l_all[q])
        covered.extend((np.abs(preds - te_v_all[q]) <= r).tolist())
    assert 0.7 <= float(np.mean(covered)) <= 0.95

    export_serving(
        trainer, tiny_bundle, tmp_path, buckets=(128,),
        cold_start=als, conformal_cold=cold_cal,
    )
    served = ServingModel.load(tmp_path)
    out = served.predict_cold_start({0: -0.4, 2: 1.1}, return_interval=True)
    for entry in out.values():
        lo, hi = entry["interval"]
        assert lo <= entry["predicted"] <= hi
    # without the cold calibrator the request is refused
    export_serving(
        trainer, tiny_bundle, tmp_path / "plain", buckets=(128,), cold_start=als
    )
    with pytest.raises(ValueError, match="conformal_cold"):
        ServingModel.load(tmp_path / "plain").predict_cold_start(
            {0: 0.0}, return_interval=True
        )
    # conformal_cold without cold_start factors is an export-time error
    with pytest.raises(ValueError, match="cold_start"):
        export_serving(
            trainer, tiny_bundle, tmp_path / "bad", buckets=(128,),
            conformal_cold=cold_cal,
        )
