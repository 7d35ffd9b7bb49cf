"""Round-4 pins: config-routed synthetic presets, strict conformal
calibration split, finite-sample coverage bounds, cold-start coverage,
and the pipeline's conformal-failure reporting (VERDICT round-3 items
1, 4, 8 + ADVICE items)."""

import dataclasses
import logging

import numpy as np
import pytest

from multi_modal_gnn_tpu.config import Config, ConfigError
from multi_modal_gnn_tpu.data.synthetic import (
    SyntheticSpec,
    generate_synthetic_tables,
    make_synthetic_bundle,
    spec_from_config,
)
from multi_modal_gnn_tpu.evaluation.conformal import (
    ConformalCalibrator,
    beta_coverage_quantile,
    calibrate_from_trainer,
    min_per_lab_for_bound,
)
from multi_modal_gnn_tpu.training.masker import EdgeMasker


def _with_synthetic(cfg: Config, block) -> Config:
    return cfg.replace(data=dataclasses.replace(cfg.data, extras={"synthetic": block}))


# ------------------------------------------------- config-routed generator


class TestSpecFromConfig:
    def test_default_is_flat_eicu_demo(self, config):
        spec = spec_from_config(config)
        assert spec == SyntheticSpec.eicu_demo()
        assert spec.phenomenology == "flat"

    def test_preset_dispatch(self, config):
        for name, expect in (
            ("eicu_real", SyntheticSpec.eicu_real()),
            ("tiny", SyntheticSpec.tiny()),
            ("scale_100k", SyntheticSpec.scale_100k()),
            ("mimic_scale", SyntheticSpec.mimic_scale()),
        ):
            assert spec_from_config(_with_synthetic(config, {"preset": name})) == expect

    def test_field_overrides_with_yaml_type_coercion(self, config):
        spec = spec_from_config(
            _with_synthetic(
                config,
                # YAML-typical: int where the field is float, and vice versa
                {"preset": "tiny", "seed": 7, "num_patients": 64,
                 "mean_labs_per_patient": 5, "special_share": 0.5},
            )
        )
        assert spec.seed == 7 and spec.num_patients == 64
        assert spec.mean_labs_per_patient == 5.0
        assert isinstance(spec.mean_labs_per_patient, float)
        assert spec.special_share == 0.5

    def test_unknown_key_and_bad_preset_rejected(self, config):
        with pytest.raises(ConfigError, match="unknown data.synthetic key"):
            spec_from_config(_with_synthetic(config, {"presett": "tiny"}))
        with pytest.raises(ConfigError, match="preset"):
            spec_from_config(_with_synthetic(config, {"preset": "nope"}))
        with pytest.raises(ConfigError, match="mapping"):
            spec_from_config(_with_synthetic(config, "eicu_real"))

    def test_preprocess_routes_the_preset(self, config, tmp_path):
        """data.synthetic.preset reaches the interim tables: the eicu_real
        cohort is heavy-tailed where the flat default is not."""
        from multi_modal_gnn_tpu.data.preprocess import preprocess_pipeline

        cfg = _with_synthetic(config, {"preset": "eicu_real", "seed": 0})
        cfg = cfg.replace(data=dataclasses.replace(
            cfg.data, dataset="synthetic", extras=cfg.data.extras))
        tables = preprocess_pipeline(cfg, interim_dir=tmp_path)
        v = tables["labs_normalized"]["VALUE_NORMALIZED"].to_numpy().astype(np.float64)
        kurt = ((v - v.mean()) ** 4).mean() / v.var() ** 2 - 3
        assert kurt > 4.0  # the validated phenomenology's signature
        expect = generate_synthetic_tables(SyntheticSpec.eicu_real(seed=0))
        assert len(tables["labs_normalized"]) == len(expect["labs_normalized"])


# ----------------------------------------------- strict calibration split


@pytest.fixture(scope="module")
def cal_bundle():
    return make_synthetic_bundle(SyntheticSpec.tiny(seed=4), Config())


class TestCalibrationSplit:
    def test_train_test_membership_unchanged(self, cal_bundle):
        m0 = EdgeMasker(cal_bundle.graph, seed=42)
        m1 = EdgeMasker(cal_bundle.graph, seed=42, calibration_split=0.5)
        np.testing.assert_array_equal(m0.split_indices("train"), m1.split_indices("train"))
        np.testing.assert_array_equal(m0.split_indices("test"), m1.split_indices("test"))

    def test_cal_partitions_val(self, cal_bundle):
        m0 = EdgeMasker(cal_bundle.graph, seed=42)
        m1 = EdgeMasker(cal_bundle.graph, seed=42, calibration_split=0.4)
        assert m1.has_calibration_split and not m0.has_calibration_split
        val0 = set(m0.split_indices("val").tolist())
        val1 = set(m1.split_indices("val").tolist())
        cal1 = set(m1.split_indices("cal").tolist())
        assert val1 | cal1 == val0 and val1.isdisjoint(cal1)
        n_val0 = len(val0)
        assert len(cal1) == int(round(0.4 * n_val0))

    def test_seeded_and_validated(self, cal_bundle):
        a = EdgeMasker(cal_bundle.graph, seed=7, calibration_split=0.5)
        b = EdgeMasker(cal_bundle.graph, seed=7, calibration_split=0.5)
        np.testing.assert_array_equal(a.split_indices("cal"), b.split_indices("cal"))
        with pytest.raises(ValueError, match="calibration_split"):
            EdgeMasker(cal_bundle.graph, seed=7, calibration_split=1.0)

    def test_audit_stays_exhaustive_with_cal_split(self, cal_bundle):
        from multi_modal_gnn_tpu.audit import audit_masked_value_visibility

        m = EdgeMasker(cal_bundle.graph, seed=42, calibration_split=0.5)
        report = audit_masked_value_visibility(cal_bundle.graph, m)
        assert report["splits_exhaustive"] is True
        assert report["supervision_leak"] is False
        assert report["train_only_supervision"] is True

    def test_calibrate_from_trainer_prefers_cal_split(self, cal_bundle):
        from multi_modal_gnn_tpu.models.factory import build_model
        from multi_modal_gnn_tpu.training.trainer import Trainer

        cfg = Config()
        masker = EdgeMasker(cal_bundle.graph, seed=42, calibration_split=0.5)
        trainer = Trainer(build_model(cfg, cal_bundle.graph), cal_bundle.graph, masker, cfg)
        trainer.train_epoch()
        cal = calibrate_from_trainer(trainer, alpha=0.25, min_per_lab=10**9)
        # the global radius was computed from the CAL split's residuals
        _, cal_l, cal_t = masker.split_arrays("cal")
        pred = np.asarray(trainer.predict("cal"), dtype=np.float64)
        expect = ConformalCalibrator.fit(
            pred, cal_t, cal_l, cal_bundle.graph.num_nodes("lab"),
            alpha=0.25, min_per_lab=10**9,
        )
        assert cal.q_global == expect.q_global
        # and NOT from the (now smaller) val split
        _, va_l, va_t = masker.split_arrays("val")
        vp = np.asarray(trainer.predict("val"), dtype=np.float64)
        not_expect = ConformalCalibrator.fit(
            vp, va_t, va_l, cal_bundle.graph.num_nodes("lab"),
            alpha=0.25, min_per_lab=10**9,
        )
        assert cal.q_global != not_expect.q_global

    def test_config_key_reaches_train_pipeline(self, cal_bundle, tmp_path):
        from multi_modal_gnn_tpu.training.trainer import train_pipeline

        cfg = Config()
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, hidden_dim=16),
            train=dataclasses.replace(cfg.train, epochs=2),
            evaluation=dataclasses.replace(
                cfg.evaluation, extras={"conformal_split_fraction": 0.5}
            ),
        )
        trainer, _ = train_pipeline(cfg, cal_bundle, tmp_path)
        assert trainer.masker.has_calibration_split


# --------------------------------------------- finite-sample Beta bounds


class TestCoverageBounds:
    def test_beta_quantile_matches_closed_form_k_equals_n(self):
        # k=n -> Beta(n, 1): q-quantile is q**(1/n)
        import math

        for n, alpha in ((14, 0.1), (9, 0.1)):
            k = math.ceil((n + 1) * (1 - alpha))
            if k == n:
                assert beta_coverage_quantile(n, alpha, 0.05) == pytest.approx(
                    0.05 ** (1.0 / n)
                )
        assert beta_coverage_quantile(0, 0.1) == 0.0
        assert beta_coverage_quantile(3, 0.1) == 0.0  # cannot certify

    def test_min_per_lab_for_bound_is_stable_suffix(self):
        n = min_per_lab_for_bound(0.1, 0.8)
        assert n == 30  # the class default, now derived instead of assumed
        qs = [beta_coverage_quantile(m, 0.1) for m in range(n, n + 300)]
        assert min(qs) >= 0.8
        assert beta_coverage_quantile(n - 1, 0.1) < 0.8 or min(
            beta_coverage_quantile(m, 0.1) for m in range(n - 1, n + 300)
        ) < 0.8
        with pytest.raises(ValueError, match="asymptote"):
            min_per_lab_for_bound(0.1, 0.95)

    def test_fit_auto_min_per_lab_and_bounds_in_artifact(self):
        rng = np.random.default_rng(1)
        preds = rng.normal(size=3000)
        targets = preds + rng.normal(size=3000)
        labs = rng.integers(0, 4, 3000)
        cal = ConformalCalibrator.fit(preds, targets, labs, 4, alpha=0.1,
                                      min_per_lab="auto")
        assert cal.min_per_lab == 30
        out = cal.evaluate(preds, targets, labs)
        assert 0.8 <= out["worst_lab_coverage_bound"] <= out["global_coverage_bound"] < 0.9
        d = cal.to_dict()
        b = d["coverage_bounds"]
        assert b["num_own_radius_labs"] == 4
        assert b["worst_lab_bound"] == out["worst_lab_coverage_bound"]
        assert len(b["per_lab_bound"]) == 4
        # round-trip ignores the informational block
        back = ConformalCalibrator.from_dict(d)
        np.testing.assert_array_equal(back.q_lab, cal.q_lab)

    def test_fallback_labs_carry_global_bound_not_own(self):
        rng = np.random.default_rng(2)
        preds = rng.normal(size=500)
        targets = preds + rng.normal(size=500)
        labs = np.zeros(500, dtype=int)
        labs[:5] = 1  # lab 1: 5 samples -> global fallback
        cal = ConformalCalibrator.fit(preds, targets, labs, 2, alpha=0.1)
        b = cal.coverage_bounds()
        assert b["per_lab_bound"][1] is None
        assert b["num_own_radius_labs"] == 1


# ------------------------------------------------ pipeline failure report


def test_export_serving_warns_loudly_on_conformal_failure(
    cal_bundle, tmp_path, monkeypatch, caplog
):
    """A failing calibrator must not silently drop the serving artifact's
    interval support — the export still completes (point predictions valid)
    and the warning names the consequence (VERDICT round-3 weak #6)."""
    import run_pipeline
    from multi_modal_gnn_tpu.graph.serialize import save_graph
    from multi_modal_gnn_tpu.training.trainer import train_pipeline

    cfg = Config()
    out = tmp_path / "out"
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, output_dir=str(out)),
        model=dataclasses.replace(cfg.model, hidden_dim=16),
        train=dataclasses.replace(cfg.train, epochs=2),
    )
    train_pipeline(cfg, cal_bundle, out)
    save_graph(cal_bundle, out / "graph")

    def boom(*a, **k):
        raise ValueError("synthetic calibration failure")

    import multi_modal_gnn_tpu.evaluation.conformal as conformal_mod

    monkeypatch.setattr(conformal_mod, "calibrate_from_trainer", boom)
    with caplog.at_level(logging.WARNING):
        run_pipeline.step_export_serving(cfg)
    assert (out / "serving" / "serving.json").exists()
    assert any(
        "Conformal calibration FAILED" in r.message and "synthetic calibration failure" in r.message
        for r in caplog.records
    )
    # and the artifact honestly has no conformal sidecar
    assert not (out / "serving" / "conformal.json").exists()


def test_pipeline_e2e_on_eicu_real_preset(tmp_path):
    """VERDICT round-3 item 1, CI-sized: the full 8-step CLI on the
    VALIDATED phenomenology route (conf/eicu_real.yaml, cohort shrunk +
    epochs cut for suite time), with the strict conformal split.  The
    full-size artifact of record lives in outputs/eicu_real/ (real-chip
    run of the unmodified config)."""
    import json
    import os
    import subprocess
    import sys

    from multi_modal_gnn_tpu.config import load_config, save_config

    cfg = load_config("conf/eicu_real.yaml")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data,
            interim_dir=str(tmp_path / "interim"),
            output_dir=str(tmp_path / "out"),
            extras={"synthetic": {"preset": "eicu_real", "seed": 0,
                                  "num_patients": 400}},
        ),
        model=dataclasses.replace(cfg.model, hidden_dim=32),
        train=dataclasses.replace(cfg.train, epochs=8, extras=cfg.train.extras),
        evaluation=dataclasses.replace(
            cfg.evaluation, baselines=("global_mean", "per_lab_mean"),
            extras=cfg.evaluation.extras,
        ),
        logging=dataclasses.replace(
            cfg.logging, log_file=str(tmp_path / "out" / "training.log")
        ),
    )
    assert cfg.evaluation.extras.get("conformal_split_fraction") == 0.5
    assert cfg.train.extras.get("lab_reweighting") is True
    cfg_path = tmp_path / "config.yaml"
    save_config(cfg, cfg_path)

    env = dict(os.environ)
    env["MMGNN_FORCE_CPU"] = "1"
    proc = subprocess.run(
        [sys.executable, "run_pipeline.py", "--config", str(cfg_path), "--no-confirm"],
        capture_output=True, text=True, timeout=1200, env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    out = tmp_path / "out"
    # the interim tables carry the phenomenology (heavy tails)
    import pandas as pd

    v = pd.read_parquet(tmp_path / "interim" / "labs_normalized.parquet")[
        "VALUE_NORMALIZED"
    ].to_numpy().astype(np.float64)
    kurt = ((v - v.mean()) ** 4).mean() / v.var() ** 2 - 3
    assert kurt > 4.0
    results = json.loads((out / "evaluation_results.json").read_text())
    conf = results["conformal"]
    # strict split delivered the guarantee with bounds recorded
    assert 0.8 <= conf["coverage"] <= 1.0
    assert conf["global_coverage_bound"] > 0.85
    audit = json.loads((out / "audit_report.json").read_text())
    assert audit["masked_value_visibility"]["splits_exhaustive"] is True
    assert (out / "serving" / "conformal.json").exists()
    assert (out / "uncertainty_visualizations" / "coverage_per_lab.png").exists()


def test_warm_start_composes_with_dp(cal_bundle, tmp_path):
    """Round 4: train.extras.warm_start routes through the dp trainers
    (params replicated — the plant lands identically on every shard).
    Round 5 (VERDICT r4 item 4): the table-sharding routes (2d/gspmd) no
    longer raise — the plant is re-laid under the trainer's shardings
    (training/warmstart.py warm_start_trainer sharding-preserving path,
    pinned in tests/test_warmstart.py); here the config route must ACCEPT
    gspmd and produce a finite loss."""
    from multi_modal_gnn_tpu.parallel.dp import DataParallelTrainer
    from multi_modal_gnn_tpu.training.trainer import train_pipeline

    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, hidden_dim=16),
        train=dataclasses.replace(
            cfg.train, epochs=2,
            extras={"parallel": "dp", "warm_start": "als",
                    "warm_start_rank": 4},
        ),
    )
    trainer, results = train_pipeline(cfg, cal_bundle, tmp_path)
    assert isinstance(trainer, DataParallelTrainer)
    assert np.isfinite(results["test_loss"])

    cfg2 = cfg.replace(
        train=dataclasses.replace(
            cfg.train, epochs=1,
            extras={"parallel": "gspmd", "warm_start": "als",
                    "warm_start_rank": 4},
        ),
    )
    _, results2 = train_pipeline(cfg2, cal_bundle, tmp_path / "b")
    assert np.isfinite(results2["test_loss"])


def test_evaluation_json_omits_conformal_when_disabled(cal_bundle, tmp_path):
    """ADVICE r3: the saved evaluation_results.json must match the
    in-memory contract — no empty {} conformal block when skipped."""
    import json

    from multi_modal_gnn_tpu.evaluation.evaluate import evaluate_model
    from multi_modal_gnn_tpu.models.factory import build_model
    from multi_modal_gnn_tpu.training.trainer import Trainer

    cfg = Config()
    cfg = cfg.replace(
        evaluation=dataclasses.replace(cfg.evaluation, extras={"conformal_alpha": None})
    )
    masker = EdgeMasker(cal_bundle.graph, seed=42)
    trainer = Trainer(build_model(cfg, cal_bundle.graph), cal_bundle.graph, masker, cfg)
    trainer.train_epoch()
    results = evaluate_model(trainer, cal_bundle, cfg, output_dir=tmp_path)
    assert "conformal" not in results
    saved = json.loads((tmp_path / "evaluation_results.json").read_text())
    assert "conformal" not in saved
