"""Integration tests: inference, audit, viz, and the 8-step pipeline CLI."""

import dataclasses
import json
import subprocess
import sys

import numpy as np
import pytest

from multi_modal_gnn_tpu.audit import (
    PatientHoldoutSplitter,
    audit_masked_value_visibility,
    audit_patient_leakage,
    compute_robust_metrics,
    run_full_audit,
)
from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle
from multi_modal_gnn_tpu.inference import run_inference, select_example_patients
from multi_modal_gnn_tpu.training.masker import EdgeMasker
from multi_modal_gnn_tpu.training.trainer import train_pipeline


@pytest.fixture(scope="module")
def quick_trained(tmp_path_factory):
    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, hidden_dim=32),
        train=dataclasses.replace(cfg.train, epochs=8),
    )
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=2), cfg)
    out = tmp_path_factory.mktemp("quick_out")
    trainer, _ = train_pipeline(cfg, bundle, out)
    return cfg, bundle, trainer, out


class TestAudit:
    def test_patient_leakage_report(self, quick_trained):
        _, _, trainer, _ = quick_trained
        report = audit_patient_leakage(trainer.masker)
        assert report["split_type"] == "edge_level"
        assert report["total_unique_patients"] > 0

    def test_masked_value_visibility(self, quick_trained):
        _, bundle, trainer, _ = quick_trained
        report = audit_masked_value_visibility(bundle.graph, trainer.masker)
        assert report["masked_values_in_node_features"] is False
        assert report["masked_values_in_other_edges"] is False
        assert report["supervision_leak"] is False
        assert report["splits_exhaustive"] is True

    def test_patient_holdout_no_overlap(self, quick_trained):
        _, bundle, _, _ = quick_trained
        splitter = PatientHoldoutSplitter(
            bundle.graph, host_edges=bundle.patient_lab_host(), seed=0
        )
        tr_p = set(splitter.split_arrays("train")[0].tolist())
        te_p = set(splitter.split_arrays("test")[0].tolist())
        assert tr_p.isdisjoint(te_p)
        sizes = splitter.split_sizes()
        assert sum(sizes.values()) == splitter.num_edges

    def test_robust_metrics(self, rng):
        y = rng.standard_normal(300)
        p = y + 0.1 * rng.standard_normal(300)
        m = compute_robust_metrics(y, p)
        assert 0 < m["mae"] < 0.2
        assert m["r2"] > 0.9
        assert 0 <= m["smape"] and 0 <= m["wape"]
        assert m["mae_winsorized"] <= m["max_residual"]

    def test_full_audit_writes_report(self, quick_trained, tmp_path):
        cfg, bundle, trainer, _ = quick_trained
        report = run_full_audit(cfg, bundle, trainer, output_dir=tmp_path)
        assert (tmp_path / "audit_report.json").exists()
        assert "robust_metrics_edge_level" in report


class TestInference:
    def test_select_example_patients_diverse(self, quick_trained):
        _, bundle, trainer, _ = quick_trained
        picks = select_example_patients(
            trainer.masker, bundle.graph.num_nodes("patient"), 5, np.random.default_rng(0)
        )
        assert len(picks) == 5
        assert len(set(picks)) == 5

    def test_run_inference(self, quick_trained, tmp_path):
        cfg, bundle, trainer, _ = quick_trained
        result = run_inference(cfg, bundle, trainer, tmp_path, num_examples=3)
        assert (tmp_path / "inference_examples.json").exists()
        assert len(result["examples"]) == 3
        ex = result["examples"][0]
        # every lab accounted for in exactly one group
        n_labs = bundle.graph.num_nodes("lab")
        total = (
            len(ex["measured_labs"]) + len(ex["masked_labs"]) + len(ex["truly_missing_labs"])
        )
        assert total == n_labs
        # masked entries carry denormalized prediction + actual + error
        if ex["masked_labs"]:
            info = next(iter(ex["masked_labs"].values()))
            assert {"predicted", "actual", "error"} <= set(info)

    def test_inference_specific_patient(self, quick_trained, tmp_path):
        cfg, bundle, trainer, _ = quick_trained
        pid_entity = bundle.meta.indexers["patient"].id_of(0)
        result = run_inference(
            cfg, bundle, trainer, tmp_path, patient_id=pid_entity, num_examples=1
        )
        assert len(result["examples"]) == 1
        assert result["examples"][0]["patient_id"] == pid_entity


class TestViz:
    def test_all_viz_families(self, quick_trained, tmp_path):
        cfg, bundle, trainer, _ = quick_trained
        from multi_modal_gnn_tpu.viz import (
            create_all_visualizations,
            run_advanced_visualizations,
            visualize_graph_structure,
        )

        gdir = visualize_graph_structure(cfg, bundle, tmp_path)
        assert (gdir / "graph_overview.png").exists()
        assert (gdir / "network_sample.png").exists()
        assert any(p.name.startswith("patient_") for p in gdir.iterdir())

        vdir = create_all_visualizations(
            cfg, bundle, trainer, history=trainer.history, output_dir=tmp_path
        )
        for name in (
            "degree_distribution.png", "missingness_heatmap.png", "training_curves.png",
            "parity_plot.png", "error_distribution.png", "embeddings.png",
        ):
            assert (vdir / name).exists(), name

        adir = run_advanced_visualizations(cfg, bundle, trainer, output_dir=tmp_path)
        assert (adir / "parity_by_frequency.png").exists()
        assert (adir / "error_vs_degree.png").exists()
        assert (adir / "per_lab_calibration.csv").exists()


def test_pipeline_cli_end_to_end(tmp_path):
    """All 8 steps through the CLI on the synthetic dataset config."""
    import yaml

    from multi_modal_gnn_tpu.config import load_config, save_config

    cfg = load_config("conf/config.yaml")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data,
            dataset="synthetic",
            interim_dir=str(tmp_path / "interim"),
            output_dir=str(tmp_path / "out"),
        ),
        model=dataclasses.replace(cfg.model, hidden_dim=32),
        train=dataclasses.replace(cfg.train, epochs=5),
        logging=dataclasses.replace(
            cfg.logging, log_file=str(tmp_path / "out" / "training.log")
        ),
    )
    cfg_path = tmp_path / "config.yaml"
    save_config(cfg, cfg_path)

    env = dict(__import__("os").environ)
    env["MMGNN_FORCE_CPU"] = "1"
    proc = subprocess.run(
        [sys.executable, "run_pipeline.py", "--config", str(cfg_path), "--no-confirm"],
        capture_output=True, text=True, timeout=1200, env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    out = tmp_path / "out"
    for artifact in (
        "graph.npz", "best_model.ckpt", "training_history.json", "test_results.json",
        "evaluation_results.json", "per_lab_metrics.csv", "audit_report.json",
        "inference_examples.json",
        "serving/serving.json",
    ):
        assert (out / artifact).exists(), artifact
    assert (tmp_path / "interim" / "labs_normalized.parquet").exists()
    assert (out / "visualizations" / "parity_plot.png").exists()
    with open(out / "evaluation_results.json") as f:
        results = json.load(f)
    assert "overall_metrics" in results and "mae" in results["overall_metrics"]


def test_pipeline_cli_step_without_artifacts_fails_cleanly(tmp_path):
    """--step 3 with no graph artifact: nonzero exit + a FAILED message,
    no traceback spew to the user."""
    import os

    from multi_modal_gnn_tpu.config import load_config, save_config

    cfg = load_config("conf/config.yaml")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data,
            interim_dir=str(tmp_path / "interim"),
            output_dir=str(tmp_path / "out"),
        ),
        logging=dataclasses.replace(cfg.logging, save_to_file=False),
    )
    cfg_path = tmp_path / "config.yaml"
    save_config(cfg, cfg_path)
    env = dict(os.environ)
    env["MMGNN_FORCE_CPU"] = "1"
    proc = subprocess.run(
        [sys.executable, "run_pipeline.py", "--config", str(cfg_path),
         "--step", "3", "--no-confirm"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 1
    assert "FAILED" in proc.stdout
    assert "aborted" in proc.stdout


def test_pipeline_cli_bad_step_range(tmp_path):
    import os

    env = dict(os.environ)
    env["MMGNN_FORCE_CPU"] = "1"
    proc = subprocess.run(
        [sys.executable, "run_pipeline.py", "--step", "9", "--no-confirm"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode != 0


def test_patient_context_in_reports(quick_trained, tmp_path):
    import pandas as pd

    from multi_modal_gnn_tpu.inference import load_patient_context

    cfg, bundle, trainer, _ = quick_trained
    ctx = load_patient_context(bundle, 0)
    assert "diagnoses" in ctx and "medications" in ctx
    # with a cohort frame, demographics appear
    pid = bundle.meta.indexers["patient"].id_of(0)
    cohort = pd.DataFrame({"SUBJECT_ID": [pid], "AGE": [55.0], "GENDER": ["F"]})
    ctx2 = load_patient_context(bundle, 0, cohort=cohort)
    assert ctx2["age"] == 55.0 and ctx2["gender"] == "F"
    # run_inference attaches context to every example
    result = run_inference(cfg, bundle, trainer, tmp_path, num_examples=2, cohort=cohort)
    assert all("context" in ex for ex in result["examples"])


def test_pipeline_cli_distributed_knobs(tmp_path):
    """The 8-step CLI with the config-routed scaling knobs: parallel=dp
    training (per-shard kernel plans via use_pallas) + multi-host graph
    artifacts (graph.extras.num_shards) in one run."""
    from multi_modal_gnn_tpu.config import load_config, save_config

    cfg = load_config("conf/config.yaml")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data,
            dataset="synthetic",
            interim_dir=str(tmp_path / "interim"),
            output_dir=str(tmp_path / "out"),
        ),
        model=dataclasses.replace(cfg.model, hidden_dim=32, use_pallas=True),
        graph=dataclasses.replace(cfg.graph, extras={"num_shards": 4}),
        train=dataclasses.replace(
            cfg.train, epochs=5, extras={"parallel": "dp"}
        ),
        logging=dataclasses.replace(
            cfg.logging, log_file=str(tmp_path / "out" / "training.log")
        ),
    )
    cfg_path = tmp_path / "config.yaml"
    save_config(cfg, cfg_path)

    env = dict(__import__("os").environ)
    env["MMGNN_FORCE_CPU"] = "1"
    env["MMGNN_CPU_DEVICES"] = "4"  # a real 4-way DP mesh, not a 1-device one
    proc = subprocess.run(
        [sys.executable, "run_pipeline.py", "--config", str(cfg_path), "--no-confirm"],
        capture_output=True, text=True, timeout=1200, env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    out = tmp_path / "out"
    for artifact in (
        "graph.npz",
        "graph_sharded.shard000-of-004.npz",
        "graph_sharded.common.npz",
        "best_model.ckpt",
        "evaluation_results.json",
        "serving/serving.json",
    ):
        assert (out / artifact).exists(), artifact
