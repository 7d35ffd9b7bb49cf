"""Parity checks against the reference repo (skipped when it isn't mounted).

These tests don't copy anything — they verify that artifacts THIS framework
produces are drop-in compatible with the reference's contract: its config
file loads unchanged, and our result JSON/CSV artifacts carry (at least) the
keys/columns the reference's shipped artifacts carry.
"""

import json
from pathlib import Path

import pandas as pd
import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference repo not mounted"
)


def test_reference_config_loads_unchanged():
    from multi_modal_gnn_tpu.config import load_config

    cfg = load_config(REFERENCE / "conf" / "config.yaml")
    # spot-check that the reference's values landed in typed fields
    assert cfg.data.dataset == "eicu"
    assert cfg.feature_space.labs.top_k == 50
    assert cfg.feature_space.labs.aggregate == "last"
    assert cfg.model.hidden_dim == 128
    assert cfg.model.edge_head.hidden_dims == (64, 32)
    assert cfg.train.mask_fraction == 0.2
    assert cfg.train.optimizer.weight_decay == pytest.approx(1e-5)
    assert cfg.train.lr_scheduler.factor == 0.5
    assert cfg.evaluation.per_lab_metrics is True
    # unknown/extra keys must be preserved, not dropped
    assert cfg.to_dict()["cohort"]["age_min"] == 18


def test_evaluation_artifact_schema_superset(tmp_path):
    """Our evaluation_results.json carries every top-level key and metric
    the reference's shipped artifact carries."""
    import dataclasses

    from multi_modal_gnn_tpu.config import Config
    from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle
    from multi_modal_gnn_tpu.evaluation.evaluate import evaluate_model
    from multi_modal_gnn_tpu.training.trainer import train_pipeline

    with open(REFERENCE / "outputs" / "evaluation_results.json") as f:
        ref = json.load(f)

    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, hidden_dim=32),
        train=dataclasses.replace(cfg.train, epochs=3),
    )
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=4), cfg)
    trainer, _ = train_pipeline(cfg, bundle, tmp_path)
    evaluate_model(trainer, bundle, cfg, output_dir=tmp_path)

    with open(tmp_path / "evaluation_results.json") as f:
        ours = json.load(f)

    assert set(ref.keys()) <= set(ours.keys())
    assert set(ref["overall_metrics"].keys()) <= set(ours["overall_metrics"].keys())
    for strat in ref.get("stratified_results", {}):
        assert strat in ours["stratified_results"], strat


def test_per_lab_metrics_columns_superset(tmp_path):
    ref = pd.read_csv(REFERENCE / "outputs" / "per_lab_metrics.csv")
    import dataclasses

    from multi_modal_gnn_tpu.config import Config
    from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle
    from multi_modal_gnn_tpu.evaluation.evaluate import evaluate_model
    from multi_modal_gnn_tpu.training.trainer import train_pipeline

    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, hidden_dim=32),
        train=dataclasses.replace(cfg.train, epochs=3),
    )
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=4), cfg)
    trainer, _ = train_pipeline(cfg, bundle, tmp_path)
    evaluate_model(trainer, bundle, cfg, output_dir=tmp_path)
    ours = pd.read_csv(tmp_path / "per_lab_metrics.csv")
    assert set(ref.columns) <= set(ours.columns)


def test_training_artifacts_schema():
    with open(REFERENCE / "outputs" / "test_results.json") as f:
        ref_keys = set(json.load(f).keys())
    with open(REFERENCE / "outputs" / "training_history.json") as f:
        ref_hist_keys = set(json.load(f).keys())
    # contract we write in training/trainer.py
    assert ref_keys <= {"test_loss", "best_val_loss", "num_epochs"}
    assert ref_hist_keys <= {"train_loss", "val_loss", "learning_rates"}
