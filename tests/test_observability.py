"""Profiling/observability utilities + bf16 and HGT training paths."""

import dataclasses
import json
import time

import numpy as np
import pytest

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle
from multi_modal_gnn_tpu.models.factory import build_model
from multi_modal_gnn_tpu.training.masker import EdgeMasker
from multi_modal_gnn_tpu.training.trainer import Trainer
from multi_modal_gnn_tpu.utils.profiling import (
    MetricsWriter,
    StepTimer,
    maybe_init_wandb,
)


class TestStepTimer:
    def test_summary(self):
        t = StepTimer(items_per_step=100)
        for _ in range(5):
            with t.step():
                time.sleep(0.002)
        s = t.summary()
        assert s["steps"] == 5
        assert s["mean_ms"] >= 2.0
        assert s["items_per_sec"] > 0


class TestMetricsWriter:
    def test_jsonl_records(self, tmp_path):
        path = tmp_path / "metrics.jsonl"
        with MetricsWriter(path) as w:
            w.write(1, train_loss=0.5)
            w.write(2, train_loss=0.4, lr=1e-3)
        lines = [json.loads(line) for line in path.read_text().splitlines()]
        assert len(lines) == 2
        assert lines[0]["step"] == 1 and lines[0]["train_loss"] == 0.5
        assert lines[1]["lr"] == 1e-3
        assert "ts" in lines[0]


def test_wandb_gated_noop():
    cfg = Config()
    assert maybe_init_wandb(cfg) is None  # disabled
    cfg_on = cfg.replace(logging=dataclasses.replace(cfg.logging, use_wandb=True))
    assert maybe_init_wandb(cfg_on) is None  # enabled but not installed -> no-op


def test_metrics_jsonl_written_during_training(tmp_path):
    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, hidden_dim=32),
        train=dataclasses.replace(cfg.train, epochs=3),
    )
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=7), cfg)
    masker = EdgeMasker(bundle.graph, seed=0, host_edges=bundle.patient_lab_host())
    trainer = Trainer(build_model(cfg, bundle.graph), bundle.graph, masker, cfg)
    trainer.fit(output_dir=tmp_path)
    lines = (tmp_path / "metrics.jsonl").read_text().splitlines()
    assert len(lines) == 3
    rec = json.loads(lines[0])
    assert {"step", "train_loss", "val_loss", "lr", "epoch_time_s"} <= set(rec)


def test_bf16_compute_path(tiny_graph):
    """compute_dtype=bfloat16 trains without NaNs."""
    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, hidden_dim=32, compute_dtype="bfloat16")
    )
    masker = EdgeMasker(tiny_graph, seed=0)
    trainer = Trainer(build_model(cfg, tiny_graph), tiny_graph, masker, cfg)
    losses = [trainer.train_epoch() for _ in range(3)]
    assert np.isfinite(losses).all()


def test_hgt_trains(tiny_graph):
    """The HGT alternative architecture runs through the Trainer."""
    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, hidden_dim=32, architecture="HGT")
    )
    masker = EdgeMasker(tiny_graph, seed=0)
    trainer = Trainer(build_model(cfg, tiny_graph), tiny_graph, masker, cfg)
    losses = []
    for _ in range(5):
        losses.append(trainer.train_epoch())
        trainer.epoch += 1
    assert np.isfinite(losses).all()
    assert np.isfinite(trainer.validate("val"))


def test_scanned_epochs_match_loop(tiny_graph):
    """lax.scan multi-epoch stepping reproduces the per-epoch loop exactly."""
    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, hidden_dim=32),
        train=dataclasses.replace(cfg.train, donate_state=False),
    )

    def make():
        masker = EdgeMasker(tiny_graph, seed=0)
        return Trainer(build_model(cfg, tiny_graph), tiny_graph, masker, cfg)

    t_loop = make()
    loop_losses = []
    for _ in range(4):
        loop_losses.append(t_loop.train_epoch())
        t_loop.epoch += 1

    t_scan = make()
    scan_losses, _ = t_scan.train_epochs_scanned(4)
    np.testing.assert_allclose(scan_losses, loop_losses, rtol=1e-5)
    assert t_scan.epoch == 4
