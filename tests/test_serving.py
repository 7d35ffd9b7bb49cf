"""Serving layer: cached node state == full forward; AOT export round-trips."""

import dataclasses

import numpy as np
import pytest

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.models.factory import build_model
from multi_modal_gnn_tpu.serving import (
    ServingModel,
    build_serving_fn,
    export_serving,
)
from multi_modal_gnn_tpu.training.masker import EdgeMasker
from multi_modal_gnn_tpu.training.trainer import Trainer


def _train_briefly(bundle, cfg, epochs=3):
    masker = EdgeMasker(bundle.graph, seed=cfg.train.seed)
    model = build_model(cfg, bundle.graph)
    trainer = Trainer(model, bundle.graph, masker, cfg)
    for _ in range(epochs):
        trainer.train_epoch()
    return trainer


def _pairs(bundle, n, seed=0):
    rng = np.random.default_rng(seed)
    num_p = bundle.graph.num_nodes("patient")
    num_l = bundle.graph.num_nodes("lab")
    return (
        rng.integers(0, num_p, n).astype(np.int32),
        rng.integers(0, num_l, n).astype(np.int32),
    )


def _assert_serving_matches_full(bundle, cfg):
    trainer = _train_briefly(bundle, cfg)
    fn, _ = build_serving_fn(trainer)
    p, l = _pairs(bundle, 300)
    full = trainer.predict_pairs(p, l)
    # bucket-pad like a server would
    pad = 512 - len(p)
    p_pad = np.concatenate([p, np.zeros(pad, np.int32)])
    l_pad = np.concatenate([l, np.zeros(pad, np.int32)])
    cached = np.asarray(fn(p_pad, l_pad))[: len(p)]
    np.testing.assert_allclose(cached, full, rtol=1e-5, atol=1e-5)


def test_cached_state_matches_full_forward(tiny_bundle, config):
    _assert_serving_matches_full(tiny_bundle, config)


def test_cached_state_matches_value_context_bilinear(config):
    from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle

    cfg = config.replace(
        model=dataclasses.replace(
            config.model,
            extras={"value_context": True},
            edge_head=dataclasses.replace(
                config.model.edge_head, extras={"bilinear_rank": 4,
                                                "bilinear_source": "context"},
            ),
        )
    )
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(), cfg)
    _assert_serving_matches_full(bundle, cfg)


def test_cached_state_matches_hgt(config):
    from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle

    cfg = config.replace(
        model=dataclasses.replace(config.model, architecture="HGT")
    )
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(), cfg)
    _assert_serving_matches_full(bundle, cfg)


class TestExportedArtifact:
    @pytest.fixture(scope="class")
    def artifact(self, tiny_bundle, tmp_path_factory):
        cfg = Config()
        trainer = _train_briefly(tiny_bundle, cfg)
        path = tmp_path_factory.mktemp("serving") / "artifact"
        export_serving(trainer, tiny_bundle, path, buckets=(64, 256))
        p, l = _pairs(tiny_bundle, 100, seed=1)
        reference = trainer.predict_pairs(p, l)
        return path, p, l, reference, tiny_bundle

    def test_roundtrip_matches_trainer(self, artifact):
        path, p, l, reference, _ = artifact
        served = ServingModel.load(path)
        np.testing.assert_allclose(
            served.predict(p, l), reference, rtol=1e-5, atol=1e-5
        )

    def test_chunking_beyond_largest_bucket(self, artifact):
        path, *_ , bundle = artifact
        served = ServingModel.load(path)
        p, l = _pairs(bundle, 700, seed=2)  # > largest bucket (256) -> 3 chunks
        out = served.predict(p, l)
        assert out.shape == (700,)
        # chunk boundaries must not change values: compare to two halves
        np.testing.assert_allclose(out[:300], served.predict(p[:300], l[:300]),
                                   rtol=1e-6)

    def test_manifest_and_validation(self, artifact):
        path, p, l, _, _ = artifact
        served = ServingModel.load(path)
        m = served.manifest
        assert m["format"].startswith("multi_modal_gnn_tpu.serving/")
        assert m["buckets"] == [64, 256]
        assert m["num_labs"] > 0 and m["num_patients"] > 0 and m["model_hash"]
        with pytest.raises(ValueError, match="patient index out of range"):
            served.predict([m["num_patients"]], [0])
        with pytest.raises(ValueError, match="lab index out of range"):
            served.predict([0], [m["num_labs"]])
        assert served.predict([], []).shape == (0,)

    def test_predict_patient_denormalized(self, artifact):
        path, *_ = artifact
        served = ServingModel.load(path)
        report = served.predict_patient(0, denormalize=True)
        assert len(report) == served.manifest["num_labs"]
        assert all(np.isfinite(v) for v in report.values())
