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


def test_cached_state_matches_hgt_value_context_bilinear(config):
    """HGT with the shared beyond-reference channels (value_context +
    embedding-bilinear) is node-factorable for serving exactly like RGCN."""
    from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle

    cfg = config.replace(
        model=dataclasses.replace(
            config.model,
            architecture="HGT",
            extras={"value_context": True},
            edge_head=dataclasses.replace(
                config.model.edge_head, extras={"bilinear_rank": 4,
                                                "bilinear_source": "embedding"},
            ),
        )
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


# ---------------------------------------------------------------------------
# Cold start: ALS fold-in for patients outside the training graph.
# ---------------------------------------------------------------------------


def _lowrank_problem(num_p=300, num_l=30, rank=4, seed=7):
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(num_p, rank))
    c = rng.normal(size=(num_l, rank)) / np.sqrt(rank)
    full = u @ c.T + 0.15 * rng.normal(size=(num_p, num_l))
    obs = rng.random((num_p, num_l)) < 0.6
    return full, obs, rng


def test_als_fold_in_matches_train_half_step():
    """fold_in IS the U half-step: solving a train patient's factor from
    their own train observations reproduces the closed-form ridge."""
    from multi_modal_gnn_tpu.evaluation.baselines import ALSBaseline

    full, obs, _ = _lowrank_problem()
    p_idx, l_idx = np.nonzero(obs)
    als = ALSBaseline(300, 30, rank=4, reg=2.0, iters=10).fit(
        full[obs], p_idx, l_idx
    )
    pid = 17
    labs = l_idx[p_idx == pid]
    vals = full[pid, labs]
    u = als.fold_in(labs, vals)
    c = als.C[labs]
    expected = np.linalg.solve(
        2.0 * np.eye(4) + c.T @ c, c.T @ (vals - als.lab_bias[labs])
    )
    np.testing.assert_allclose(u, expected, rtol=1e-10)
    assert als.fold_in([], []).shape == (4,)


def test_als_cold_start_recovers_holdout_patients():
    """Patients NEVER seen by fit(): fold in from half their labs, predict
    the other half — R^2 must be well above the lab-mean baseline (0)."""
    from multi_modal_gnn_tpu.evaluation.baselines import ALSBaseline

    full, obs, rng = _lowrank_problem()
    train_p = np.arange(250)
    p_idx, l_idx = np.nonzero(obs[:250])
    als = ALSBaseline(250, 30, rank=4, reg=2.0, iters=15).fit(
        full[:250][obs[:250]], p_idx, l_idx
    )
    errs, base_errs, truths = [], [], []
    for pid in range(250, 300):
        labs = np.nonzero(obs[pid])[0]
        half = len(labs) // 2
        give, ask = labs[:half], labs[half:]
        pred = als.predict_cold_start(give, full[pid, give], ask)
        errs.append(pred - full[pid, ask])
        base_errs.append(als.lab_bias[ask] - full[pid, ask])
        truths.append(full[pid, ask])
    sse = np.sum(np.concatenate(errs) ** 2)
    sse_base = np.sum(np.concatenate(base_errs) ** 2)
    t = np.concatenate(truths)
    r2 = 1 - sse / np.sum((t - t.mean()) ** 2)
    assert r2 > 0.5, r2
    assert sse < 0.5 * sse_base  # far better than per-lab means


def test_serving_cold_start_roundtrip(tiny_bundle, tmp_path):
    from multi_modal_gnn_tpu.evaluation.baselines import ALSBaseline
    from multi_modal_gnn_tpu.serving import ServingModel, export_serving

    cfg = Config()
    trainer = _train_briefly(tiny_bundle, cfg, epochs=1)
    p_idx, l_idx, values = trainer.masker.split_arrays("train")
    als = ALSBaseline(
        tiny_bundle.graph.num_nodes("patient"), tiny_bundle.graph.num_nodes("lab"),
        rank=3, iters=5,
    ).fit(values, p_idx, l_idx)

    path = tmp_path / "artifact"
    export_serving(trainer, tiny_bundle, path, buckets=(64,), cold_start=als)
    served = ServingModel.load(path)

    observed = {int(l_idx[0]): float(values[0]), int(l_idx[1]): float(values[1])}
    report = served.predict_cold_start(observed)
    assert len(report) == served.manifest["num_labs"]
    obs_l = np.asarray(sorted(observed))
    obs_v = np.asarray([observed[int(i)] for i in obs_l])
    expected = als.predict_cold_start(
        obs_l, obs_v, np.arange(served.manifest["num_labs"])
    )
    np.testing.assert_allclose(
        np.asarray(list(report.values())), expected, rtol=1e-8
    )
    # empty observation set -> lab biases
    empty = served.predict_cold_start({})
    np.testing.assert_allclose(np.asarray(list(empty.values())), als.lab_bias,
                               rtol=1e-8)

    # artifact without cold-start factors refuses clearly
    path2 = tmp_path / "plain"
    export_serving(trainer, tiny_bundle, path2, buckets=(64,))
    with pytest.raises(ValueError, match="coldstart"):
        ServingModel.load(path2).predict_cold_start(observed)


def test_cached_state_matches_head_bilinear(config):
    """bilinear_source='head' (the README's tuned faithful config): the rank
    folds into the head modules, so serving needs no extra state."""
    from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle

    cfg = config.replace(
        model=dataclasses.replace(
            config.model,
            edge_head=dataclasses.replace(
                config.model.edge_head, extras={"bilinear_rank": 4,
                                                "bilinear_source": "head"},
            ),
        )
    )
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(), cfg)
    _assert_serving_matches_full(bundle, cfg)


def test_serving_from_parallel_trainers(tiny_bundle, config, tmp_path):
    """Serving works straight off the multi-device trainers: cached node
    state from a DP trainer (replicated params) and a TwoDTrainer (patient
    table sharded over the model axis) matches the single-device trainer's
    predictions, and export round-trips."""
    from multi_modal_gnn_tpu.parallel.dp import DataParallelTrainer
    from multi_modal_gnn_tpu.parallel.dp2d import TwoDTrainer, make_2d_mesh
    from multi_modal_gnn_tpu.parallel.mesh import make_mesh
    from multi_modal_gnn_tpu.serving import ServingModel, export_serving

    cfg = config.replace(
        model=dataclasses.replace(config.model, dropout=0.0),
        train=dataclasses.replace(config.train, donate_state=False),
    )
    single = _train_briefly(tiny_bundle, cfg)
    p, l = _pairs(tiny_bundle, 64)
    want = single.predict_pairs(p, l)

    dp = DataParallelTrainer(
        tiny_bundle.graph, EdgeMasker(tiny_bundle.graph, seed=cfg.train.seed),
        cfg, mesh=make_mesh(),
    )
    two_d = TwoDTrainer(
        tiny_bundle.graph, EdgeMasker(tiny_bundle.graph, seed=cfg.train.seed),
        cfg, mesh=make_2d_mesh(8, 2),
    )
    for t in (dp, two_d):
        # NB no epoch increment — mirrors _train_briefly's single trainer so
        # the (seed, epoch)-keyed supervision draws match step for step
        for _ in range(3):
            t.train_epoch()
        fn, _ = build_serving_fn(t)
        got = np.asarray(fn(p, l))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    out = tmp_path / "serve_dp"
    export_serving(dp, tiny_bundle, out)
    served = ServingModel.load(out)
    np.testing.assert_allclose(served.predict(p, l), want, rtol=1e-3, atol=1e-4)


def test_serving_sideinfo_cold_start_roundtrip(tiny_bundle, tmp_path):
    """Side-information cold start: the artifact ships membership factors,
    so an unseen patient with ZERO observed labs still gets a
    dx/rx-conditioned (non-bias) prediction."""
    from multi_modal_gnn_tpu.evaluation.baselines import SideInfoALSBaseline
    from multi_modal_gnn_tpu.serving import ServingModel, export_serving
    from multi_modal_gnn_tpu.training.warmstart import bundle_membership_matrix

    cfg = Config()
    trainer = _train_briefly(tiny_bundle, cfg, epochs=1)
    p_idx, l_idx, values = trainer.masker.split_arrays("train")
    m = bundle_membership_matrix(tiny_bundle)
    si = SideInfoALSBaseline(
        tiny_bundle.graph.num_nodes("patient"), tiny_bundle.graph.num_nodes("lab"),
        rank=3, mem_rank=2, iters=5,
    ).fit(values, p_idx, l_idx, m)

    path = tmp_path / "artifact"
    export_serving(trainer, tiny_bundle, path, buckets=(64,), cold_start=si)
    served = ServingModel.load(path)

    n_lab = served.manifest["num_labs"]
    new_m = m[3]  # treat a known membership row as the new patient's
    observed = {int(l_idx[0]): float(values[0])}
    report = served.predict_cold_start(observed, memberships=new_m)
    obs_l = np.asarray(sorted(observed))
    obs_v = np.asarray([observed[int(i)] for i in obs_l])
    expected = si.predict_cold_start(obs_l, obs_v, np.arange(n_lab), new_m)
    np.testing.assert_allclose(
        np.asarray(list(report.values())), expected, rtol=1e-8
    )

    # zero observed labs: prediction = bias + H @ (m @ mem_proj), NOT bias-only
    empty = served.predict_cold_start({}, memberships=new_m)
    want = si.lab_bias + si.H @ (new_m.astype(np.float64) @ si.mem_proj)
    np.testing.assert_allclose(np.asarray(list(empty.values())), want, rtol=1e-8)
    assert not np.allclose(want, si.lab_bias)

    # memberships against a plain-ALS artifact refuses clearly
    from multi_modal_gnn_tpu.evaluation.baselines import ALSBaseline

    als = ALSBaseline(
        tiny_bundle.graph.num_nodes("patient"), tiny_bundle.graph.num_nodes("lab"),
        rank=3, iters=5,
    ).fit(values, p_idx, l_idx)
    path2 = tmp_path / "plain"
    export_serving(trainer, tiny_bundle, path2, buckets=(64,), cold_start=als)
    with pytest.raises(ValueError, match="side-information"):
        ServingModel.load(path2).predict_cold_start(observed, memberships=new_m)
