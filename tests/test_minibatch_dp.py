"""Mini-batch clustering x shard_map data parallelism
(parallel/minibatch_dp.py — VERDICT round-3 item 3): trajectory parity with
the single-device MiniBatchTrainer, host-resident mode, value-context
composition, per-cluster kernel plans, and the config route."""

import dataclasses

import numpy as np
import pytest

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle
from multi_modal_gnn_tpu.models.factory import build_model
from multi_modal_gnn_tpu.parallel.mesh import make_mesh
from multi_modal_gnn_tpu.parallel.minibatch_dp import MiniBatchDPTrainer
from multi_modal_gnn_tpu.training.masker import EdgeMasker
from multi_modal_gnn_tpu.training.minibatch import MiniBatchTrainer

TOL = dict(rtol=2e-5, atol=2e-5)


def _cfg(**model_kw):
    cfg = Config()
    return cfg.replace(
        model=dataclasses.replace(cfg.model, hidden_dim=32, dropout=0.0, **model_kw)
    )


@pytest.fixture(scope="module")
def mb_bundle():
    return make_synthetic_bundle(SyntheticSpec.tiny(seed=1), _cfg())


@pytest.fixture(scope="module")
def mb_bundle_4w():
    """A 4-window cohort (520 patients): the partition tests need more
    WINDOW-aligned patient ranges than clusters — on the 120-patient tiny
    cohort a 3-cluster request is degenerate and now raises
    (training/minibatch.py _cluster_bases, ADVICE r4 item 3)."""
    import dataclasses

    spec = dataclasses.replace(
        SyntheticSpec.tiny(seed=1), num_patients=520, mean_labs_per_patient=6.0
    )
    return make_synthetic_bundle(spec, _cfg())


def _masker(bundle):
    return EdgeMasker(bundle.graph, seed=0, host_edges=bundle.patient_lab_host())


def _pair(bundle, cfg, num_clusters, mesh, **dp_kw):
    sd = MiniBatchTrainer(
        build_model(cfg, bundle.graph), bundle, _masker(bundle), cfg,
        num_clusters=num_clusters,
    )
    dp = MiniBatchDPTrainer(
        bundle, _masker(bundle), cfg, num_clusters=num_clusters, mesh=mesh, **dp_kw
    )
    return sd, dp


class TestParity:
    def test_train_trajectory_matches_single_device(self, mb_bundle):
        """The pinned deliverable: minibatch-DP == minibatch single-device
        trajectories (dropout off — the DP edge-head dropout key folds in
        the shard index by design)."""
        sd, dp = _pair(mb_bundle, _cfg(), 2, make_mesh(4))
        losses_sd = [sd.train_epoch() for _ in range(3)]
        losses_dp = [dp.train_epoch() for _ in range(3)]
        np.testing.assert_allclose(losses_sd, losses_dp, **TOL)
        np.testing.assert_allclose(sd.validate("val"), dp.validate("val"), **TOL)

    def test_predict_matches_in_split_order(self, mb_bundle):
        sd, dp = _pair(mb_bundle, _cfg(), 3, make_mesh(4))
        for split in ("val", "test"):
            np.testing.assert_allclose(
                sd.predict(split), dp.predict(split), **TOL
            )

    def test_value_context_composes(self, mb_bundle):
        """The previously-rejected cell (sharding.py raised on
        vis_positions): cluster-local knockout under shard_map matches the
        single-device cluster step."""
        cfg = _cfg(extras={"value_context": True})
        sd, dp = _pair(mb_bundle, cfg, 2, make_mesh(4))
        for _ in range(2):
            l_sd, l_dp = sd.train_epoch(), dp.train_epoch()
            np.testing.assert_allclose(l_sd, l_dp, **TOL)
        np.testing.assert_allclose(sd.validate("val"), dp.validate("val"), **TOL)

    def test_host_resident_mode_matches(self, mb_bundle):
        sd, dp = _pair(mb_bundle, _cfg(), 2, make_mesh(4), host_resident=True)
        np.testing.assert_allclose(sd.train_epoch(), dp.train_epoch(), **TOL)

    def test_per_cluster_kernel_plans(self, mb_bundle):
        """use_pallas attaches per-shard windowed plans built from each
        cluster's own host edges; the (interpret-mode on CPU) kernel path
        matches the XLA path."""
        cfg_xla = _cfg()
        cfg_pk = _cfg(use_pallas=True)
        sd, dp = _pair(mb_bundle, cfg_xla, 2, make_mesh(4))
        pk = MiniBatchDPTrainer(
            mb_bundle, _masker(mb_bundle), cfg_pk, num_clusters=2, mesh=make_mesh(4)
        )
        # plans attached on every cluster's patient->lab relation
        from multi_modal_gnn_tpu.graph.schema import PATIENT_LAB

        cd = pk._ensure_clusters()
        for sg in cd.subgraphs:
            assert sg.edges[PATIENT_LAB].shard_win_src is not None
        np.testing.assert_allclose(sd.train_epoch(), pk.train_epoch(), **TOL)


class TestEdgeBalancedPartition:
    def test_balanced_beats_equal_patient_padding(self, mb_bundle_4w):
        """Round-4 fix: under the degree-sorted layout, equal-PATIENT
        ranges concentrate edges in the last cluster and every cluster
        pays its padding (measured: HGT at the scale config OOM'd at 24
        equal-patient clusters).  Edge-balanced boundaries bound the max
        cluster load."""
        from multi_modal_gnn_tpu.graph.schema import PATIENT_LAB
        from multi_modal_gnn_tpu.training.minibatch import build_patient_clusters

        masker = _masker(mb_bundle_4w)
        cfg = _cfg()
        loads = {}
        for bal in ("patients", "edges"):
            cd = build_patient_clusters(mb_bundle_4w, masker, cfg, 3, balance=bal)
            loads[bal] = max(
                int(np.asarray(sg.edges[PATIENT_LAB].mask).sum())
                for sg in cd.subgraphs
            )
            # partition covers every split row exactly once regardless
            for split in ("train", "val", "test"):
                n = sum(
                    b.num_valid for b, _ in cd.batches[split] if b is not None
                )
                assert n == masker.split_sizes()[split]
        assert loads["edges"] <= loads["patients"]

    def test_cluster_of_matches_partition(self, mb_bundle_4w):
        from multi_modal_gnn_tpu.training.minibatch import build_patient_clusters

        cd = build_patient_clusters(mb_bundle_4w, _masker(mb_bundle_4w), _cfg(), 3)
        num_p = mb_bundle_4w.graph.num_nodes("patient")
        p = np.arange(num_p)
        cid = cd.cluster_of(p)
        assert cid.min() >= 0 and cid.max() < 3
        # each in-range base starts its own cluster (WINDOW alignment can
        # collapse trailing bases to num_p on tiny cohorts — those clusters
        # are legitimately empty)
        for k, b in enumerate(cd.bases):
            if b < num_p and (k == 0 or b > cd.bases[k - 1]):
                assert cid[b] == k

    def test_unknown_balance_rejected(self, mb_bundle):
        from multi_modal_gnn_tpu.training.minibatch import build_patient_clusters

        with pytest.raises(ValueError, match="balance"):
            build_patient_clusters(
                mb_bundle, _masker(mb_bundle), _cfg(), 2, balance="nope"
            )


class TestConfigRoute:
    def test_train_pipeline_dispatches_minibatch_dp(self, mb_bundle, tmp_path):
        from multi_modal_gnn_tpu.training.trainer import train_pipeline

        cfg = _cfg()
        cfg = cfg.replace(
            train=dataclasses.replace(
                cfg.train, epochs=2,
                extras={"parallel": "dp", "num_clusters": 2},
            )
        )
        trainer, results = train_pipeline(cfg, mb_bundle, tmp_path)
        assert isinstance(trainer, MiniBatchDPTrainer)
        assert np.isfinite(results["test_loss"])

    def test_2d_gspmd_with_clusters_still_rejected(self, mb_bundle, tmp_path):
        from multi_modal_gnn_tpu.training.trainer import train_pipeline

        cfg = _cfg()
        cfg = cfg.replace(
            train=dataclasses.replace(
                cfg.train, epochs=1,
                extras={"parallel": "gspmd", "num_clusters": 2},
            )
        )
        with pytest.raises(ValueError, match="composes with"):
            train_pipeline(cfg, mb_bundle, tmp_path)

    def test_indivisible_batch_padding_fails_clearly(self, mb_bundle):
        import jax

        if jax.device_count() < 3:
            pytest.skip("needs >= 3 devices")
        # 256-padded batches divide 2/4/8 but not 3
        mesh = make_mesh(3)
        with pytest.raises(ValueError, match="divisible"):
            MiniBatchDPTrainer(
                mb_bundle, _masker(mb_bundle), _cfg(), num_clusters=2, mesh=mesh
            )
