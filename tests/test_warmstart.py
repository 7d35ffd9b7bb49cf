"""ALS warm start (training/warmstart.py): epoch-0 equals the closed-form
ALS predictor, and gradient training from there can only be selected if it
improves validation (best-val checkpointing)."""

import dataclasses

import numpy as np
import pytest

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle
from multi_modal_gnn_tpu.evaluation.metrics import compute_regression_metrics
from multi_modal_gnn_tpu.models.factory import build_model
from multi_modal_gnn_tpu.training.masker import EdgeMasker
from multi_modal_gnn_tpu.training.trainer import Trainer
from multi_modal_gnn_tpu.training.warmstart import als_warm_start_params, warm_start_trainer


def _mf_config(rank=5, arch="RGCN"):
    cfg = Config()
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            architecture=arch,
            edge_head=dataclasses.replace(
                cfg.model.edge_head,
                extras={"bilinear_rank": rank, "bilinear_source": "embedding"},
            ),
        ),
    )


# the warm start plants into params (embed_* + bilinear_u/l + zeroed head
# output layers) — architecture-agnostic by design; run the contract for both
@pytest.fixture(scope="module", params=["RGCN", "HGT"])
def setup(request):
    cfg = _mf_config(arch=request.param)
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=3), cfg)
    masker = EdgeMasker(bundle.graph, seed=7, host_edges=bundle.patient_lab_host())
    return cfg, bundle, masker


def test_epoch0_equals_als(setup):
    cfg, bundle, masker = setup
    tr = Trainer(build_model(cfg, bundle.graph), bundle.graph, masker, cfg)
    als = warm_start_trainer(tr, rank=4, reg=3.0)
    tep, tel, tev = masker.split_arrays("test")
    got = compute_regression_metrics(tr.predict("test").astype(np.float64), tev)
    want = compute_regression_metrics(als.predict(tep, tel), tev)
    assert got["r2"] == pytest.approx(want["r2"], abs=1e-5)
    assert got["mae"] == pytest.approx(want["mae"], abs=1e-5)


def test_training_from_warm_start_stays_finite(setup):
    cfg, bundle, masker = setup
    tr = Trainer(build_model(cfg, bundle.graph), bundle.graph, masker, cfg)
    warm_start_trainer(tr, rank=4, reg=3.0)
    v0 = tr.validate()
    for _ in range(5):
        loss = tr.train_epoch()
        tr.epoch += 1
        assert np.isfinite(loss)
    assert np.isfinite(tr.validate())
    assert np.isfinite(v0)


def test_warm_start_seeds_best_state(setup):
    """If no trained epoch beats the warm-started val loss, best_state is
    the ALS-equivalent model (training can only improve, never regress)."""
    cfg, bundle, masker = setup
    tr = Trainer(build_model(cfg, bundle.graph), bundle.graph, masker, cfg)
    warm_start_trainer(tr, rank=4, reg=3.0)
    assert tr.best_state is not None
    assert np.isfinite(tr.best_val_loss)
    seeded_val = tr.best_val_loss
    for _ in range(3):
        tr.train_epoch()
        tr.epoch += 1
    # best-val tracker only moves downward from the seeded value
    assert tr.best_val_loss <= seeded_val


def test_membership_matrix_offsets_and_dedup():
    from multi_modal_gnn_tpu.evaluation.baselines import membership_matrix

    m = membership_matrix(
        3,
        [
            (np.array([0, 0, 2, 2]), np.array([1, 1, 0, 1]), 2),  # dup (0,1)
            (np.array([1]), np.array([0]), 3),
        ],
    )
    assert m.shape == (3, 5)
    want = np.zeros((3, 5), dtype=np.float32)
    want[0, 1] = 1.0
    want[2, 0] = 1.0
    want[2, 1] = 1.0
    want[1, 2] = 1.0  # second relation offset by 2
    np.testing.assert_array_equal(m, want)


@pytest.mark.parametrize("arch", ["RGCN", "HGT"])
def test_sideinfo_epoch0_equals_baseline(arch):
    """The side-information plant puts the model exactly AT the
    SideInfoALSBaseline predictor (<U,C> + b + <G,H> through the
    embedding-bilinear channel)."""
    from multi_modal_gnn_tpu.evaluation.baselines import SideInfoALSBaseline
    from multi_modal_gnn_tpu.training.warmstart import bundle_membership_matrix

    rank, mem_rank = 4, 3
    cfg = _mf_config(rank=rank + 1 + mem_rank, arch=arch)
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=3), cfg)
    masker = EdgeMasker(bundle.graph, seed=7, host_edges=bundle.patient_lab_host())
    tr = Trainer(build_model(cfg, bundle.graph), bundle.graph, masker, cfg)
    memberships = bundle_membership_matrix(bundle)
    si = warm_start_trainer(tr, rank=rank, reg=3.0, memberships=memberships,
                            mem_rank=mem_rank)
    assert isinstance(si, SideInfoALSBaseline)
    tep, tel, tev = masker.split_arrays("test")
    got = tr.predict("test").astype(np.float64)
    want = si.predict(tep, tel)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sideinfo_rank_too_small_rejected():
    from multi_modal_gnn_tpu.evaluation.baselines import SideInfoALSBaseline
    from multi_modal_gnn_tpu.training.warmstart import sideinfo_warm_start_params

    cfg = _mf_config(rank=5)  # needs rank+1+mem_rank = 8 slots
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=3), cfg)
    masker = EdgeMasker(bundle.graph, seed=7, host_edges=bundle.patient_lab_host())
    tr = Trainer(build_model(cfg, bundle.graph), bundle.graph, masker, cfg)
    si = SideInfoALSBaseline(
        bundle.graph.num_nodes("patient"), bundle.graph.num_nodes("lab"),
        rank=4, mem_rank=3,
    )
    with pytest.raises(ValueError, match="bilinear_rank"):
        sideinfo_warm_start_params(tr.state.params, si)


def test_rank_too_large_rejected(setup):
    cfg, bundle, masker = setup
    tr = Trainer(build_model(cfg, bundle.graph), bundle.graph, masker, cfg)
    from multi_modal_gnn_tpu.evaluation.baselines import ALSBaseline

    als = ALSBaseline(
        bundle.graph.num_nodes("patient"), bundle.graph.num_nodes("lab"), rank=5
    )
    # bilinear_rank is 5 -> needs rank+1=6 slots: must refuse
    with pytest.raises(ValueError, match="bilinear_rank"):
        als_warm_start_params(tr.state.params, als)


@pytest.mark.parametrize("strategy", ["2d", "gspmd"])
def test_warm_start_composes_with_table_sharding(strategy):
    """The plant preserves the table-sharding trainers' placement (round-5
    verdict item 4): epoch-0 val loss of a warm-started 2d/gspmd trainer
    equals the replicated single-device plant, and the patient table (with
    its adam moments) keeps its model-axis row sharding."""
    import jax

    cfg = _mf_config(rank=5, arch="RGCN")
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=3), cfg)
    masker = EdgeMasker(bundle.graph, seed=7, host_edges=bundle.patient_lab_host())

    ref = Trainer(build_model(cfg, bundle.graph), bundle.graph, masker, cfg)
    warm_start_trainer(ref, rank=4, reg=3.0)
    ref_val = ref.best_val_loss

    if strategy == "2d":
        from multi_modal_gnn_tpu.parallel.dp2d import MODEL_AXIS, TwoDTrainer, make_2d_mesh

        tr = TwoDTrainer(
            bundle.graph, masker, cfg, mesh=make_2d_mesh(8, 2),
            host_edges=bundle.host_edges,
        )
    else:
        from multi_modal_gnn_tpu.parallel.dp2d import MODEL_AXIS
        from multi_modal_gnn_tpu.parallel.gspmd import GSPMDTrainer, make_2d_mesh

        tr = GSPMDTrainer(bundle.graph, masker, cfg, mesh=make_2d_mesh(8, 2))

    def _table_sharding(state):
        emb = state.params["embeddings"] if "embeddings" in state.params else state.params
        # find the patient embedding table leaf by its row count
        num_p = bundle.graph.num_nodes("patient")
        leaves = [
            x for x in jax.tree_util.tree_leaves(state.params)
            if getattr(x, "ndim", 0) == 2 and x.shape[0] == num_p
        ]
        assert leaves, "patient table leaf not found"
        return leaves[0].sharding

    before = _table_sharding(tr.state)
    assert MODEL_AXIS in str(before.spec), before  # row-sharded before plant
    warm_start_trainer(tr, rank=4, reg=3.0)
    after = _table_sharding(tr.state)
    assert str(after.spec) == str(before.spec), (before, after)
    np.testing.assert_allclose(tr.best_val_loss, ref_val, rtol=2e-5, atol=2e-5)

    # one epoch must run under the preserved placement
    tr.train_epoch()
