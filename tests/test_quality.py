"""Realistic-cohort quality pins (VERDICT round-1 item 1).

On the eICU-statistics-matched synthetic cohort (signal 0.6, the
"realistic" generator), the measured quality ladder is:

    Bayes conditional ceiling (oracle W, train obs):  R^2 = 0.195
    ALS rank-8 (best classical learnable):            R^2 = 0.178
    this framework, ALS-warm-started GNN:             R^2 = 0.174-0.178
    this framework, tuned faithful config:            R^2 = 0.10-0.12
    reference-faithful default config:                R^2 = 0.073

(outputs/diagnostics/quality_*.json; README "Results").  These tests pin
the deliverable numbers so a regression that halves them fails CI:

  * the ALS warm start must put the model AT the ALS predictor (>= 0.17
    here, vs 0.178 measured — the plant is a closed-form solve, so only
    float-platform jitter needs margin);
  * fine-tuning from the warm start must NOT destroy that quality
    (best-val seeding guarantees the selected state only improves).

Full-length training curves are exercised by scripts/diagnose_quality.py,
not CI (1300 epochs is minutes on CPU).
"""

import dataclasses

import numpy as np
import pytest

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, generate_synthetic_tables
from multi_modal_gnn_tpu.evaluation.metrics import compute_regression_metrics
from multi_modal_gnn_tpu.graph.build import build_heterogeneous_graph
from multi_modal_gnn_tpu.models.factory import build_model
from multi_modal_gnn_tpu.training.masker import EdgeMasker
from multi_modal_gnn_tpu.training.trainer import Trainer
from multi_modal_gnn_tpu.training.warmstart import warm_start_trainer

RANK = 8


@pytest.fixture(scope="module")
def realistic():
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            edge_head=dataclasses.replace(
                cfg.model.edge_head,
                extras={"bilinear_rank": RANK + 1, "bilinear_source": "embedding"},
            ),
        ),
        train=dataclasses.replace(cfg.train, loss="mse"),
    )
    spec = dataclasses.replace(SyntheticSpec.eicu_demo(), seed=0, signal_strength=0.6)
    tables = generate_synthetic_tables(spec)
    bundle = build_heterogeneous_graph(
        labs=tables["labs_normalized"],
        diagnoses=tables["diagnoses"],
        medications=tables["medications"],
        cohort=tables["cohort"],
        labitems=tables["labitems"],
        config=cfg,
    )
    masker = EdgeMasker(bundle.graph, seed=42, host_edges=bundle.patient_lab_host())
    trainer = Trainer(build_model(cfg, bundle.graph), bundle.graph, masker, cfg)
    als = warm_start_trainer(trainer, rank=RANK, reg=12.0)
    return cfg, bundle, masker, trainer, als


def test_warm_start_hits_als_quality(realistic):
    """Epoch-0 (warm-started, untrained) test R^2 on the realistic cohort:
    measured 0.178 — pinned at >= 0.17 (the plant is a closed-form ALS
    solve, deterministic given the data and split seeds; only float-platform
    jitter remains)."""
    _, _, masker, trainer, _ = realistic
    _, _, tev = masker.split_arrays("test")
    m = compute_regression_metrics(trainer.predict("test").astype(np.float64), tev)
    assert m["r2"] >= 0.17, f"warm-start quality regressed: R^2={m['r2']:.4f}"
    assert m["mae"] <= 0.76, f"warm-start MAE regressed: {m['mae']:.4f}"


@pytest.mark.parametrize("data_seed,floor", [(1, 0.17), (2, 0.17)])
def test_warm_start_replicates_across_data_seeds(data_seed, floor):
    """Cross-seed replication of the headline quality result (README
    "Results"): the ALS-warm-started model reaches ~90% of each cohort's
    own Bayes conditional ceiling.  Measured epoch-0 R^2 (re-measured
    round 3, == the canonical rank-8/reg-12 ALS rows in
    outputs/diagnostics/quality_sideinfo_ds{1,2}.json): 0.180 (seed 1),
    0.197 (seed 2) — pinned at 0.17 with float-platform margin only."""
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            edge_head=dataclasses.replace(
                cfg.model.edge_head,
                extras={"bilinear_rank": RANK + 1, "bilinear_source": "embedding"},
            ),
        ),
        train=dataclasses.replace(cfg.train, loss="mse"),
    )
    spec = dataclasses.replace(
        SyntheticSpec.eicu_demo(), seed=data_seed, signal_strength=0.6
    )
    tables = generate_synthetic_tables(spec)
    bundle = build_heterogeneous_graph(
        labs=tables["labs_normalized"],
        diagnoses=tables["diagnoses"],
        medications=tables["medications"],
        cohort=tables["cohort"],
        labitems=tables["labitems"],
        config=cfg,
    )
    masker = EdgeMasker(bundle.graph, seed=42, host_edges=bundle.patient_lab_host())
    trainer = Trainer(build_model(cfg, bundle.graph), bundle.graph, masker, cfg)
    warm_start_trainer(trainer, rank=RANK, reg=12.0)
    _, _, tev = masker.split_arrays("test")
    m = compute_regression_metrics(trainer.predict("test").astype(np.float64), tev)
    assert m["r2"] >= floor, (
        f"cross-seed warm-start regressed (data_seed={data_seed}): R^2={m['r2']:.4f}"
    )


def test_sideinfo_warm_start_beats_labs_only_ceiling(realistic):
    """The dx/rx side-information channel (SideInfoALSBaseline plant,
    round 2): dx/rx membership is tilted by the same latent state
    (data/synthetic.py), so conditioning on it carries signal BEYOND the
    labs-only Bayes ceiling (0.195 on this cohort).  Measured epoch-0 test
    R^2 = 0.236 vs 0.178 for the labs-only ALS plant (cross-fitted
    oracle-combined ceiling: 0.257).  Pinned: >= 0.225 — above the labs-only
    ceiling, so a regression to a values-only predictor fails this test,
    and tight (closed-form plant, deterministic given seeds): a >0.011
    regression in the flagship deliverable fails CI."""
    cfg, bundle, _, _, _ = realistic
    from multi_modal_gnn_tpu.training.warmstart import bundle_membership_matrix

    si_cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            edge_head=dataclasses.replace(
                cfg.model.edge_head,
                extras={"bilinear_rank": 2 * RANK + 1, "bilinear_source": "embedding"},
            ),
        ),
    )
    masker = EdgeMasker(bundle.graph, seed=42, host_edges=bundle.patient_lab_host())
    trainer = Trainer(build_model(si_cfg, bundle.graph), bundle.graph, masker, si_cfg)
    si = warm_start_trainer(
        trainer, rank=RANK, reg=12.0, memberships=bundle_membership_matrix(bundle)
    )
    _, _, tev = masker.split_arrays("test")
    m = compute_regression_metrics(trainer.predict("test").astype(np.float64), tev)
    assert m["r2"] >= 0.225, f"side-info quality regressed: R^2={m['r2']:.4f}"
    assert m["mae"] <= 0.73, f"side-info MAE regressed: {m['mae']:.4f}"
    # and the baseline itself must beat plain ALS by a clear margin
    tep, tel, _ = masker.split_arrays("test")
    si_r2 = compute_regression_metrics(si.predict(tep, tel), tev)["r2"]
    assert si_r2 >= 0.225


def test_hgt_warm_start_hits_als_quality(realistic):
    """HGT with the shared quality channels (embedding-bilinear head + ALS
    warm start) matches the RGCN headline on the realistic cohort: measured
    epoch-0 R^2 = 0.178 raw / 0.182 winsorized, retained through a
    1,300-epoch fine-tune (outputs/diagnostics/quality_hgt_alsinit.json).
    Pinned >= 0.17 with the same margin as the RGCN pin."""
    cfg, bundle, _, _, _ = realistic
    hgt_cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, architecture="HGT")
    )
    masker = EdgeMasker(bundle.graph, seed=42, host_edges=bundle.patient_lab_host())
    trainer = Trainer(build_model(hgt_cfg, bundle.graph), bundle.graph, masker, hgt_cfg)
    warm_start_trainer(trainer, rank=RANK, reg=12.0)
    _, _, tev = masker.split_arrays("test")
    m = compute_regression_metrics(trainer.predict("test").astype(np.float64), tev)
    assert m["r2"] >= 0.17, f"HGT warm-start quality regressed: R^2={m['r2']:.4f}"
    assert m["mae"] <= 0.76, f"HGT warm-start MAE regressed: {m['mae']:.4f}"


def test_fine_tune_retains_quality(realistic):
    """30 epochs of fine-tuning at lr 1e-4 must keep the best-val-selected
    state at ALS-level quality (the seeding makes regression impossible by
    construction; this exercises the full train loop on the realistic
    cohort end-to-end)."""
    cfg, bundle, masker, trainer, _ = realistic
    seeded_val = trainer.best_val_loss
    for _ in range(30):
        loss = trainer.train_epoch()
        assert np.isfinite(loss)
        val = trainer.validate()
        if val < trainer.best_val_loss:
            trainer.best_val_loss = val
            import jax

            trainer.best_state = jax.tree_util.tree_map(lambda x: x.copy(), trainer.state)
        trainer.epoch += 1
    assert trainer.best_val_loss <= seeded_val
    _, _, tev = masker.split_arrays("test")
    best = trainer.best_state
    m = compute_regression_metrics(
        trainer.predict("test", state=best).astype(np.float64), tev
    )
    assert m["r2"] >= 0.17, f"fine-tuned quality regressed: R^2={m['r2']:.4f}"
