"""Multi-device data parallelism on the 8-virtual-device CPU mesh:
the sharded trainer must reproduce single-device numerics exactly."""

import dataclasses

import jax
import numpy as np
import pytest

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle
from multi_modal_gnn_tpu.models.factory import build_model
from multi_modal_gnn_tpu.parallel import DataParallelTrainer, make_mesh, shard_graph
from multi_modal_gnn_tpu.training.masker import EdgeMasker
from multi_modal_gnn_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def setup():
    """dropout=0 for bit-parity: with dropout on, edge-head masks are drawn
    per shard (independent by design — see models/layers.py), so sharded
    training is statistically but not bit-wise identical."""
    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, hidden_dim=32, dropout=0.0),
        train=dataclasses.replace(cfg.train, donate_state=False),
    )
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=5), cfg)
    return cfg, bundle


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_graph_layout(setup):
    cfg, bundle = setup
    mesh = make_mesh()
    g = shard_graph(bundle.graph, mesh)
    es = g.patient_lab
    # edge arrays sharded over 8 devices, node arrays replicated
    assert len(es.src.sharding.device_set) == 8
    assert not es.src.sharding.is_fully_replicated
    assert es.dst_count.sharding.is_fully_replicated


def test_dp_matches_single_device(setup):
    """5 epochs single-device vs 8-device shard_map: identical losses."""
    cfg, bundle = setup
    graph = bundle.graph

    masker_a = EdgeMasker(graph, seed=42)
    model = build_model(cfg, graph)
    single = Trainer(model, graph, masker_a, cfg)

    masker_b = EdgeMasker(graph, seed=42)
    dp = DataParallelTrainer(graph, masker_b, cfg, mesh=make_mesh())

    losses_s, losses_d = [], []
    for _ in range(5):
        losses_s.append(single.train_epoch())
        single.epoch += 1
        losses_d.append(dp.train_epoch())
        dp.epoch += 1
    np.testing.assert_allclose(losses_s, losses_d, rtol=2e-4)

    np.testing.assert_allclose(
        single.validate("val"), dp.validate("val"), rtol=2e-4
    )
    # parameters stay in sync too
    pa = jax.tree_util.tree_leaves(single.state.params)
    pb = jax.tree_util.tree_leaves(dp.state.params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)


def test_dp_predictions_match(setup):
    cfg, bundle = setup
    graph = bundle.graph
    masker = EdgeMasker(graph, seed=42)
    model = build_model(cfg, graph)
    single = Trainer(model, graph, masker, cfg)
    dp = DataParallelTrainer(graph, EdgeMasker(graph, seed=42), cfg, mesh=make_mesh())
    ps = single.predict("test")
    pd_ = dp.predict("test")
    np.testing.assert_allclose(ps, pd_, rtol=2e-4, atol=1e-5)


def test_dp_scan_chunk_matches_loop(setup):
    """5 epochs via ONE shard_map'd lax.scan dispatch == 5 per-epoch DP
    dispatches == 5 single-device epochs (the supervision mask inside the
    scan is the global draw, dynamic-sliced per shard)."""
    cfg, bundle = setup
    graph = bundle.graph

    loop = DataParallelTrainer(graph, EdgeMasker(graph, seed=42), cfg, mesh=make_mesh())
    losses_loop = []
    for _ in range(5):
        losses_loop.append(loop.train_epoch())
        loop.epoch += 1

    scan = DataParallelTrainer(graph, EdgeMasker(graph, seed=42), cfg, mesh=make_mesh())
    losses_scan, val_scan = scan.train_epochs_scanned(5, with_val=True)
    np.testing.assert_allclose(losses_loop, losses_scan, rtol=2e-4)
    assert np.isfinite(val_scan).all()

    # and the single-device scan agrees too
    single = Trainer(
        build_model(cfg, graph), graph, EdgeMasker(graph, seed=42), cfg
    )
    losses_single, _ = single.train_epochs_scanned(5)
    np.testing.assert_allclose(losses_single, losses_scan, rtol=2e-4)

    pa = jax.tree_util.tree_leaves(loop.state.params)
    pb = jax.tree_util.tree_leaves(scan.state.params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)


def test_sharded_windowed_aggregate_matches_xla(setup):
    """The shard_map Pallas tier (per-shard windowed plans + placement +
    psum) must match replicated XLA aggregation exactly."""
    from jax.sharding import PartitionSpec as P

    from multi_modal_gnn_tpu.graph.schema import PATIENT_LAB
    from multi_modal_gnn_tpu.ops.segment import aggregate_neighbors
    from multi_modal_gnn_tpu.parallel.sharding import graph_pspecs

    cfg, bundle = setup
    mesh = make_mesh()
    g = shard_graph(bundle.graph, mesh, host_edges=bundle.host_edges)
    es = g.edges[PATIENT_LAB]
    assert es.shard_win_src is not None and es.shard_win_windows > 0
    # plan arrays sharded, offsets one per device
    assert not es.shard_win_src.sharding.is_fully_replicated
    num_src = es.num_src
    rng = np.random.default_rng(0)
    x = np.asarray(rng.normal(size=(num_src, 32)), np.float32)

    for agg in ("mean", "sum"):
        def body(graph, xr):
            return aggregate_neighbors(
                xr, graph.edges[PATIENT_LAB], agg, impl="pallas", axis_name="data"
            )

        out = jax.jit(
            jax.shard_map(
                body, mesh=mesh, in_specs=(graph_pspecs(g), P()), out_specs=P()
            )
        )(g, x)
        want = aggregate_neighbors(
            x, bundle.graph.edges[PATIENT_LAB], agg, impl="xla"
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want), rtol=2e-4, atol=2e-4
        )

    # gradient parity through the sharded kernel's backward (kernel custom
    # VJP -> per-shard scatter -> replicated-input psum)
    w = np.asarray(rng.normal(size=want.shape), np.float32)

    def loss_sharded(graph, xr):
        return jnp.sum(
            aggregate_neighbors(
                xr, graph.edges[PATIENT_LAB], "mean", impl="pallas",
                axis_name="data",
            )
            * w
        )

    import jax.numpy as jnp  # noqa: PLC0415

    def grad_body(graph, xr):
        # vma tracking auto-restores the replicated gradient of the
        # replicated input (the cotangent psum is inserted by shard_map)
        return jax.grad(loss_sharded, argnums=1)(graph, xr)

    g_sh = jax.jit(
        jax.shard_map(
            grad_body,
            mesh=mesh, in_specs=(graph_pspecs(g), P()), out_specs=P(),
        )
    )(g, x)
    g_ref = jax.grad(
        lambda xr: jnp.sum(
            aggregate_neighbors(xr, bundle.graph.edges[PATIENT_LAB], "mean", impl="xla") * w
        )
    )(x)
    np.testing.assert_allclose(
        np.asarray(g_sh), np.asarray(g_ref), rtol=2e-4, atol=2e-4
    )


def test_dp_with_shard_plans_matches_single_device(setup):
    """DataParallelTrainer(host_edges=...) routes aggregation through the
    per-shard Pallas kernel; training numerics must still match the
    single-device Trainer (which runs the single-chip Pallas tiers)."""
    cfg, bundle = setup
    # use_pallas on BOTH sides: single-device runs the single-chip tiers
    # (dense here), DP routes through the per-shard windowed kernel.  SGD:
    # updates are LINEAR in the gradients, so tier-level f32 accumulation
    # noise stays tiny — Adam's first steps amplify near-zero gradient sign
    # flips to 2*lr, which would compare optimizer chaos, not the kernel.
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, use_pallas=True),
        train=dataclasses.replace(
            cfg.train,
            optimizer=dataclasses.replace(cfg.train.optimizer, type="sgd"),
        ),
    )
    graph = bundle.graph

    single = Trainer(build_model(cfg, graph), graph, EdgeMasker(graph, seed=42), cfg)
    dp = DataParallelTrainer(
        graph, EdgeMasker(graph, seed=42), cfg, mesh=make_mesh(),
        host_edges=bundle.host_edges,
    )
    from multi_modal_gnn_tpu.graph.schema import PATIENT_LAB

    assert dp.graph.edges[PATIENT_LAB].shard_win_src is not None

    losses_s, losses_d = [], []
    for _ in range(4):
        losses_s.append(single.train_epoch())
        single.epoch += 1
        losses_d.append(dp.train_epoch())
        dp.epoch += 1
    # cross-TIER comparison (dense single-chip vs per-shard kernel): benign
    # f32 accumulation differences compound through BN/L2-normalize at
    # ~1e-4/epoch; exact kernel parity is pinned at the op level above
    np.testing.assert_allclose(losses_s, losses_d, rtol=1e-3)
    np.testing.assert_allclose(single.validate("val"), dp.validate("val"), rtol=1e-3)

    # the scanned path shares the same graph pspecs (incl. plan leaves) and
    # the same tier as the per-epoch DP loop -> tight tolerance
    scan = DataParallelTrainer(
        graph, EdgeMasker(graph, seed=42), cfg, mesh=make_mesh(),
        host_edges=bundle.host_edges,
    )
    losses_scan, _ = scan.train_epochs_scanned(4, with_val=True)
    np.testing.assert_allclose(losses_d, losses_scan, rtol=2e-4)


def test_2d_with_shard_plans_matches_dp(setup):
    """TwoDTrainer(host_edges=...) attaches per-shard kernel plans over the
    DATA axis (replicated over MODEL); its trajectory must match the 1-D DP
    trainer running the same per-shard kernel tier."""
    from multi_modal_gnn_tpu.graph.schema import PATIENT_LAB
    from multi_modal_gnn_tpu.parallel.dp2d import TwoDTrainer, make_2d_mesh

    cfg, bundle = setup
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, use_pallas=True),
        train=dataclasses.replace(
            cfg.train,
            optimizer=dataclasses.replace(cfg.train.optimizer, type="sgd"),
        ),
    )
    graph = bundle.graph

    dp = DataParallelTrainer(
        graph, EdgeMasker(graph, seed=42), cfg, mesh=make_mesh(),
        host_edges=bundle.host_edges,
    )
    two_d = TwoDTrainer(
        graph, EdgeMasker(graph, seed=42), cfg, mesh=make_2d_mesh(8, 2),
        host_edges=bundle.host_edges,
    )
    es = two_d.graph.edges[PATIENT_LAB]
    assert es.shard_win_src is not None and es.shard_win_windows > 0
    # plan chunks: 4-way over data (mesh is 4 data x 2 model), so the DP
    # trainer (8-way) builds DIFFERENT chunks — parity is cross-partition
    losses_d, losses_t = [], []
    for _ in range(4):
        losses_d.append(dp.train_epoch())
        dp.epoch += 1
        losses_t.append(two_d.train_epoch())
        two_d.epoch += 1
    # different plan partitions (8-way vs 4-way chunks) accumulate in
    # different orders; SGD keeps the drift at f32-accumulation scale
    np.testing.assert_allclose(losses_d, losses_t, rtol=1e-3)
    np.testing.assert_allclose(dp.validate("val"), two_d.validate("val"), rtol=1e-3)

    # scanned epochs share the tier and the 4-way partition -> tight
    scan = TwoDTrainer(
        graph, EdgeMasker(graph, seed=42), cfg, mesh=make_2d_mesh(8, 2),
        host_edges=bundle.host_edges,
    )
    losses_scan, _ = scan.train_epochs_scanned(4, with_val=True)
    np.testing.assert_allclose(losses_t, losses_scan, rtol=2e-4)


def test_dp_trains_with_dropout(setup):
    """With dropout on, DP training still works (per-shard independent head
    masks) and the loss goes down."""
    cfg, bundle = setup
    cfg_do = cfg.replace(model=dataclasses.replace(cfg.model, dropout=0.2))
    graph = bundle.graph
    dp = DataParallelTrainer(graph, EdgeMasker(graph, seed=42), cfg_do, mesh=make_mesh())
    losses = []
    for _ in range(8):
        losses.append(dp.train_epoch())
        dp.epoch += 1
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 1.5  # sane, not exploding


def test_sharded_hgt_matches_single_device(setup):
    """The attention variant under shard_map DP: segment-softmax combines
    per-shard maxima/normalizers with pmax/psum, so sharded == single."""
    cfg, bundle = setup
    cfg_hgt = cfg.replace(model=dataclasses.replace(cfg.model, architecture="HGT"))
    graph = bundle.graph

    single = Trainer(
        build_model(cfg_hgt, graph), graph, EdgeMasker(graph, seed=42), cfg_hgt
    )
    dp = DataParallelTrainer(graph, EdgeMasker(graph, seed=42), cfg_hgt, mesh=make_mesh())

    losses_s, losses_d = [], []
    for _ in range(3):
        losses_s.append(single.train_epoch())
        single.epoch += 1
        losses_d.append(dp.train_epoch())
        dp.epoch += 1
    np.testing.assert_allclose(losses_s, losses_d, rtol=2e-4)
    np.testing.assert_allclose(single.validate("val"), dp.validate("val"), rtol=2e-4)


class TestTwoDShardMap:
    def test_2d_explicit_matches_single_device(self, setup):
        """Explicit (4 data x 2 model) shard_map program: edges sharded over
        data, patient table + adam moments sharded over model (forward
        all_gather / backward reduce-scatter placed by hand) — numerics must
        match single-device exactly."""
        from multi_modal_gnn_tpu.parallel.dp2d import TwoDTrainer, make_2d_mesh

        cfg, bundle = setup
        graph = bundle.graph

        single = Trainer(build_model(cfg, graph), graph, EdgeMasker(graph, seed=42), cfg)
        mesh = make_2d_mesh(8, model_parallel=2)
        two_d = TwoDTrainer(graph, EdgeMasker(graph, seed=42), cfg, mesh=mesh)

        # the table and its adam moments live sharded over the model axis
        emb = two_d.state.params["embed_patient"]["embedding"]
        assert not emb.sharding.is_fully_replicated
        mu_leaves = [
            leaf
            for path, leaf in jax.tree_util.tree_leaves_with_path(two_d.state.opt_state)
            if "embed_patient" in "/".join(str(getattr(p, "key", p)) for p in path)
            and getattr(leaf, "ndim", 0) == 2
        ]
        assert mu_leaves and all(not m.sharding.is_fully_replicated for m in mu_leaves)

        losses_s, losses_t = [], []
        for _ in range(4):
            losses_s.append(single.train_epoch())
            single.epoch += 1
            losses_t.append(two_d.train_epoch())
            two_d.epoch += 1
        np.testing.assert_allclose(losses_s, losses_t, rtol=2e-4)
        np.testing.assert_allclose(single.validate("val"), two_d.validate("val"), rtol=2e-4)
        np.testing.assert_allclose(
            single.predict("test"), two_d.predict("test"), rtol=2e-4, atol=1e-5
        )

    def test_indivisible_patients_rejected(self, setup):
        from multi_modal_gnn_tpu.parallel.dp2d import TwoDTrainer, make_2d_mesh

        cfg, _ = setup
        spec_bad = SyntheticSpec(
            num_patients=121, num_labs=10, num_diagnoses=5, num_medications=5,
            mean_labs_per_patient=5.0, latent_dim=2, seed=0,
        )
        bad = make_synthetic_bundle(spec_bad, cfg)
        mesh = make_2d_mesh(8, model_parallel=2)
        with pytest.raises(ValueError, match="not divisible"):
            TwoDTrainer(bad.graph, EdgeMasker(bad.graph, seed=0), cfg, mesh=mesh)


class TestGSPMD:
    def test_2d_mesh_matches_single_device(self, setup):
        """(4 data x 2 model) GSPMD step with the patient table sharded
        row-wise must reproduce single-device numerics (dropout off)."""
        from multi_modal_gnn_tpu.parallel.gspmd import GSPMDTrainer, make_2d_mesh

        cfg, bundle = setup
        graph = bundle.graph

        single = Trainer(build_model(cfg, graph), graph, EdgeMasker(graph, seed=42), cfg)
        mesh = make_2d_mesh(8, model_parallel=2)
        gsp = GSPMDTrainer(graph, EdgeMasker(graph, seed=42), cfg, mesh=mesh)

        # patient embedding lives sharded over the model axis
        emb = gsp.state.params["embed_patient"]["embedding"]
        assert not emb.sharding.is_fully_replicated

        losses_s, losses_g = [], []
        for _ in range(4):
            losses_s.append(single.train_epoch())
            single.epoch += 1
            losses_g.append(gsp.train_epoch())
            gsp.epoch += 1
        np.testing.assert_allclose(losses_s, losses_g, rtol=2e-4)
        np.testing.assert_allclose(single.validate("val"), gsp.validate("val"), rtol=2e-4)

    def test_indivisible_patient_count_rejected(self, setup):
        from multi_modal_gnn_tpu.parallel.gspmd import GSPMDTrainer, make_2d_mesh

        cfg, bundle = setup
        mesh = make_2d_mesh(8, model_parallel=2)
        spec_bad = SyntheticSpec(
            num_patients=121, num_labs=10, num_diagnoses=5, num_medications=5,
            mean_labs_per_patient=5.0, latent_dim=2, seed=0,
        )
        bad = make_synthetic_bundle(spec_bad, cfg)
        with pytest.raises(ValueError, match="not divisible"):
            GSPMDTrainer(bad.graph, EdgeMasker(bad.graph, seed=0), cfg, mesh=mesh)


def test_dp_value_context_matches_single_device():
    """value_context under the explicit shard_map trainer: the visibility
    base rides the graph (sharded with the edge arrays) and the per-epoch
    knockout runs shard-locally after an all_gather of the supervision mask
    (Trainer._visible_graph).  Must reproduce single-device numerics."""
    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, hidden_dim=32, dropout=0.0, extras={"value_context": True}
        ),
        train=dataclasses.replace(cfg.train, donate_state=False),
    )
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=5), cfg)
    graph = bundle.graph

    single = Trainer(
        build_model(cfg, graph), graph,
        EdgeMasker(graph, seed=42, host_edges=bundle.patient_lab_host()), cfg,
    )
    dp = DataParallelTrainer(
        graph, EdgeMasker(graph, seed=42, host_edges=bundle.patient_lab_host()),
        cfg, mesh=make_mesh(),
    )

    losses_s, losses_d = [], []
    for _ in range(4):
        losses_s.append(single.train_epoch())
        single.epoch += 1
        losses_d.append(dp.train_epoch())
        dp.epoch += 1
    np.testing.assert_allclose(losses_s, losses_d, rtol=2e-4)
    np.testing.assert_allclose(single.validate("val"), dp.validate("val"), rtol=2e-4)

    # the scanned path agrees too
    scan = DataParallelTrainer(
        graph, EdgeMasker(graph, seed=42, host_edges=bundle.patient_lab_host()),
        cfg, mesh=make_mesh(),
    )
    losses_scan, _ = scan.train_epochs_scanned(4)
    np.testing.assert_allclose(np.asarray(losses_scan), losses_s, rtol=2e-4)

    # and the explicit 2-D (edges x patient-table) trainer
    from multi_modal_gnn_tpu.parallel.dp2d import TwoDTrainer, make_2d_mesh

    two_d = TwoDTrainer(
        graph, EdgeMasker(graph, seed=42, host_edges=bundle.patient_lab_host()),
        cfg, mesh=make_2d_mesh(model_parallel=2),
    )
    losses_2d = []
    for _ in range(4):
        losses_2d.append(two_d.train_epoch())
        two_d.epoch += 1
    np.testing.assert_allclose(losses_2d, losses_s, rtol=2e-4)


def test_2d_scan_chunk_matches_loop(setup):
    """TwoDTrainer scan-chunked epochs == per-epoch loop (the patient table
    and its adam moments stay model-axis-sharded through the scan)."""
    from multi_modal_gnn_tpu.parallel.dp2d import TwoDTrainer, make_2d_mesh

    cfg, bundle = setup

    def run(chunked: bool):
        masker = EdgeMasker(bundle.graph, seed=3)
        t = TwoDTrainer(bundle.graph, masker, cfg, mesh=make_2d_mesh(8, 2))
        if chunked:
            train_losses, val_losses = t.train_epochs_scanned(4, with_val=True)
            return np.asarray(train_losses), np.asarray(val_losses)
        tl, vl = [], []
        for _ in range(4):
            tl.append(t.train_epoch())
            vl.append(t.validate("val"))
            t.epoch += 1
        return np.asarray(tl), np.asarray(vl)

    tl_loop, vl_loop = run(False)
    tl_scan, vl_scan = run(True)
    np.testing.assert_allclose(tl_scan, tl_loop, rtol=2e-4)
    np.testing.assert_allclose(vl_scan, vl_loop, rtol=2e-4)


@pytest.mark.parametrize("strategy,cls_name", [
    ("dp", "DataParallelTrainer"), ("2d", "TwoDTrainer"), ("gspmd", "GSPMDTrainer"),
])
def test_train_pipeline_routes_parallel_extras(tmp_path, setup, strategy, cls_name):
    """train.extras.parallel selects the multi-device trainer from config
    (with model.use_pallas, dp/2d also attach per-shard kernel plans)."""
    from multi_modal_gnn_tpu.graph.schema import PATIENT_LAB
    from multi_modal_gnn_tpu.training.trainer import train_pipeline

    cfg, bundle = setup
    cfg2 = cfg.replace(
        model=dataclasses.replace(cfg.model, use_pallas=(strategy != "gspmd")),
        train=dataclasses.replace(
            cfg.train, epochs=2, scan_chunk=1,
            extras={**cfg.train.extras, "parallel": strategy},
        ),
    )
    trainer, results = train_pipeline(cfg2, bundle, tmp_path / strategy)
    assert type(trainer).__name__ == cls_name
    if strategy in ("dp", "2d"):
        assert trainer.graph.edges[PATIENT_LAB].shard_win_src is not None
    assert np.isfinite(results["test_loss"])


def test_train_pipeline_parallel_cluster_composition(tmp_path, setup):
    """Round 4: parallel=dp now COMPOSES with mini-batch clustering
    (parallel/minibatch_dp.py — the beyond-HBM x multi-chip cell); the
    table-sharding strategies still reject clusters with a reasoned
    error (their patient-table shards conflict with patient_id_base
    windows)."""
    cfg, bundle = setup
    from multi_modal_gnn_tpu.parallel.minibatch_dp import MiniBatchDPTrainer
    from multi_modal_gnn_tpu.training.trainer import train_pipeline

    cfg2 = cfg.replace(
        train=dataclasses.replace(
            cfg.train, epochs=1,
            extras={**cfg.train.extras, "parallel": "dp", "num_clusters": 2},
        ),
    )
    trainer, results = train_pipeline(cfg2, bundle, tmp_path)
    assert isinstance(trainer, MiniBatchDPTrainer)
    assert np.isfinite(results["test_loss"])

    cfg3 = cfg.replace(
        train=dataclasses.replace(
            cfg.train, epochs=1,
            extras={**cfg.train.extras, "parallel": "2d", "num_clusters": 2},
        ),
    )
    with pytest.raises(ValueError, match="composes with"):
        train_pipeline(cfg3, bundle, tmp_path / "b")


def test_parallel_fit_checkpoint_resume(tmp_path, setup):
    """fit + mid-training resume works for the sharded trainers: a DP run
    interrupted at epoch 2 and resumed matches the uninterrupted run, and a
    resumed TwoDTrainer re-places its patient table on the model axis."""
    from multi_modal_gnn_tpu.parallel.dp2d import TwoDTrainer, make_2d_mesh

    cfg, bundle = setup
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, epochs=4, scan_chunk=1),
        logging=dataclasses.replace(
            cfg.logging, save_checkpoints=True, checkpoint_interval=2
        ),
    )
    graph = bundle.graph

    def run_dp(out, resume):
        t = DataParallelTrainer(graph, EdgeMasker(graph, seed=11), cfg, mesh=make_mesh())
        t.fit(output_dir=out, resume_from=resume)
        return t

    full = run_dp(tmp_path / "full", None)
    part_cfg_dir = tmp_path / "part"
    t_part = DataParallelTrainer(graph, EdgeMasker(graph, seed=11), cfg.replace(
        train=dataclasses.replace(cfg.train, epochs=2)), mesh=make_mesh())
    t_part.fit(output_dir=part_cfg_dir)
    resumed = run_dp(part_cfg_dir, part_cfg_dir / "checkpoint_epoch_2.ckpt")
    np.testing.assert_allclose(
        full.history["train_loss"], resumed.history["train_loss"], rtol=1e-6
    )
    np.testing.assert_allclose(full.validate("val"), resumed.validate("val"), rtol=1e-6)

    # 2-D: restore() re-places the table shard on the model axis
    mesh2 = make_2d_mesh(8, 2)
    t2 = TwoDTrainer(graph, EdgeMasker(graph, seed=11), cfg, mesh=mesh2)
    t2.fit(output_dir=tmp_path / "two_d")
    t2b = TwoDTrainer(graph, EdgeMasker(graph, seed=11), cfg, mesh=mesh2)
    t2b.restore(tmp_path / "two_d" / "best_model.ckpt")
    emb = t2b.state.params["embed_patient"]["embedding"]
    assert not emb.sharding.is_fully_replicated
    np.testing.assert_allclose(t2.validate("val"), t2b.validate("val"), rtol=1e-6)


def test_shard_kernel_env_escape(setup, monkeypatch):
    """MMGNN_SHARD_KERNEL=0 disables the per-shard kernel dispatch (the
    Mosaic-rejection escape hatch): aggregation falls back to the XLA path
    and still produces the same numbers."""
    from jax.sharding import PartitionSpec as P

    from multi_modal_gnn_tpu.graph.schema import PATIENT_LAB
    from multi_modal_gnn_tpu.ops.segment import aggregate_neighbors
    from multi_modal_gnn_tpu.parallel.sharding import graph_pspecs

    cfg, bundle = setup
    mesh = make_mesh()
    g = shard_graph(bundle.graph, mesh, host_edges=bundle.host_edges)
    rng = np.random.default_rng(1)
    x = np.asarray(rng.normal(size=(g.edges[PATIENT_LAB].num_src, 16)), np.float32)

    monkeypatch.setenv("MMGNN_SHARD_KERNEL", "0")

    def body(graph, xr):
        return aggregate_neighbors(
            xr, graph.edges[PATIENT_LAB], "mean", impl="pallas", axis_name="data"
        )

    out = jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=(graph_pspecs(g), P()), out_specs=P())
    )(g, x)
    want = aggregate_neighbors(x, bundle.graph.edges[PATIENT_LAB], "mean", impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_sharded_paired_backward_matches_xla(setup):
    """With the mirror relation's shard plan supplied, the sharded tier's
    BACKWARD also runs the per-shard kernel (custom VJP via the reverse
    plan + psum) — gradient must match the XLA reference exactly."""
    from jax.sharding import PartitionSpec as P

    from multi_modal_gnn_tpu.graph.schema import PATIENT_LAB, mirror_edge_type
    from multi_modal_gnn_tpu.ops.segment import aggregate_neighbors
    from multi_modal_gnn_tpu.parallel.sharding import graph_pspecs

    cfg, bundle = setup
    mesh = make_mesh()
    g = shard_graph(bundle.graph, mesh, host_edges=bundle.host_edges)
    rev_et = mirror_edge_type(PATIENT_LAB)
    assert g.edges[rev_et].shard_win_src is not None
    rng = np.random.default_rng(2)
    num_src = g.edges[PATIENT_LAB].num_src
    x = np.asarray(rng.normal(size=(num_src, 32)), np.float32)
    w = np.asarray(rng.normal(size=(g.edges[PATIENT_LAB].num_dst, 32)), np.float32)

    def grad_body(graph, xr):
        def loss(xv):
            out = aggregate_neighbors(
                xv, graph.edges[PATIENT_LAB], "mean", impl="pallas",
                axis_name="data", edges_rev=graph.edges[rev_et],
            )
            return jnp.sum(out * w)

        return jax.grad(loss)(xr)

    import jax.numpy as jnp  # noqa: PLC0415

    g_sh = jax.jit(
        jax.shard_map(
            grad_body, mesh=mesh, in_specs=(graph_pspecs(g), P()), out_specs=P()
        )
    )(g, x)
    g_ref = jax.grad(
        lambda xr: jnp.sum(
            aggregate_neighbors(xr, bundle.graph.edges[PATIENT_LAB], "mean", impl="xla") * w
        )
    )(x)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref), rtol=2e-4, atol=2e-4)
