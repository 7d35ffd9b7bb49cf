"""Sharded graph artifacts + multi-host-style distributed loading.

Runs on the 8-virtual-CPU-device mesh (tests/conftest.py): every shard is
addressable, so the same code path a pod slice would run is exercised
single-host.
"""

import numpy as np
import pytest

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle
from multi_modal_gnn_tpu.graph.distributed import (
    load_graph_distributed,
    save_graph_sharded,
)
from multi_modal_gnn_tpu.graph.schema import PATIENT_LAB
from multi_modal_gnn_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def bundle():
    return make_synthetic_bundle(SyntheticSpec.tiny(seed=5), Config())


def test_roundtrip_over_mesh(bundle, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("shards")
    base = save_graph_sharded(bundle, tmp / "graph", num_shards=8)
    assert (tmp / "graph.common.npz").exists()
    assert (tmp / "graph.shard000-of-008.npz").exists()

    mesh = make_mesh(8)
    loaded = load_graph_distributed(base, mesh)

    for et, es in bundle.graph.edges.items():
        got = loaded.graph.edges[et]
        np.testing.assert_array_equal(np.asarray(got.src), np.asarray(es.src))
        np.testing.assert_array_equal(np.asarray(got.dst), np.asarray(es.dst))
        np.testing.assert_array_equal(np.asarray(got.mask), np.asarray(es.mask))
        if es.val is not None:
            np.testing.assert_allclose(np.asarray(got.val), np.asarray(es.val))
        np.testing.assert_array_equal(np.asarray(got.row_ptr), np.asarray(es.row_ptr))
        assert not got.src.sharding.is_fully_replicated  # edge axis sharded
        assert got.dst_count.sharding.is_fully_replicated
        assert (got.num_valid, got.num_src, got.num_dst) == (
            es.num_valid, es.num_src, es.num_dst,
        )

    # host patient-lab columns reassemble the sorted valid edge list
    want = bundle.patient_lab_host()
    got = loaded.host_edges[PATIENT_LAB]
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])
    np.testing.assert_allclose(got[2], want[2])


def test_indivisible_mesh_rejected(bundle, tmp_path):
    """Elastic loading accepts any divisible mesh size; an indivisible
    one (3 devices vs 1024-multiple padding) still fails loudly."""
    import jax

    base = save_graph_sharded(bundle, tmp_path / "g", num_shards=8)
    mesh3 = make_mesh(devices=jax.devices()[:3])
    with pytest.raises(ValueError, match="not divisible"):
        load_graph_distributed(base, mesh3)


def test_indivisible_padding_rejected(bundle, tmp_path):
    with pytest.raises(ValueError, match="not divisible"):
        save_graph_sharded(bundle, tmp_path / "g", num_shards=3)


def test_dp_training_from_distributed_load(bundle, tmp_path):
    """One DP epoch on the distributed-loaded graph matches the same epoch
    on the locally-loaded graph (same seed, same masker)."""
    from multi_modal_gnn_tpu.parallel.dp import DataParallelTrainer
    from multi_modal_gnn_tpu.training.masker import EdgeMasker

    base = save_graph_sharded(bundle, tmp_path / "g", num_shards=8)
    mesh = make_mesh(8)
    loaded = load_graph_distributed(base, mesh)

    cfg = Config()
    t_local = DataParallelTrainer(
        bundle.graph,
        EdgeMasker(bundle.graph, seed=7, host_edges=bundle.patient_lab_host()),
        cfg,
        mesh=mesh,
    )
    t_dist = DataParallelTrainer(
        loaded.graph,
        EdgeMasker(loaded.graph, seed=7, host_edges=loaded.host_edges[PATIENT_LAB]),
        cfg,
        mesh=mesh,
    )
    l_local = t_local.train_epoch()
    l_dist = t_dist.train_epoch()
    np.testing.assert_allclose(float(l_dist), float(l_local), rtol=1e-5)


def test_kernel_plans_roundtrip(bundle, tmp_path):
    """save_graph_sharded(kernel_plans=True) stores per-shard windowed plans
    bit-identical to the in-memory attach_shard_plans derivation, and the
    loaded graph dispatches the per-shard MXU kernel tier."""
    import jax
    from jax.sharding import PartitionSpec as P

    from multi_modal_gnn_tpu.ops.segment import aggregate_neighbors
    from multi_modal_gnn_tpu.parallel.sharding import attach_shard_plans, graph_pspecs

    base = save_graph_sharded(bundle, tmp_path / "g", num_shards=8, kernel_plans=True)
    mesh = make_mesh(8)
    loaded = load_graph_distributed(base, mesh)

    # forward relations: the saver's plan input (valid prefix of the padded
    # arrays) is the exact host_edges order, so plans are BIT-identical to
    # the in-memory derivation.  Reverse relations differ benignly: the
    # within-dst-segment edge order (builder sort vs attach_shard_plans's
    # swapped-pair re-sort) permutes slots inside windows — equivalent by
    # window-accumulation order-independence, checked numerically below.
    want_graph = attach_shard_plans(bundle.graph, bundle.host_edges, 8)
    for et in bundle.host_edges:
        es, want = loaded.graph.edges[et], want_graph.edges[et]
        assert es.shard_win_windows == want.shard_win_windows > 0
        np.testing.assert_array_equal(np.asarray(es.shard_win_src), np.asarray(want.shard_win_src))
        np.testing.assert_array_equal(np.asarray(es.shard_win_local), np.asarray(want.shard_win_local))
        np.testing.assert_array_equal(
            np.asarray(es.shard_win_tile_map), np.asarray(want.shard_win_tile_map)
        )
        np.testing.assert_array_equal(
            np.asarray(es.shard_win_offset), np.asarray(want.shard_win_offset)
        )
        assert not es.shard_win_src.sharding.is_fully_replicated

    # every relation (incl. reverses) drives the kernel tier to the XLA answer
    for et, es in loaded.graph.edges.items():
        assert es.shard_win_src is not None, et
        rng = np.random.default_rng(0)
        x = np.asarray(rng.normal(size=(es.num_src, 16)), np.float32)

        def body(graph, xr, et=et):
            return aggregate_neighbors(
                xr, graph.edges[et], "mean", impl="pallas", axis_name="data"
            )

        out = jax.jit(
            jax.shard_map(
                body, mesh=mesh, in_specs=(graph_pspecs(loaded.graph), P()), out_specs=P()
            )
        )(loaded.graph, x)
        ref = aggregate_neighbors(x, bundle.graph.edges[et], "mean", impl="xla")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4, err_msg=str(et)
        )


def test_pipeline_writes_sharded_artifacts(tmp_path):
    """graph.extras.num_shards routes the build stage to ALSO write the
    multi-host artifact (with kernel plans when model.use_pallas)."""
    import dataclasses as dc

    from multi_modal_gnn_tpu.data.synthetic import generate_synthetic_tables
    from multi_modal_gnn_tpu.graph.build import build_graph_from_preprocessed
    from multi_modal_gnn_tpu.utils.io import save_dataframe

    cfg = Config()
    cfg = cfg.replace(
        model=dc.replace(cfg.model, use_pallas=True),
        graph=dc.replace(cfg.graph, extras={"num_shards": 4}),
    )
    tables = generate_synthetic_tables(SyntheticSpec.tiny(seed=5))
    interim = tmp_path / "interim"
    interim.mkdir()
    for name in ("labs_normalized", "cohort", "diagnoses", "medications", "labitems"):
        save_dataframe(tables[name], interim / f"{name}.parquet")

    build_graph_from_preprocessed(interim, cfg, output_path=tmp_path / "graph")
    assert (tmp_path / "graph.npz").exists()
    assert (tmp_path / "graph_sharded.shard000-of-004.npz").exists()

    loaded = load_graph_distributed(tmp_path / "graph_sharded", make_mesh(4))
    es = loaded.graph.edges[PATIENT_LAB]
    assert es.shard_win_src is not None and es.shard_win_windows > 0


def test_elastic_load_different_mesh_sizes(bundle, tmp_path):
    """An 8-shard artifact loads on 4- and 2-device meshes (file segments
    re-chunked per device) and a 2-shard artifact loads on 8 devices (files
    split) — arrays identical in every layout; saved kernel plans transfer
    only at the matching count and are dropped (with XLA fallback intact)
    otherwise."""
    import jax

    base8 = save_graph_sharded(bundle, tmp_path / "g8", num_shards=8, kernel_plans=True)
    base2 = save_graph_sharded(bundle, tmp_path / "g2", num_shards=2)

    for base, mesh_n in ((base8, 4), (base8, 2), (base2, 8), (base8, 8)):
        mesh = make_mesh(mesh_n)
        loaded = load_graph_distributed(base, mesh)
        for et, es in bundle.graph.edges.items():
            got = loaded.graph.edges[et]
            np.testing.assert_array_equal(np.asarray(got.src), np.asarray(es.src))
            np.testing.assert_array_equal(np.asarray(got.dst), np.asarray(es.dst))
            np.testing.assert_array_equal(np.asarray(got.mask), np.asarray(es.mask))
            assert len(got.src.sharding.device_set) == mesh_n
        es = loaded.graph.edges[PATIENT_LAB]
        if base is base8 and mesh_n == 8:
            assert es.shard_win_src is not None  # matching count: plans ride
        else:
            assert es.shard_win_src is None  # dropped or never saved
        # host columns reassemble identically in every layout
        got = loaded.host_edges[PATIENT_LAB]
        want = bundle.patient_lab_host()
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])

    # one DP epoch from an elastic load matches the matching-count load
    from multi_modal_gnn_tpu.parallel.dp import DataParallelTrainer
    from multi_modal_gnn_tpu.training.masker import EdgeMasker

    import dataclasses as dc

    # dropout off: head dropout draws are per-shard by design, so only the
    # zero-dropout trajectory is comparable across different mesh sizes
    cfg = Config()
    cfg = cfg.replace(model=dc.replace(cfg.model, dropout=0.0))
    mesh4 = make_mesh(4)
    el = load_graph_distributed(base8, mesh4)
    t_el = DataParallelTrainer(
        el.graph, EdgeMasker(el.graph, seed=7, host_edges=el.host_edges[PATIENT_LAB]),
        cfg, mesh=mesh4,
    )
    nat = load_graph_distributed(base2, make_mesh(2))
    t_nat = DataParallelTrainer(
        nat.graph, EdgeMasker(nat.graph, seed=7, host_edges=nat.host_edges[PATIENT_LAB]),
        cfg, mesh=make_mesh(2),
    )
    np.testing.assert_allclose(
        float(t_el.train_epoch()), float(t_nat.train_epoch()), rtol=1e-5
    )
