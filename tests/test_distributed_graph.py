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


def test_mesh_size_mismatch_rejected(bundle, tmp_path):
    base = save_graph_sharded(bundle, tmp_path / "g", num_shards=8)
    with pytest.raises(ValueError, match="sharded 8-way"):
        load_graph_distributed(base, make_mesh(4))


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
