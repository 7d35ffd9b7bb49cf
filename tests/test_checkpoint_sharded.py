"""Sharded (multi-controller) checkpoint format: ownership partition,
index-keyed chunks, reassembly against the target sharding.

Single-process here (8 virtual devices, every shard addressable = process 0
owns everything); the REAL cross-host path — the patient table sharded over
a model axis that spans two OS processes, where plain ``jax.device_get``
would die on non-addressable shards — runs in tests/test_multiprocess.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle
from multi_modal_gnn_tpu.parallel.mesh import make_2d_mesh, make_mesh
from multi_modal_gnn_tpu.training.checkpoint import (
    load_checkpoint,
    load_checkpoint_sharded,
    save_checkpoint_sharded,
)


def test_sharded_roundtrip_mixed_tree(tmp_path):
    """Replicated, sharded, scalar and host leaves all round-trip, with
    exactly one copy of every distinct chunk on disk."""
    mesh = make_2d_mesh(8, model_parallel=2)
    sharded = NamedSharding(mesh, P("model"))
    replicated = NamedSharding(mesh, P())
    rng = np.random.default_rng(0)
    tree = {
        "table": jax.device_put(
            jnp.asarray(rng.normal(size=(16, 8)), jnp.float32), sharded
        ),
        "w": jax.device_put(jnp.asarray(rng.normal(size=(4, 4)), jnp.bfloat16), replicated),
        "step": jax.device_put(jnp.asarray(7, jnp.int32), replicated),
        "host_int": 42,
        "host_arr": np.arange(5),
    }
    path = tmp_path / "ck"
    save_checkpoint_sharded(path, tree, {"tag": "t"})

    # one proc file; the sharded table contributes 2 chunks, each other
    # device leaf 1 (replication deduplicated by lowest-device-id ownership)
    with np.load(tmp_path / "ck.proc000.npz") as z:
        keys = sorted(z.files)
    # leaf order is flatten order (dict keys sorted): host_arr, host_int, step, table, w
    assert sum(k.split("||")[0] == "3" for k in keys) == 2  # table: 2 model shards
    assert sum(k.split("||")[0] == "4" for k in keys) == 1  # w: 1 replicated chunk

    target = {
        "table": jax.device_put(jnp.zeros((16, 8), jnp.float32), sharded),
        "w": jax.device_put(jnp.zeros((4, 4), jnp.bfloat16), replicated),
        "step": jax.device_put(jnp.zeros((), jnp.int32), replicated),
        "host_int": 0,
        "host_arr": np.zeros(5, dtype=np.int64),
    }
    restored, meta = load_checkpoint_sharded(path, target)
    assert meta["tag"] == "t"
    np.testing.assert_array_equal(np.asarray(restored["table"]), np.asarray(tree["table"]))
    assert restored["table"].sharding == sharded
    np.testing.assert_array_equal(
        np.asarray(restored["w"], np.float32), np.asarray(tree["w"], np.float32)
    )
    assert int(restored["step"]) == 7 and restored["host_int"] == 42
    np.testing.assert_array_equal(restored["host_arr"], tree["host_arr"])

    # load_checkpoint auto-detects the sharded layout
    restored2, _ = load_checkpoint(path, target)
    np.testing.assert_array_equal(
        np.asarray(restored2["table"]), np.asarray(tree["table"])
    )


def test_sharded_roundtrip_layout_independent(tmp_path):
    """Chunks are keyed by global index bounds: matching partitions load
    chunk-for-chunk, and ANY other target partition loads through the
    elastic reassembly path (saved chunks form a disjoint cover of the
    global array) — so an 8-way run resumes on 2 devices, a replicated
    save loads sharded, and vice versa."""
    mesh8 = make_mesh(8)
    path = tmp_path / "ck"
    x_repl = jax.device_put(
        jnp.arange(32, dtype=jnp.float32).reshape(16, 2), NamedSharding(mesh8, P())
    )
    x_sh8 = jax.device_put(
        jnp.arange(64, dtype=jnp.float32).reshape(16, 4), NamedSharding(mesh8, P("data"))
    )
    save_checkpoint_sharded(path, {"a": x_repl, "b": x_sh8})

    mesh2 = make_mesh(axis_sizes=(2,), devices=jax.devices()[:2])
    for spec_a, spec_b in ((P("data"), P()), (P(), P("data")), (P("data"), P("data"))):
        target = {
            "a": jax.device_put(jnp.zeros((16, 2)), NamedSharding(mesh2, spec_a)),
            "b": jax.device_put(jnp.zeros((16, 4)), NamedSharding(mesh2, spec_b)),
        }
        restored, _ = load_checkpoint_sharded(path, target)
        np.testing.assert_array_equal(np.asarray(restored["a"]), np.asarray(x_repl))
        np.testing.assert_array_equal(np.asarray(restored["b"]), np.asarray(x_sh8))
        assert restored["a"].sharding.spec == spec_a

    # a leaf the artifact never saved still fails loudly
    with pytest.raises(ValueError, match="no chunks for leaf"):
        load_checkpoint_sharded(
            path,
            {"a": jnp.zeros((16, 2)), "b": jnp.zeros((16, 4)), "c": jnp.zeros((3, 3))},
        )


def test_trainer_payload_roundtrip_sharded_format(tmp_path):
    """A real TwoDTrainer payload (params + batch_stats + adam moments with
    the patient table model-axis-sharded) survives the sharded format and
    restores to identical validation loss."""
    from multi_modal_gnn_tpu.parallel.dp2d import TwoDTrainer
    from multi_modal_gnn_tpu.training.masker import EdgeMasker

    cfg = Config()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, hidden_dim=32, dropout=0.0))
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=5), cfg)
    mesh = make_2d_mesh(8, 2)
    t = TwoDTrainer(bundle.graph, EdgeMasker(bundle.graph, seed=3), cfg, mesh=mesh)
    t.train_epoch()
    t.epoch += 1
    val = t.validate("val")

    path = tmp_path / "ck"
    save_checkpoint_sharded(path, t._checkpoint_payload(), t._host_metadata())
    t2 = TwoDTrainer(bundle.graph, EdgeMasker(bundle.graph, seed=3), cfg, mesh=mesh)
    t2.restore(path)  # load_checkpoint dispatches on the .proc files
    emb = t2.state.params["embed_patient"]["embedding"]
    assert not emb.sharding.is_fully_replicated
    np.testing.assert_allclose(t2.validate("val"), val, rtol=1e-6)


def test_trainer_elastic_restore_smaller_mesh(tmp_path):
    """Resume on a DIFFERENT mesh: a TwoDTrainer checkpoint from a
    (4 data x 2 model) mesh restores into a (2 data x 2 model) trainer —
    the table chunks are re-sliced by the elastic loader — and validation
    reproduces the source value."""
    from multi_modal_gnn_tpu.parallel.dp2d import TwoDTrainer
    from multi_modal_gnn_tpu.training.masker import EdgeMasker

    cfg = Config()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, hidden_dim=32, dropout=0.0))
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=5), cfg)

    big = TwoDTrainer(
        bundle.graph, EdgeMasker(bundle.graph, seed=3), cfg, mesh=make_2d_mesh(8, 2)
    )
    big.train_epoch()
    big.epoch += 1
    val = big.validate("val")
    path = tmp_path / "ck"
    save_checkpoint_sharded(path, big._checkpoint_payload(), big._host_metadata())

    small = TwoDTrainer(
        bundle.graph, EdgeMasker(bundle.graph, seed=3), cfg, mesh=make_2d_mesh(4, 2)
    )
    small.restore(path)
    emb = small.state.params["embed_patient"]["embedding"]
    assert not emb.sharding.is_fully_replicated
    assert len(emb.sharding.device_set) == 4
    np.testing.assert_allclose(small.validate("val"), val, rtol=1e-5)


def test_review_fixes_sharded_checkpoint(tmp_path):
    """Round-2 review fixes: latest_checkpoint discovers sharded periodic
    checkpoints; a missing proc file fails loudly instead of zero-filling;
    a stale msgpack at <path> is removed by the sharded save; 0-d ndarray
    host leaves survive restore."""
    from multi_modal_gnn_tpu.training.trainer import Trainer

    mesh = make_mesh(8)
    tree = {
        "x": jax.device_put(jnp.arange(8.0), NamedSharding(mesh, P())),
        "scalar_arr": np.array(7),
        "vec": np.arange(3),
    }

    # 1) latest_checkpoint sees the proc files (no .ckpt file exists)
    for epoch in (2, 4):
        save_checkpoint_sharded(tmp_path / f"checkpoint_epoch_{epoch}.ckpt", tree)
    latest = Trainer.latest_checkpoint(tmp_path)
    assert latest == tmp_path / "checkpoint_epoch_4.ckpt"
    restored, _ = load_checkpoint(latest, tree)
    np.testing.assert_array_equal(np.asarray(restored["x"]), np.arange(8.0))

    # 4) 0-d ndarray host leaf: stays a 0-d array (np.ndarray(7) would have
    # been a shape-(7,) garbage array)
    assert isinstance(restored["scalar_arr"], np.ndarray)
    assert restored["scalar_arr"].shape == () and int(restored["scalar_arr"]) == 7
    np.testing.assert_array_equal(restored["vec"], np.arange(3))

    # 2) a lost proc file fails loudly (metadata records the writer count)
    path = tmp_path / "ck_partial"
    save_checkpoint_sharded(path, tree)
    meta = __import__("json").load(open(str(path) + ".json"))
    meta["sharded_checkpoint"]["num_processes"] = 2  # pretend 2 writers
    __import__("json").dump(meta, open(str(path) + ".json", "w"))
    with pytest.raises(ValueError, match="only 1 .proc"):
        load_checkpoint_sharded(path, tree)

    # 3) a stale single-controller msgpack is removed by the sharded save
    from multi_modal_gnn_tpu.training.checkpoint import save_checkpoint

    stale = tmp_path / "best_model.ckpt"
    stale.write_bytes(b"stale msgpack")
    save_checkpoint_sharded(stale, tree)
    assert not stale.exists()
    restored2, _ = load_checkpoint(stale, tree)
    np.testing.assert_array_equal(np.asarray(restored2["x"]), np.arange(8.0))
