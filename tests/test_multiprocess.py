"""REAL multi-process distributed training (2 OS processes, Gloo collectives).

The other parallel tests run on one process with 8 virtual devices; this one
exercises the actual multi-controller path a DCN pod slice uses: two
separate interpreters each own 2 of the 4 global CPU devices, initialize
jax.distributed against a shared coordinator, load only their addressable
shards of the pre-sharded graph artifact (graph/distributed.py), and run a
data-parallel epoch whose psum crosses the process boundary.  The loss must
match a single-process run on the same 4-way sharding.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle
from multi_modal_gnn_tpu.graph.distributed import save_graph_sharded
from multi_modal_gnn_tpu.graph.schema import PATIENT_LAB

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("kind", ["dp", "2d", "gspmd"])
def test_two_process_training_matches_single_process(tmp_path, kind):
    # bounded by the workers' communicate(timeout=540) below
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=5), Config())
    # dp: 1-D data mesh, one shard per device; 2d/gspmd: data axis across
    # the two processes (DCN analogue), model axis within each (ICI analogue)
    num_shards = 4 if kind == "dp" else 2
    base = save_graph_sharded(bundle, tmp_path / "g", num_shards=num_shards)

    from multi_modal_gnn_tpu.parallel.dp import DataParallelTrainer
    from multi_modal_gnn_tpu.parallel.dp2d import TwoDTrainer
    from multi_modal_gnn_tpu.parallel.gspmd import GSPMDTrainer
    from multi_modal_gnn_tpu.parallel.mesh import make_2d_mesh, make_mesh
    from multi_modal_gnn_tpu.training.masker import EdgeMasker

    if kind == "dp":
        ref_mesh, cls = make_mesh(4), DataParallelTrainer
    else:
        ref_mesh = make_2d_mesh(4, model_parallel=2)
        cls = TwoDTrainer if kind == "2d" else GSPMDTrainer
    ref = cls(
        bundle.graph,
        EdgeMasker(bundle.graph, seed=7, host_edges=bundle.patient_lab_host()),
        Config(),
        mesh=ref_mesh,
    )
    ref_loss = float(ref.train_epoch())
    ref_val = float(ref.validate())

    port = _free_port()
    env_base = {
        **os.environ,
        "DW_NPROCS": "2",
        "DW_PORT": str(port),
        "DW_GRAPH": str(base),
        "DW_LOCAL_DEVICES": "2",
        "DW_TRAINER": kind,
        # workers must not inherit the parent's virtual-device XLA flag
        "XLA_FLAGS": "",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "dist_worker.py")],
            env={**env_base, "DW_PID": str(pid)},
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=str(REPO),
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n---\n".join(outs))

    results = {}
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
        for line in out.splitlines():
            if line.startswith("DWRESULT "):
                r = json.loads(line[len("DWRESULT "):])
                results[r["pid"]] = r
    assert set(results) == {0, 1}, f"missing worker results:\n{outs}"

    # both controllers see the same replicated loss, matching single-process
    for pid in (0, 1):
        np.testing.assert_allclose(results[pid]["loss"], ref_loss, rtol=1e-5)
        np.testing.assert_allclose(results[pid]["val"], ref_val, rtol=1e-5)
    np.testing.assert_allclose(results[0]["loss"], results[1]["loss"], rtol=0)


def test_two_process_sharded_checkpoint_roundtrip(tmp_path):
    """Cross-host checkpointing: the 2-D trainer with its patient table
    sharded over a model axis that SPANS the two processes (device_get
    would fail on non-addressable shards) saves per-process shard files and
    a fresh trainer restores to identical validation loss."""
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=5), Config())
    base = save_graph_sharded(bundle, tmp_path / "g", num_shards=2)

    port = _free_port()
    env_base = {
        **os.environ,
        "DW_NPROCS": "2",
        "DW_PORT": str(port),
        "DW_GRAPH": str(base),
        "DW_LOCAL_DEVICES": "2",
        "DW_TRAINER": "2d_ckpt",
        "DW_OUT": str(tmp_path),
        "XLA_FLAGS": "",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "dist_worker.py")],
            env={**env_base, "DW_PID": str(pid)},
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=str(REPO),
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n---\n".join(outs))

    results = {}
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
        for line in out.splitlines():
            if line.startswith("DWRESULT "):
                r = json.loads(line[len("DWRESULT "):])
                results[r["pid"]] = r
    assert set(results) == {0, 1}, f"missing worker results:\n{outs}"

    # the topology is the point: the table must NOT be fully addressable
    for pid in (0, 1):
        assert results[pid]["table_fully_addressable"] is False
        np.testing.assert_allclose(
            results[pid]["val_restored"], results[pid]["val"], rtol=1e-6
        )
        assert results[pid]["epoch_restored"] == 1
    # one shard file per process, both non-trivial
    files = sorted(tmp_path.glob("ckpt.proc*.npz"))
    assert [f.name for f in files] == ["ckpt.proc000.npz", "ckpt.proc001.npz"]
    assert all(f.stat().st_size > 1000 for f in files)
    assert (tmp_path / "ckpt.json").exists()
