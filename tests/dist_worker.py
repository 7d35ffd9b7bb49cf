"""Worker for the REAL multi-process distributed test (test_multiprocess.py).

Each worker is one 'host' of a 2-process CPU 'pod': it initializes
jax.distributed (Gloo cross-process collectives), contributes 2 local
devices to the 4-device global mesh, loads ONLY its addressable shards of
the pre-sharded graph artifact, and runs one data-parallel epoch.  The
parent asserts the loss matches a single-process run bit-close.

NOT collected by pytest (no test_ prefix); launched as
``python tests/dist_worker.py`` with DW_* env vars set.
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

pid = int(os.environ["DW_PID"])
nprocs = int(os.environ["DW_NPROCS"])
port = os.environ["DW_PORT"]
graph_path = os.environ["DW_GRAPH"]
local_devices = int(os.environ.get("DW_LOCAL_DEVICES", "2"))

# must precede ANY backend touch: point jax at host CPU (overriding the
# site-registered remote TPU plugin) and initialize the process group
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", local_devices)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    f"127.0.0.1:{port}", num_processes=nprocs, process_id=pid
)

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from multi_modal_gnn_tpu.config import Config  # noqa: E402
from multi_modal_gnn_tpu.graph.distributed import load_graph_distributed  # noqa: E402
from multi_modal_gnn_tpu.graph.schema import PATIENT_LAB  # noqa: E402
from multi_modal_gnn_tpu.parallel.dp import DataParallelTrainer  # noqa: E402
from multi_modal_gnn_tpu.parallel.dp2d import TwoDTrainer  # noqa: E402
from multi_modal_gnn_tpu.parallel.mesh import make_2d_mesh  # noqa: E402
from multi_modal_gnn_tpu.training.masker import EdgeMasker  # noqa: E402

assert len(jax.devices()) == nprocs * local_devices, (
    len(jax.devices()),
    nprocs,
    local_devices,
)
assert len(jax.local_devices()) == local_devices

trainer_kind = os.environ.get("DW_TRAINER", "dp")
if trainer_kind == "2d_ckpt":
    # model axis ACROSS processes: the patient table's shards live on
    # different hosts, so plain device_get (the single-controller
    # checkpoint path) would die on non-addressable shards — this is the
    # topology the sharded checkpoint format exists for
    devs = np.array(jax.devices()).reshape(nprocs, local_devices).T
    mesh = Mesh(devs, ("data", "model"))
elif trainer_kind in ("2d", "gspmd"):
    # data axis ACROSS processes (DCN analogue), model axis within each
    # process (ICI analogue): devices reshape (data=2, model=2) row-major,
    # so each process's 2 local devices form one data row
    mesh = make_2d_mesh(nprocs * local_devices, model_parallel=local_devices)
else:
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
loaded = load_graph_distributed(graph_path, mesh)
masker = EdgeMasker(
    loaded.graph, seed=7, host_edges=loaded.host_edges[PATIENT_LAB]
)
if trainer_kind == "gspmd":
    from multi_modal_gnn_tpu.parallel.gspmd import GSPMDTrainer

    cls = GSPMDTrainer
else:
    cls = TwoDTrainer if trainer_kind in ("2d", "2d_ckpt") else DataParallelTrainer
trainer = cls(loaded.graph, masker, Config(), mesh=mesh)
loss = trainer.train_epoch()
val = trainer.validate()

result = {"pid": pid, "loss": float(loss), "val": float(val)}
if trainer_kind == "2d_ckpt":
    from jax.experimental import multihost_utils

    from multi_modal_gnn_tpu.training.checkpoint import save_checkpoint

    emb = trainer.state.params["embed_patient"]["embedding"]
    result["table_fully_addressable"] = bool(emb.is_fully_addressable)
    ckpt = Path(os.environ["DW_OUT"]) / "ckpt"
    trainer.epoch += 1
    trainer._save(ckpt)  # dispatches to the sharded per-process format
    multihost_utils.sync_global_devices("ckpt_saved")

    fresh = TwoDTrainer(
        loaded.graph,
        EdgeMasker(loaded.graph, seed=7, host_edges=loaded.host_edges[PATIENT_LAB]),
        Config(),
        mesh=mesh,
    )
    fresh.restore(ckpt)
    result["val_restored"] = float(fresh.validate())
    result["epoch_restored"] = fresh.epoch
print("DWRESULT " + json.dumps(result), flush=True)
