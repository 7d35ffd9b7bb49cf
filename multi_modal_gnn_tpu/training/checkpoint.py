"""Checkpointing with true mid-training resume.

The reference saves a best-model dict (epoch, model/optimizer state, val
loss, config; src/train.py:502-509) but can only ever restart training from
scratch (SURVEY.md section 5).  Here a checkpoint captures the full training
state — params, batch stats, optimizer state, epoch, scheduler and
early-stopping state — as one msgpack file (flax.serialization) plus a JSON
sidecar, and ``Trainer.fit(resume_from=...)`` continues bit-exactly where it
stopped (per-epoch RNG is keyed by (seed, epoch), not stateful).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, Optional

import jax
from flax import serialization

from multi_modal_gnn_tpu.utils.io import load_json, save_json

logger = logging.getLogger(__name__)


def save_checkpoint(
    path: str | Path,
    state_pytree: Any,
    metadata: Optional[Dict] = None,
) -> Path:
    """Serialize a pytree of arrays to ``<path>`` (msgpack) + ``<path>.json``.

    Multi-controller runs (``jax.process_count() > 1``) dispatch to the
    sharded format: ``jax.device_get`` of a cross-host-sharded array (e.g.
    the 2-D trainer's patient table when the model axis spans hosts) would
    fail on non-addressable shards, so instead every process writes ONLY the
    shards it owns (``<path>.procNNN.npz``) — see
    :func:`save_checkpoint_sharded`.  Single-process saves are unchanged.
    """
    if jax.process_count() > 1:
        return save_checkpoint_sharded(path, state_pytree, metadata)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    state_host = jax.device_get(state_pytree)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state_host))
    save_json(metadata or {}, path.with_suffix(path.suffix + ".json"))
    logger.info("Saved checkpoint to %s", path)
    return path


def load_checkpoint(path: str | Path, target_pytree: Any) -> tuple[Any, Dict]:
    """Restore a checkpoint into the structure of ``target_pytree``.

    Detects the sharded multi-controller format (``<path>.procNNN.npz``
    files next to ``path``) and reassembles each leaf against the TARGET
    leaf's sharding — each process device_puts only its own devices' chunks.
    """
    path = Path(path)
    if not path.exists() and _proc_files(path):
        return load_checkpoint_sharded(path, target_pytree)
    with open(path, "rb") as f:
        restored = serialization.from_bytes(target_pytree, f.read())
    meta_path = path.with_suffix(path.suffix + ".json")
    metadata = load_json(meta_path) if meta_path.exists() else {}
    logger.info("Loaded checkpoint from %s", path)
    return restored, metadata


# -- sharded (multi-controller) format ---------------------------------------
#
# One npz per process holding only the chunks that process OWNS, plus the
# usual JSON sidecar (written by process 0).  Ownership of a chunk (a
# distinct global index tuple of a leaf) goes to the lowest-device-id holder,
# so replicated leaves are written once (by whichever process owns device 0)
# and sharded leaves are partitioned without duplication.  Restore keys
# chunks by (leaf position, index bounds), so any mesh/process layout that
# produces the same global partition can load the artifact — the layout at
# save time does not need to match the layout at load time.


def _proc_files(path: Path) -> list[Path]:
    return sorted(path.parent.glob(f"{path.name}.proc*.npz"))


def _enc_index(idx, shape) -> str:
    """Stable string key for a devices_indices_map entry."""
    parts = []
    for s, dim in zip(idx, shape):
        lo = 0 if s.start is None else int(s.start)
        hi = dim if s.stop is None else int(s.stop)
        parts.append(f"{lo}:{hi}")
    return ",".join(parts)


def save_checkpoint_sharded(
    path: str | Path,
    state_pytree: Any,
    metadata: Optional[Dict] = None,
) -> Path:
    import numpy as np

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    proc = jax.process_index()
    if proc == 0:
        # a stale single-controller msgpack at <path> (same output_dir
        # reused across launch modes) would shadow this artifact at load
        path.unlink(missing_ok=True)
    chunks: Dict[str, Any] = {}
    n_leaves = 0
    for i, leaf in enumerate(jax.tree_util.tree_leaves(state_pytree)):
        n_leaves += 1
        if isinstance(leaf, jax.Array):
            index_map = leaf.sharding.devices_indices_map(leaf.shape)
            owner: Dict[str, int] = {}
            for dev, idx in index_map.items():
                key = _enc_index(idx, leaf.shape)
                owner[key] = min(owner.get(key, dev.id), dev.id)
            for shard in leaf.addressable_shards:
                key = _enc_index(shard.index, leaf.shape)
                if shard.device.id == owner[key]:
                    chunks[f"{i}||{key}"] = np.asarray(shard.data)
        elif proc == 0:
            chunks[f"{i}||host"] = np.asarray(leaf)
    np.savez(path.parent / f"{path.name}.proc{proc:03d}.npz", **chunks)
    if proc == 0:
        meta = dict(metadata or {})
        meta["sharded_checkpoint"] = {
            "num_processes": jax.process_count(),
            "num_leaves": n_leaves,
        }
        save_json(meta, path.with_suffix(path.suffix + ".json"))
    logger.info(
        "Saved sharded checkpoint %s (process %d: %d chunks)", path, proc, len(chunks)
    )
    return path


def _fix_dtype(raw, want):
    """npz round-trips ml_dtypes (bfloat16, fp8) as opaque void records of
    the same width — reinterpret, never cast."""
    import numpy as np

    want = np.dtype(want)
    if raw.dtype == want:
        return raw
    if raw.dtype.kind == "V" and raw.dtype.itemsize == want.itemsize:
        return raw.view(want)
    return raw.astype(want)


def load_checkpoint_sharded(path: str | Path, target_pytree: Any) -> tuple[Any, Dict]:
    import numpy as np

    path = Path(path)
    files = _proc_files(path)
    if not files:
        raise FileNotFoundError(f"no {path}.proc*.npz shard files found")
    meta_path = path.with_suffix(path.suffix + ".json")
    metadata = load_json(meta_path) if meta_path.exists() else {}
    saved_procs = int(
        (metadata.get("sharded_checkpoint") or {}).get("num_processes", 0)
    )
    if saved_procs and len(files) != saved_procs:
        # a missing proc file would otherwise restore its chunks as silent
        # zeros through the elastic reassembly path
        raise ValueError(
            f"sharded checkpoint {path} was written by {saved_procs} processes "
            f"but only {len(files)} .proc*.npz file(s) are present — partial "
            "copy or a host crashed mid-save?"
        )

    # lazy chunk access: npz (uncompressed zip) supports per-entry random
    # reads, so the matching-partition path fetches only this process's own
    # chunks — the artifact is NOT materialized in full on every host
    stores = [np.load(f) for f in files]
    try:
        key_to_store: Dict[str, Any] = {}
        for z in stores:
            for k in z.files:
                key_to_store[k] = z

        def _assemble_full(i: int, leaf) -> "np.ndarray":
            """ELASTIC path: the target partition differs from the saved one
            (e.g. an 8-process run resumed on 4, or replicated -> sharded).
            The saved chunks form a disjoint cover of the global array by
            construction, so reassemble it and let the caller re-slice."""
            full = np.zeros(leaf.shape, np.dtype(leaf.dtype))
            found = False
            prefix = f"{i}||"
            for k, z in key_to_store.items():
                if not k.startswith(prefix) or k == f"{prefix}host":
                    continue
                found = True
                v = z[k]
                bounds = k[len(prefix):]
                if not bounds:
                    return _fix_dtype(v, leaf.dtype).reshape(leaf.shape)
                sl = tuple(
                    slice(*map(int, b.split(":"))) for b in bounds.split(",")
                )
                full[sl] = _fix_dtype(v, leaf.dtype)
            if not found:
                raise ValueError(
                    f"sharded checkpoint {path} has no chunks for leaf {i} "
                    f"(shape {leaf.shape}) — saved from a different state tree?"
                )
            return full

        flat, treedef = jax.tree_util.tree_flatten_with_path(target_pytree)
        out = []
        assembled: Dict[int, "np.ndarray"] = {}
        for i, (_, leaf) in enumerate(flat):
            if isinstance(leaf, jax.Array):
                sharding = leaf.sharding
                index_map = sharding.devices_indices_map(leaf.shape)
                arrays = []
                for dev in sharding.addressable_devices:
                    idx = index_map[dev]
                    key = f"{i}||{_enc_index(idx, leaf.shape)}"
                    if key in key_to_store:
                        raw = _fix_dtype(key_to_store[key][key], leaf.dtype)
                    else:
                        if i not in assembled:
                            assembled[i] = _assemble_full(i, leaf)
                        raw = assembled[i][idx]
                    arrays.append(jax.device_put(raw, dev))
                out.append(
                    jax.make_array_from_single_device_arrays(leaf.shape, sharding, arrays)
                )
            else:
                val = key_to_store[f"{i}||host"][f"{i}||host"]
                if isinstance(leaf, np.ndarray):
                    # np.ndarray(x) would treat x as a SHAPE; keep the array
                    out.append(val.reshape(leaf.shape))
                elif np.ndim(val) == 0:
                    out.append(type(leaf)(val.item()))
                else:
                    out.append(val)
        restored = jax.tree_util.tree_unflatten(treedef, out)
    finally:
        for z in stores:
            z.close()
    logger.info("Loaded sharded checkpoint from %s (%d files)", path, len(files))
    return restored, metadata
