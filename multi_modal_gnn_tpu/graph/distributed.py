"""Sharded graph artifacts + multi-host device placement.

The multi-host loading story (SURVEY.md section 2.4 "our additions" — the
reference is single-process, single-file, src/graph_build.py:769): the graph
builder's padded, dst-sorted edge arrays are written as ``num_shards``
contiguous chunks, one npz per shard, whose boundaries line up EXACTLY with
the data-parallel edge sharding (parallel/sharding.py: equal contiguous
chunks of the padded edge axis).  At load time each process reads only the
shards its addressable devices own and the global ``jax.Array`` is assembled
with ``make_array_from_single_device_arrays`` — no host ever materializes a
remote shard, which is what makes 100M+-edge graphs loadable on a DCN-
connected pod slice.

Layout on disk for ``save_graph_sharded(bundle, path, num_shards=n)``:

  * ``<path>.common.npz``     — replicated arrays (dst_count, row_ptr,
                                 patient_lab_degree) every process loads;
  * ``<path>.shard{k}-of-{n}.npz`` — shard k's chunk of src/dst/mask/val
                                 per relation;
  * ``<path>.meta.json``      — the usual sidecar + sharding descriptor.

Single-host testability: with ``jax.sharding.Mesh`` over N virtual CPU
devices every shard is addressable, so ``load_graph_distributed`` runs (and
is tested) without a pod.
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multi_modal_gnn_tpu.graph.build import GraphBundle, GraphMeta
from multi_modal_gnn_tpu.graph.hetero import EdgeSet, HeteroGraph
from multi_modal_gnn_tpu.graph.schema import EdgeTypeKey, PATIENT_LAB
from multi_modal_gnn_tpu.utils.io import load_json, save_json

# parallel.mesh.DATA_AXIS — spelled literally here so graph/__init__ does not
# pull in the parallel package (whose sharding module imports training.masker,
# which imports graph: a cycle)
DATA_AXIS = "data"

logger = logging.getLogger(__name__)

_SEP = "||"


def _base(path: str | Path) -> Path:
    path = Path(path)
    return path.with_suffix("") if path.suffix == ".npz" else path


def _shard_path(base: Path, k: int, n: int) -> Path:
    return base.parent / f"{base.name}.shard{k:03d}-of-{n:03d}.npz"


def save_graph_sharded(
    bundle: GraphBundle, path: str | Path, num_shards: int, kernel_plans: bool = False
) -> Path:
    """Write the bundle as ``num_shards`` edge-chunk files + common arrays.

    ``num_shards`` must divide every relation's padded edge length (pad
    multiple 1024 makes any power-of-two mesh divide; use
    ``parallel.sharding.check_graph_divisible`` semantics).

    ``kernel_plans``: additionally build and store per-shard windowed kernel
    plans (graph/hetero.py build_sharded_window_plans) so
    ``load_graph_distributed`` brings up a graph whose shard_map aggregation
    runs the Pallas MXU segment kernel — without any host ever holding the
    global edge list.  Costs ~2x the edge bytes per relation on disk.
    """
    base = _base(path)
    base.parent.mkdir(parents=True, exist_ok=True)
    graph = bundle.graph

    common: Dict[str, np.ndarray] = {"patient_lab_degree": np.asarray(graph.patient_lab_degree)}
    shards: list[Dict[str, np.ndarray]] = [dict() for _ in range(num_shards)]
    edge_index = []
    for et, es in graph.edges.items():
        key = _SEP.join(et)
        e_pad = es.num_padded
        if e_pad % num_shards:
            raise ValueError(
                f"Edge padding of {et} ({e_pad}) not divisible by num_shards={num_shards}; "
                "raise graph.edge_pad_multiple"
            )
        entry = {
            "edge_type": list(et),
            "num_valid": es.num_valid,
            "num_src": es.num_src,
            "num_dst": es.num_dst,
            "has_val": es.val is not None,
            "num_padded": e_pad,
        }
        common[f"{key}{_SEP}dst_count"] = np.asarray(es.dst_count)
        common[f"{key}{_SEP}row_ptr"] = np.asarray(es.row_ptr)
        chunk = e_pad // num_shards
        cols = {"src": np.asarray(es.src), "dst": np.asarray(es.dst), "mask": np.asarray(es.mask)}
        if es.val is not None:
            cols["val"] = np.asarray(es.val)
        for k in range(num_shards):
            for col, arr in cols.items():
                shards[k][f"{key}{_SEP}{col}"] = arr[k * chunk : (k + 1) * chunk]
        if kernel_plans:
            from multi_modal_gnn_tpu.graph.hetero import build_sharded_window_plans

            # padded arrays are dst-sorted with padding (dst == num_dst)
            # last, so the first num_valid entries ARE the sorted valid edges
            nv = es.num_valid
            sh_src, sh_local, sh_tm, sh_off, k_max = build_sharded_window_plans(
                cols["src"][:nv], cols["dst"][:nv], es.num_dst, num_shards
            )
            slot_chunk = len(sh_src) // num_shards
            tile_chunk = len(sh_tm) // num_shards
            for k in range(num_shards):
                shards[k][f"{key}{_SEP}swin_src"] = sh_src[k * slot_chunk : (k + 1) * slot_chunk]
                shards[k][f"{key}{_SEP}swin_local"] = sh_local[k * slot_chunk : (k + 1) * slot_chunk]
                shards[k][f"{key}{_SEP}swin_tm"] = sh_tm[k * tile_chunk : (k + 1) * tile_chunk]
            entry["shard_win_windows"] = int(k_max)
            entry["shard_win_offsets"] = [int(o) for o in sh_off]
            entry["shard_win_slot_len"] = int(slot_chunk)
            entry["shard_win_tile_len"] = int(tile_chunk)
        edge_index.append(entry)

    np.savez_compressed(base.parent / f"{base.name}.common.npz", **common)
    for k in range(num_shards):
        np.savez_compressed(_shard_path(base, k, num_shards), **shards[k])
    sidecar = {
        "format_version": 1,
        "sharded": {"num_shards": num_shards, "axis": DATA_AXIS},
        "node_counts": {k: v for k, v in graph.node_counts},
        "edges": edge_index,
        "meta": bundle.meta.to_dict(),
    }
    save_json(sidecar, base.with_suffix(".meta.json"))
    logger.info("Saved graph as %d shards under %s.*", num_shards, base)
    return base


def load_graph_distributed(
    path: str | Path,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    load_host_patient_lab: bool = True,
) -> GraphBundle:
    """Assemble a globally-sharded GraphBundle from per-shard files.

    Edge arrays come up sharded ``P(axis)`` over the mesh (matching
    ``parallel.sharding.graph_pspecs``); dst_count/row_ptr/degree arrive
    replicated.  Each process opens ONLY the shard files its addressable
    devices map to, plus the small common file.

    ``load_host_patient_lab``: additionally read every shard's patient->lab
    host columns (src/dst/val only — the masker's split-derivation input,
    bytes ~ 12*E) so ``EdgeMasker`` works without device readback.  Set
    False on memory-constrained hosts that run training only from a restored
    split.
    """
    base = _base(path)
    sidecar = load_json(base.with_suffix(".meta.json"))
    sh = sidecar.get("sharded")
    if not sh:
        raise ValueError(f"{base}.meta.json has no 'sharded' descriptor; use load_graph")
    num_shards = int(sh["num_shards"])
    mesh_axis_size = mesh.shape[axis]
    # ELASTIC loading: shard files are contiguous slices of the padded edge
    # axis, so a mesh of any size whose device count divides the padding can
    # assemble its chunks from covering file SEGMENTS — each device still
    # reads only the files overlapping its own index range.  Saved kernel
    # plans are per-shard layouts and only transfer when the counts match
    # (see below).
    elastic = num_shards != mesh_axis_size

    with np.load(base.parent / f"{base.name}.common.npz") as f:
        common = {k: f[k] for k in f.files}

    sharded_spec = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    # device -> covering saved-file segments along the data axis
    def _device_shard_arrays(shape, dtype, chunk_of):
        """Build a global jax.Array from per-device chunks.

        ``chunk_of(k)`` returns saved shard k's numpy chunk (dtype-checked
        against the declared ``dtype``); only files overlapping this
        process's device ranges are requested.
        """
        global_shape = shape
        if global_shape[0] % mesh_axis_size:
            raise ValueError(
                f"axis length {global_shape[0]} not divisible by mesh axis "
                f"'{axis}' ({mesh_axis_size} devices)"
            )
        saved_chunk = global_shape[0] // num_shards
        idx_map = sharded_spec.addressable_devices_indices_map(global_shape)
        arrays = []
        for dev, idx in idx_map.items():
            lo = idx[0].start or 0
            hi = global_shape[0] if idx[0].stop is None else idx[0].stop
            parts = []
            for k in range(lo // saved_chunk, -(-hi // saved_chunk)):
                seg = chunk_of(k)
                if seg.dtype != dtype:
                    raise ValueError(
                        f"shard {k}: expected dtype {np.dtype(dtype)}, file holds "
                        f"{seg.dtype} — artifact written by an incompatible version?"
                    )
                parts.append(
                    seg[max(lo - k * saved_chunk, 0) : min(hi - k * saved_chunk, saved_chunk)]
                )
            data = parts[0] if len(parts) == 1 else np.concatenate(parts)
            arrays.append(jax.device_put(data, dev))
        return jax.make_array_from_single_device_arrays(global_shape, sharded_spec, arrays)

    # lazily-opened shard files, cached per shard index
    opened: Dict[int, Dict[str, np.ndarray]] = {}

    def _shard_data(k: int) -> Dict[str, np.ndarray]:
        if k not in opened:
            with np.load(_shard_path(base, k, num_shards)) as f:
                opened[k] = {name: f[name] for name in f.files}
        return opened[k]

    edges: Dict[EdgeTypeKey, EdgeSet] = {}
    host_edges: Optional[Dict] = {} if load_host_patient_lab else None
    for entry in sidecar["edges"]:
        et = tuple(entry["edge_type"])
        key = _SEP.join(et)
        e_pad = int(entry["num_padded"])

        def col(name, k, key=key):
            return _shard_data(k)[f"{key}{_SEP}{name}"]

        src = _device_shard_arrays((e_pad,), np.int32, lambda k: col("src", k))
        dst = _device_shard_arrays((e_pad,), np.int32, lambda k: col("dst", k))
        mask = _device_shard_arrays((e_pad,), np.float32, lambda k: col("mask", k))
        val = (
            _device_shard_arrays((e_pad,), np.float32, lambda k: col("val", k))
            if entry["has_val"]
            else None
        )
        # per-shard windowed kernel plans (written by
        # save_graph_sharded(kernel_plans=True)): each device loads only its
        # own plan chunk and shard_map aggregation runs the MXU segment
        # kernel (ops/segment.py _sharded_windowed_aggregate).  Without them
        # the sharded trainers run the XLA segment-sum path — the single-chip
        # tiers (window plans / dense adjacency) are never built here.
        plan_kwargs = {}
        if entry.get("shard_win_windows") and elastic:
            # a per-shard windowed plan is a layout FOR its shard count;
            # chunks re-sliced to a different count would address wrong
            # windows.  Aggregation falls back to XLA segment_sum; rebuild
            # plans for this mesh with parallel.sharding.attach_shard_plans
            # (host edge columns load below) if the kernel tier is wanted.
            logger.warning(
                "dropping saved %d-shard kernel plans for %s (mesh axis is "
                "%d-way); attach_shard_plans can rebuild them",
                num_shards, et, mesh_axis_size,
            )
        elif entry.get("shard_win_windows"):
            offsets = np.asarray(entry["shard_win_offsets"], np.int32)
            slot_len = int(entry.get("shard_win_slot_len", 0))
            tile_len = int(entry.get("shard_win_tile_len", 0))
            if not slot_len or not tile_len:
                # pre-sidecar-field artifacts: every shard's plan chunk has
                # the same length, so learn it from any file PRESENT on this
                # host (multi-host stages only its own shard files)
                k_any = next(
                    k for k in range(num_shards)
                    if _shard_path(base, k, num_shards).exists()
                )
                slot_len = len(_shard_data(k_any)[f"{key}{_SEP}swin_src"])
                tile_len = len(_shard_data(k_any)[f"{key}{_SEP}swin_tm"])
            plan_kwargs = dict(
                shard_win_src=_device_shard_arrays(
                    (slot_len * num_shards,), np.int32, lambda k: col("swin_src", k)
                ),
                shard_win_local=_device_shard_arrays(
                    (slot_len * num_shards,), np.int32, lambda k: col("swin_local", k)
                ),
                shard_win_tile_map=_device_shard_arrays(
                    (tile_len * num_shards,), np.int32, lambda k: col("swin_tm", k)
                ),
                shard_win_offset=_device_shard_arrays(
                    (num_shards,), np.int32, lambda k: offsets[k : k + 1]
                ),
                shard_win_windows=int(entry["shard_win_windows"]),
            )
        edges[et] = EdgeSet(
            src=src,
            dst=dst,
            mask=mask,
            val=val,
            dst_count=jax.device_put(common[f"{key}{_SEP}dst_count"], replicated),
            row_ptr=jax.device_put(common[f"{key}{_SEP}row_ptr"], replicated),
            num_valid=int(entry["num_valid"]),
            num_src=int(entry["num_src"]),
            num_dst=int(entry["num_dst"]),
            **plan_kwargs,
        )
        if host_edges is not None and et == PATIENT_LAB:
            # read ONLY patient_lab's src/dst/mask/val from each shard file
            # (lazy npz entry access, nothing cached): routing this through
            # _shard_data would materialize EVERY relation's columns plus
            # the plan arrays of all num_shards files on every host —
            # the single-host blow-up this module exists to avoid
            srcs, dsts, vals = [], [], []
            for k in range(num_shards):
                with np.load(_shard_path(base, k, num_shards)) as z:
                    s = z[f"{key}{_SEP}src"]
                    d = z[f"{key}{_SEP}dst"]
                    m = z[f"{key}{_SEP}mask"] > 0
                    srcs.append(s[m])
                    dsts.append(d[m])
                    if entry["has_val"]:
                        vals.append(z[f"{key}{_SEP}val"][m])
            host_edges[et] = (
                np.concatenate(srcs),
                np.concatenate(dsts),
                np.concatenate(vals) if vals else None,
            )

    graph = HeteroGraph(
        edges=edges,
        patient_lab_degree=jax.device_put(common["patient_lab_degree"], replicated),
        node_counts=tuple(sorted(sidecar["node_counts"].items())),
    )
    meta = GraphMeta.from_dict(sidecar.get("meta", {}))
    logger.info(
        "Assembled %d-shard graph from %s.* over mesh %s", num_shards, base, dict(mesh.shape)
    )
    return GraphBundle(graph=graph, meta=meta, host_edges=host_edges)
