"""Device-trace the scale-config training epoch and print an op-time table.

VERDICT round-1 item: the remaining scale-epoch time was characterized by
ablation probes only; this captures a real `jax.profiler` device trace of
N scanned epochs and post-processes the xplane with
tensorboard_plugin_profile into a per-op self-time breakdown for
PERFORMANCE.md.

Usage (one JAX process at a time):
    python scripts/trace_scale.py [--epochs 5] [--eicu] [--no-dense] [--out DIR]
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--eicu", action="store_true", help="trace the eICU-sized config")
    ap.add_argument("--no-dense", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--lab-tile-rows", type=int, default=0,
                    help="narrow lab tiles (0=off); enables lab-frequency clustering")
    ap.add_argument("--lab-tile-mode", type=str, default="span",
                    choices=["block", "span"])
    ap.add_argument("--arch", type=str, default="RGCN", help="RGCN | HGT")
    ap.add_argument("--out", type=str, default="outputs/trace")
    args = ap.parse_args()

    import dataclasses

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        "/root/repo/.jax_cache"
        if jax.default_backend() == "tpu"
        else "/root/repo/.jax_cache_cpu",
    )

    from multi_modal_gnn_tpu.config import Config
    from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle
    from multi_modal_gnn_tpu.models.factory import build_model
    from multi_modal_gnn_tpu.training.masker import EdgeMasker
    from multi_modal_gnn_tpu.training.trainer import Trainer
    from multi_modal_gnn_tpu.utils.profiling import trace

    use_pallas = jax.default_backend() == "tpu"
    cfg = Config()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, use_pallas=use_pallas, architecture=args.arch.upper(),
        **({"compute_dtype": "bfloat16"} if args.bf16 else {}),
    ))
    if args.no_dense:
        cfg = cfg.replace(graph=dataclasses.replace(cfg.graph, dense_adjacency_max_bytes=0))
    if args.lab_tile_rows:
        cfg = cfg.replace(
            graph=dataclasses.replace(cfg.graph, cluster_labs_by_frequency=True)
        )
    spec = SyntheticSpec.eicu_demo() if args.eicu else SyntheticSpec.scale_100k()
    bundle = make_synthetic_bundle(spec, cfg)
    if args.arch.upper() == "HGT":
        from multi_modal_gnn_tpu.graph.attn_plan import ensure_attn_plans

        bundle = ensure_attn_plans(bundle, cfg)
    masker = EdgeMasker(
        bundle.graph, seed=0, host_edges=bundle.patient_lab_host(),
        slot_major_train=use_pallas,
        lab_block_rows=args.lab_tile_rows,
        lab_tile_mode=args.lab_tile_mode,
    )
    trainer = Trainer(build_model(cfg, bundle.graph), bundle.graph, masker, cfg)

    # compile + warm
    trainer.train_epochs_scanned(args.epochs)
    jax.block_until_ready(trainer.state.params)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    with trace(out):
        trainer.train_epochs_scanned(args.epochs)
        jax.block_until_ready(trainer.state.params)

    xplanes = sorted(glob.glob(str(out / "**" / "*.xplane.pb"), recursive=True))
    if not xplanes:
        print("no xplane captured (host-only backend?); trace dir:", out)
        return
    print(json.dumps(summarize_xplane(xplanes[-1], args.epochs), indent=2))


def summarize_xplane(xplane: str, epochs: int) -> dict:
    """Aggregate the TPU plane's leaf 'XLA Ops' line into per-shape/opcode
    self-time buckets (the tensorboard_plugin_profile converter is broken
    against this image's TF, so parse the xplane proto directly)."""
    import re
    from collections import defaultdict

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(xplane, "rb").read())
    tpu = [p for p in xs.planes if "TPU" in p.name]
    if not tpu:
        return {"error": "no TPU plane in trace", "planes": [p.name for p in xs.planes]}
    p = tpu[0]
    ev_meta = {mid: m.name for mid, m in p.event_metadata.items()}
    line = max(p.lines, key=lambda l: len(l.events))
    by_key = defaultdict(int)
    cnt = defaultdict(int)
    for e in line.events:
        nm = ev_meta.get(e.metadata_id, "?")
        if nm.startswith("%while"):  # the scan wrapper overlaps its children
            continue
        op = re.match(r"%([a-z\-_]+)", nm)
        shape = re.search(r"= (\S+?)\{", nm)
        key = f"{op.group(1) if op else nm[:24]} -> {shape.group(1) if shape else '?'}"
        by_key[key] += e.duration_ps
        cnt[key] += 1
    total = sum(by_key.values())
    top = [
        {
            "op": k,
            "ms_per_epoch": round(ps / 1e9 / epochs, 2),
            "count_per_epoch": cnt[k] // epochs,
            "pct": round(100 * ps / total, 1),
        }
        for k, ps in sorted(by_key.items(), key=lambda kv: -kv[1])[:20]
    ]
    return {
        "xplane": xplane,
        "device_ms_per_epoch": round(total / 1e9 / epochs, 1),
        "top_ops": top,
    }


if __name__ == "__main__":
    main()
