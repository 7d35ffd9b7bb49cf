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
    ap.add_argument("--out", type=str, default="outputs/trace")
    args = ap.parse_args()

    import dataclasses

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from multi_modal_gnn_tpu.config import Config
    from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle
    from multi_modal_gnn_tpu.models.factory import build_model
    from multi_modal_gnn_tpu.training.masker import EdgeMasker
    from multi_modal_gnn_tpu.training.trainer import Trainer
    from multi_modal_gnn_tpu.utils.profiling import trace

    use_pallas = jax.default_backend() == "tpu"
    cfg = Config()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, use_pallas=use_pallas))
    if args.no_dense:
        cfg = cfg.replace(graph=dataclasses.replace(cfg.graph, dense_adjacency_max_bytes=0))
    spec = SyntheticSpec.eicu_demo() if args.eicu else SyntheticSpec.scale_100k()
    bundle = make_synthetic_bundle(spec, cfg)
    masker = EdgeMasker(bundle.graph, seed=0, host_edges=bundle.patient_lab_host())
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
    xplane = xplanes[-1]
    print("xplane:", xplane)

    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
    except ImportError:
        print("tensorboard_plugin_profile unavailable; inspect the trace in TensorBoard")
        return

    for tool in ("framework_op_stats^", "op_profile^", "tensorflow_stats^"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data([xplane], tool, {})
        except Exception as exc:  # noqa: BLE001 — tool availability varies by version
            print(f"[{tool}] failed: {type(exc).__name__}: {exc}")
            continue
        path = out / f"{tool.strip('^')}.json"
        if isinstance(data, bytes):
            path.write_bytes(data)
        else:
            path.write_text(data if isinstance(data, str) else json.dumps(data))
        print(f"[{tool}] written to {path} ({path.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
