"""Serving-path latency/throughput bench (the reference has no serving
layer to compare against; its inference re-runs the full GNN per patient,
src/inference.py:92-159 — measured here as the "full forward" row).

Measures, on whichever backend is live (``--cpu`` forces host CPU):

  * artifact load time (ServingModel.load: deserialize + weights)
  * single-patient request latency (all 50 labs -> smallest bucket),
    p50/p95 over N requests — includes padding, dispatch and readback,
    i.e. what a serving host actually waits
  * batch throughput at the largest bucket (pairs/s)
  * cold-start request latency (ALS fold-in, pure host math)
  * the reference-style alternative: full-graph forward per request

Writes outputs/diagnostics/serving_bench.json and prints a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path


def _remote_relay_backend() -> bool:
    """True when the live backend is the sitecustomize-registered remote TPU
    relay (readback timings through it are unreliable — CLAUDE.md)."""
    import jax

    if jax.default_backend() == "cpu":
        return False
    return os.path.isdir(os.path.expanduser("~/.axon_site")) or any(
        "axon" in p for p in sys.path
    )


def _percentiles(xs):
    import numpy as np

    a = np.asarray(xs)
    return {
        "p50_ms": float(np.percentile(a, 50) * 1e3),
        "p95_ms": float(np.percentile(a, 95) * 1e3),
        "mean_ms": float(a.mean() * 1e3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force host CPU backend")
    ap.add_argument("--requests", type=int, default=200)
    ap.add_argument("--batch-requests", type=int, default=30)
    ap.add_argument("--tag", type=str, default="")
    args = ap.parse_args()

    cpu = args.cpu
    if not cpu:
        # probe the accelerator in a subprocess first (a wedged remote claim
        # hangs any in-process backend touch — bench.py does the same)
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        from bench import _tpu_reachable

        if not _tpu_reachable(float(os.environ.get("BENCH_TPU_PROBE_TIMEOUT", 540))):
            print("TPU backend unreachable; falling back to host CPU", file=sys.stderr)
            cpu = True
    if cpu:
        from multi_modal_gnn_tpu.utils.platform import force_cpu_devices

        force_cpu_devices(1)

    import jax
    import numpy as np

    from multi_modal_gnn_tpu.config import Config
    from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, generate_synthetic_tables
    from multi_modal_gnn_tpu.evaluation.baselines import ALSBaseline
    from multi_modal_gnn_tpu.graph.build import build_heterogeneous_graph
    from multi_modal_gnn_tpu.graph.schema import LAB, PATIENT
    from multi_modal_gnn_tpu.models.factory import build_model
    from multi_modal_gnn_tpu.serving import ServingModel, export_serving
    from multi_modal_gnn_tpu.training.masker import EdgeMasker
    from multi_modal_gnn_tpu.training.trainer import Trainer

    if not cpu and _remote_relay_backend():
        print(
            "WARNING: the live backend is a remote-attached TPU relay; "
            "whole-array readback timings through it are unreliable on this "
            "machine (see CLAUDE.md / PERFORMANCE.md measurement notes). "
            "Use --cpu, or run on a locally attached accelerator.",
            file=sys.stderr,
        )

    cfg = Config()
    spec = SyntheticSpec.eicu_demo()
    tables = generate_synthetic_tables(spec)
    bundle = build_heterogeneous_graph(
        labs=tables["labs_normalized"],
        diagnoses=tables["diagnoses"],
        medications=tables["medications"],
        cohort=tables["cohort"],
        labitems=tables["labitems"],
        config=cfg,
    )
    masker = EdgeMasker(bundle.graph, seed=42, host_edges=bundle.patient_lab_host())
    trainer = Trainer(build_model(cfg, bundle.graph), bundle.graph, masker, cfg)

    # fitted ALS for the cold-start channel (fast closed-form)
    tr_p, tr_l, tr_v = masker.split_arrays("train")
    als = ALSBaseline(
        bundle.graph.num_nodes(PATIENT), bundle.graph.num_nodes(LAB), rank=8
    )
    als.fit(tr_v, tr_p, tr_l)

    out_dir = Path("outputs/serving_bench_artifact")
    t0 = time.perf_counter()
    export_serving(trainer, bundle, out_dir, cold_start=als)
    export_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    model = ServingModel.load(out_dir)
    load_s = time.perf_counter() - t0

    num_labs = model.manifest["num_labs"]
    num_patients = model.manifest["num_patients"]
    rng = np.random.default_rng(0)

    # --- single-patient latency (all labs; pads to the smallest bucket) ---
    model.predict_patient(0)  # warmup: compiles nothing (AOT), primes caches
    lat = []
    for _ in range(args.requests):
        pid = int(rng.integers(num_patients))
        t0 = time.perf_counter()
        model.predict_patient(pid)
        lat.append(time.perf_counter() - t0)
    single = _percentiles(lat)

    # --- batch throughput at the largest bucket ---
    big = model.buckets[-1]
    p = rng.integers(0, num_patients, size=big).astype(np.int32)
    l = rng.integers(0, num_labs, size=big).astype(np.int32)
    model.predict(p, l)  # warmup
    t0 = time.perf_counter()
    for _ in range(args.batch_requests):
        model.predict(p, l)
    batch_s = (time.perf_counter() - t0) / args.batch_requests
    pairs_per_s = big / batch_s

    # --- cold start (host-side ridge fold-in) ---
    observed = {int(i): float(v) for i, v in zip(tr_l[:20], tr_v[:20])}
    model.predict_cold_start(observed)  # warmup
    lat = []
    for _ in range(min(args.requests, 100)):
        t0 = time.perf_counter()
        model.predict_cold_start(observed)
        lat.append(time.perf_counter() - t0)
    cold = _percentiles(lat)

    # --- reference-style alternative: full-graph forward per request ---
    # (what src/inference.py does for every patient; jitted + warmed here,
    # so this is the BEST case for that strategy)
    labs_all = np.arange(num_labs, dtype=np.int32)

    def full_forward(pid: int):
        return trainer.predict_pairs(
            np.full(num_labs, pid, np.int32), labs_all
        )

    full_forward(0)
    lat = []
    for _ in range(min(args.requests, 50)):
        pid = int(rng.integers(num_patients))
        t0 = time.perf_counter()
        np.asarray(full_forward(pid))
        lat.append(time.perf_counter() - t0)
    full = _percentiles(lat)

    report = {
        "backend": jax.devices()[0].platform,
        "buckets": model.buckets,
        "export_s": export_s,
        "load_s": load_s,
        "single_patient": single,
        "batch_bucket": big,
        "batch_pairs_per_s": pairs_per_s,
        "cold_start": cold,
        "full_forward_per_request": full,
        "speedup_vs_full_forward_p50": full["p50_ms"] / single["p50_ms"],
    }
    out = Path("outputs/diagnostics")
    out.mkdir(parents=True, exist_ok=True)
    tag = f"_{args.tag}" if args.tag else ""
    path = out / f"serving_bench{tag}.json"
    path.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
