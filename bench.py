"""Training-throughput benchmark.

Metric (BASELINE.md): patient-lab edges/sec per training epoch — the number
of train-split patient-lab edges the full training step processes per second
of wall-clock, sustained over timed epochs after compile warmup.

Reference baseline: the PyTorch CPU run trains 100 full-batch epochs over
~43k train edges in ~60s => ~7.17e4 edges/s (reference
outputs/things_to_improve.txt:195-198; BASELINE.md "implied training-edge
throughput").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Usage:
    python bench.py            # eICU-demo-sized synthetic graph, real device
    python bench.py --quick    # fewer timed epochs
    python bench.py --scale    # 100k-patient / ~5M-edge scale config
"""

from __future__ import annotations

import argparse
import json
import sys
import time


REFERENCE_EDGES_PER_SEC = 71_700.0  # ~43k train edges x 100 epochs / ~60 s


def _tpu_reachable(timeout_s: float) -> bool:
    """Probe TPU backend init in a SUBPROCESS so a wedged device claim
    cannot hang the bench itself (a dead client holding the chip grant makes
    every new claim queue forever in make_c_api_client — an observed failure
    mode of remote-attached devices).  A healthy init completes in seconds;
    on timeout the bench falls back to CPU with an honest device field."""
    import os
    import subprocess

    if os.environ.get("BENCH_SKIP_TPU_PROBE"):
        return True
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0 and b"ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def run_bench(
    scale: bool = False,
    mimic: bool = False,
    quick: bool = False,
    epochs: int | None = None,
    use_pallas: bool | None = None,
    dense: bool = True,
    bf16: bool = False,
    lab_tile_rows: int | None = None,  # None = auto (masker.auto_lab_tile_rows)
    lab_tile_mode: str = "span",  # matches the CLI default
    src_span_rows: int | None = None,  # None = config default (256)
    arch: str = "RGCN",  # RGCN | HGT (VERDICT r3 item 6: HGT number of record)
    clusters: int = 1,  # >1: mini-batch cluster training (the beyond-HBM
    # tier — required for HGT at the scale configs, whose per-edge
    # attention tensors exceed one chip's HBM full-batch)
    hgt_dense_bytes: int | None = None,  # model.extras.hgt_dense_attn_bytes
) -> dict:
    import dataclasses

    import jax
    import numpy as np

    # persistent compile cache: repeat runs skip the (slow) remote compile.
    # Per-backend dirs: entries compiled via the remote relay embed foreign
    # CPU feature sets that spray loader warnings when a CPU-fallback run
    # reads them (ROADMAP "compile-cache hygiene").
    cache = ".jax_cache" if jax.default_backend() == "tpu" else ".jax_cache_cpu"
    jax.config.update("jax_compilation_cache_dir", f"/root/repo/{cache}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    if use_pallas is None:  # the fused MXU segment kernel needs real TPU
        use_pallas = jax.default_backend() == "tpu"

    from multi_modal_gnn_tpu.config import Config
    from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle
    from multi_modal_gnn_tpu.models.factory import build_model, count_parameters
    from multi_modal_gnn_tpu.training.masker import EdgeMasker
    from multi_modal_gnn_tpu.training.trainer import Trainer

    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model,
            architecture=arch.upper(),
            use_pallas=use_pallas,
            **({"compute_dtype": "bfloat16"} if bf16 else {}),
            **(
                {"extras": {"hgt_dense_attn_bytes": int(hgt_dense_bytes)}}
                if hgt_dense_bytes is not None
                else {}
            ),
        )
    )
    if not dense:  # exercise the windowed-kernel tier (the beyond-dense regime)
        cfg = cfg.replace(
            graph=dataclasses.replace(cfg.graph, dense_adjacency_max_bytes=0)
        )
    if src_span_rows is not None:  # span-DMA plan block height sweep
        cfg = cfg.replace(
            graph=dataclasses.replace(cfg.graph, src_span_rows=src_span_rows)
        )
    if mimic:
        spec = SyntheticSpec.mimic_scale()
        scale = True  # same epoch counts / chunk sizes as the scale config
    else:
        spec = SyntheticSpec.scale_100k() if scale else SyntheticSpec.eicu_demo()
    if lab_tile_rows is None:  # auto: the trainer's measured-default policy
        from multi_modal_gnn_tpu.training.trainer import _resolve_lab_tile_rows

        lab_tile_rows = _resolve_lab_tile_rows(None, spec.num_labs, use_pallas)
    if lab_tile_rows:  # narrow lab tiles want frequency-clustered lab ids
        cfg = cfg.replace(
            graph=dataclasses.replace(cfg.graph, cluster_labs_by_frequency=True)
        )

    t0 = time.perf_counter()
    bundle = make_synthetic_bundle(spec, cfg)
    if arch.upper() == "HGT":
        # flash-attention layouts (round 5): full-batch HGT at scale runs on
        # the windowed flash kernels instead of RESOURCE_EXHAUSTing on
        # [edges, heads, dh] tensors (graph/attn_plan.py)
        from multi_modal_gnn_tpu.graph.attn_plan import ensure_attn_plans

        bundle = ensure_attn_plans(bundle, cfg)
    graph = bundle.graph
    build_s = time.perf_counter() - t0

    masker = EdgeMasker(
        graph,
        train_split=cfg.train.train_split,
        val_split=cfg.train.val_split,
        test_split=cfg.train.test_split,
        mask_fraction=cfg.train.mask_fraction,
        seed=cfg.train.seed,
        host_edges=bundle.patient_lab_host(),
        slot_major_train=use_pallas,
        lab_block_rows=lab_tile_rows,
        lab_tile_mode=lab_tile_mode,
    )
    n_train = masker.split_sizes()["train"]

    model = build_model(cfg, graph)
    if clusters > 1:
        from multi_modal_gnn_tpu.training.minibatch import MiniBatchTrainer

        trainer = MiniBatchTrainer(
            model, bundle, masker, cfg, num_clusters=clusters,
            host_resident=True,
        )
    else:
        trainer = Trainer(model, graph, masker, cfg)

    # default epoch counts: enough chunks that the pipeline's fill/drain
    # (first dispatch + final sync, ~60 ms relay) amortizes to noise
    n_epochs = epochs or (10 if quick else (30 if scale else 300))
    # one compiled scan(chunk), reused; large chunks amortize the dispatch
    # round-trip (which dominates small graphs on a remote-attached chip)
    # chunk sizes are compile-time-bounded: remote-relay compile scales with
    # scan length (measured: scale chunk 10 -> 250 s warmup, 20 -> 551 s for
    # +0.8% throughput; default chunk 100 -> >20 min).  These are the sweet
    # spots.
    chunk = min(10 if (quick or scale) else 50, n_epochs)
    n_chunks = max(n_epochs // chunk, 1)
    n_epochs = n_chunks * chunk

    # warmup: compiles the scanned multi-epoch step (one dispatch per chunk)
    t0 = time.perf_counter()
    trainer.train_epochs_scanned(chunk)
    jax.block_until_ready(trainer.state.params)
    warmup_s = time.perf_counter() - t0

    # pipelined: no per-chunk host readback (a blocking relay round-trip that
    # serializes dispatches — the readback alone costs ~0.7 ms/epoch at
    # chunk 50 on the eICU config); losses convert once at the end
    t0 = time.perf_counter()
    losses = None
    for _ in range(n_chunks):
        losses, _ = trainer.train_epochs_scanned(chunk, as_numpy=False)
    jax.block_until_ready(trainer.state.params)
    elapsed = time.perf_counter() - t0
    last_loss = float(np.asarray(losses)[-1])

    # MXU dtype probe (VERDICT round-2 item 7): measure the chip's actual
    # f32-vs-bf16 matmul rate (cached per device kind in .mxu_probe.json);
    # model.compute_dtype="auto" engages bf16 exactly when this beats 1.15
    mxu_ratio = None
    if jax.default_backend() == "tpu":
        try:
            from multi_modal_gnn_tpu.utils.mxu_probe import probe_bf16_speedup

            mxu_ratio = round(probe_bf16_speedup(), 3)
        except Exception:  # noqa: BLE001 — a probe failure must not kill the bench
            pass

    edges_per_sec = n_train * n_epochs / elapsed
    return {
        **({"mxu_bf16_speedup": mxu_ratio} if mxu_ratio is not None else {}),
        "metric": "train_patient_lab_edges_per_sec",
        "value": round(edges_per_sec, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_sec / REFERENCE_EDGES_PER_SEC, 2),
        "config": (
            "mimic_scale" if mimic else "scale_100k" if scale else "eicu_demo_synthetic"
        ),
        "arch": cfg.model.architecture,
        **({"clusters": clusters} if clusters > 1 else {}),
        "aggregation_impl": (
            ("dense+pallas" if dense else "pallas") if use_pallas else "xla"
        ),
        "compute_dtype": cfg.model.compute_dtype,
        "lab_tile_rows": lab_tile_rows,
        "device": str(jax.devices()[0]),
        "train_edges": n_train,
        "timed_epochs": n_epochs,
        "epoch_time_ms": round(1000 * elapsed / n_epochs, 3),
        "warmup_s": round(warmup_s, 1),
        "graph_build_s": round(build_s, 2),
        "params": count_parameters(trainer.state.params),
        "final_train_loss": round(float(last_loss), 4),
    }


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--scale", action="store_true", help="100k-patient scale config")
    parser.add_argument("--mimic", action="store_true",
                        help="MIMIC-III-shaped config (46k patients, 720 labs, ~5.5M edges)")
    parser.add_argument("--quick", action="store_true", help="fewer timed epochs")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--pallas", dest="pallas", action="store_true", default=None,
                        help="force the fused Pallas aggregation kernel")
    parser.add_argument("--no-pallas", dest="pallas", action="store_false",
                        help="force the XLA segment-sum path")
    parser.add_argument("--no-dense", dest="dense", action="store_false", default=True,
                        help="disable the dense-adjacency tier (bench the windowed kernel)")
    parser.add_argument("--bf16", action="store_true",
                        help="model.compute_dtype=bfloat16 (halves the HBM-bound pair traffic)")
    parser.add_argument("--lab-tile-rows", type=int, default=None,
                        help="narrow lab tiles in the pair-head kernel "
                             "(0=off; unset=auto: 256-row span tiles at "
                             ">=512 padded labs, the measured v5e default)")
    parser.add_argument("--lab-tile-mode", type=str, default="span",
                        choices=["block", "span"],
                        help="aligned-block vs arbitrary-base narrow tiles "
                             "(only with --lab-tile-rows)")
    parser.add_argument("--arch", type=str, default="RGCN",
                        choices=["RGCN", "HGT", "rgcn", "hgt"],
                        help="model architecture to bench (HGT: segment-"
                             "softmax attention path)")
    parser.add_argument("--hgt-dense-bytes", type=int, default=None,
                        help="HGT dense-attention joint-logits budget "
                             "(model.extras.hgt_dense_attn_bytes; 0 forces "
                             "the segment tier)")
    parser.add_argument("--clusters", type=int, default=1,
                        help="mini-batch patient clusters (>1: host-resident "
                             "Cluster-GCN tier; the HGT path at --scale "
                             "needs this — full-batch attention exceeds HBM)")
    parser.add_argument("--src-span-rows", type=int, default=None,
                        help="span-DMA plan block height (graph.src_span_rows; "
                             "unset=config default 256; only matters with "
                             "--no-dense where the span-DMA tier engages)")
    args = parser.parse_args()

    import os

    tpu_dead = not _tpu_reachable(float(os.environ.get("BENCH_TPU_PROBE_TIMEOUT", 540)))
    if tpu_dead:
        from multi_modal_gnn_tpu.utils.platform import force_cpu_devices

        print("TPU backend unreachable (wedged device claim?); falling back "
              "to host CPU", file=sys.stderr)
        force_cpu_devices(1)

    try:
        result = run_bench(
            scale=args.scale, mimic=args.mimic, quick=args.quick, epochs=args.epochs,
            use_pallas=args.pallas, dense=args.dense, bf16=args.bf16,
            lab_tile_rows=args.lab_tile_rows, lab_tile_mode=args.lab_tile_mode,
            src_span_rows=args.src_span_rows, arch=args.arch,
            clusters=args.clusters, hgt_dense_bytes=args.hgt_dense_bytes,
        )
        if tpu_dead:
            result["note"] = (
                "TPU unreachable at bench time (wedged device claim); CPU "
                "fallback numbers. Last chip-recorded: BENCH_r01.json 14.4M "
                "edges/s (202x); post-round-2 kernels measured 23.8M eICU / "
                "70.3M scale on the same chip (PERFORMANCE.md) before the "
                "claim wedged."
            )
    except Exception as exc:  # noqa: BLE001 — always emit a JSON line for the driver
        import traceback

        traceback.print_exc()
        try:  # fall back to a short CPU run so a TPU outage still yields a number
            from multi_modal_gnn_tpu.utils.platform import force_cpu_devices

            force_cpu_devices(1)
            result = run_bench(scale=False, quick=True, epochs=5, use_pallas=False)
            result["note"] = f"accelerator run failed ({type(exc).__name__}); CPU fallback"
        except Exception as exc2:  # noqa: BLE001
            result = {
                "metric": "train_patient_lab_edges_per_sec",
                "value": 0.0,
                "unit": "edges/s",
                "vs_baseline": 0.0,
                "error": f"{type(exc).__name__}: {exc}; fallback: {exc2}",
            }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
