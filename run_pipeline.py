#!/usr/bin/env python
"""Pipeline runner CLI.

Capability-parity with the reference runner (run_pipeline.py): an ordered
step registry, ``--step N`` / ``--step A-B`` selection, interactive
confirmation (``--no-confirm`` to disable), colored terminal output, and
per-step timing.  Unlike the reference — which launches a fresh interpreter
per stage (reference run_pipeline.py:119-123) — steps here run in-process and
still communicate only through the on-disk artifact contract, so any stage
can be run standalone against existing artifacts.

Steps:
  1 preprocess   raw data -> interim parquet tables
  2 build-graph  interim tables -> graph.npz (+ meta)
  3 train        graph -> checkpoints + training_history/test_results.json
  4 evaluate     checkpoint -> evaluation_results.json + per_lab_metrics.csv
  5 audit        split hygiene + robust metrics -> audit_report.json
  6 visualize    all plot families (standard / graph / advanced)
  7 inference    per-patient imputation reports -> inference_examples.json
  8 export-serving  AOT serving artifact (cached node state + cold-start
                    fold-in factors) -> outputs/serving/
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from pathlib import Path

logger = logging.getLogger("multi_modal_gnn_tpu.pipeline")

BOLD, GREEN, RED, YELLOW, CYAN, RESET = (
    "\033[1m", "\033[92m", "\033[91m", "\033[93m", "\033[96m", "\033[0m"
)


def _load_bundle(config):
    from multi_modal_gnn_tpu.graph.serialize import load_graph

    return load_graph(Path(config.data.output_dir) / "graph")


FORCE_RESTORE = False  # set by --force: restore checkpoints across config changes


def _load_trainer(config, bundle, force: bool = None, require_checkpoint: bool = False):
    """Rebuild model/masker and restore the best checkpoint (eval-only: the
    downstream steps — evaluate/audit/viz/inference — never train)."""
    from multi_modal_gnn_tpu.models.factory import build_model
    from multi_modal_gnn_tpu.training.masker import masker_from_config
    from multi_modal_gnn_tpu.training.trainer import Trainer

    # shared config->masker factory: must match the train step's masker —
    # the split partition (incl. the strict-conformal "cal" carve) is part
    # of what the checkpointed model was validated on
    masker = masker_from_config(config, bundle)
    model = build_model(config, bundle.graph)
    trainer = Trainer(model, bundle.graph, masker, config, eval_only=True)
    ckpt = Path(config.data.output_dir) / "best_model.ckpt"
    if ckpt.exists():
        trainer.restore(ckpt, force=FORCE_RESTORE if force is None else force)
        trainer.best_state = trainer.state
    elif require_checkpoint:
        # steps that persist production artifacts must never fall through to
        # randomly-initialized weights
        raise FileNotFoundError(
            f"No trained checkpoint at {ckpt} — run the train step first"
        )
    return trainer


def step_preprocess(config):
    from multi_modal_gnn_tpu.data.preprocess import preprocess_pipeline

    preprocess_pipeline(config, interim_dir=config.data.interim_dir)


def step_build_graph(config):
    from multi_modal_gnn_tpu.graph.build import build_graph_from_preprocessed

    out = Path(config.data.output_dir)
    build_graph_from_preprocessed(config.data.interim_dir, config, output_path=out / "graph")


def step_train(config):
    from multi_modal_gnn_tpu.training.trainer import train_pipeline

    bundle = _load_bundle(config)
    # train.extras.auto_resume: true -> re-running this step after a crash
    # or preemption continues from the newest periodic checkpoint
    resume = "auto" if config.train.extras.get("auto_resume") else None
    train_pipeline(config, bundle, config.data.output_dir, resume_from=resume)


def step_evaluate(config):
    from multi_modal_gnn_tpu.evaluation.evaluate import evaluate_model

    bundle = _load_bundle(config)
    trainer = _load_trainer(config, bundle)
    evaluate_model(trainer, bundle, config, output_dir=config.data.output_dir)


def step_audit(config):
    from multi_modal_gnn_tpu.audit import run_full_audit

    bundle = _load_bundle(config)
    trainer = _load_trainer(config, bundle)
    run_full_audit(config, bundle, trainer, output_dir=config.data.output_dir)


def step_visualize(config):
    from multi_modal_gnn_tpu.utils.io import load_json
    from multi_modal_gnn_tpu.viz import (
        create_all_visualizations,
        run_advanced_visualizations,
        run_uncertainty_visualizations,
        visualize_graph_structure,
    )

    bundle = _load_bundle(config)
    trainer = _load_trainer(config, bundle)
    out = config.data.output_dir
    history_path = Path(out) / "training_history.json"
    history = load_json(history_path) if history_path.exists() else None
    visualize_graph_structure(config, bundle, out)
    create_all_visualizations(config, bundle, trainer, history=history, output_dir=out)
    run_advanced_visualizations(config, bundle, trainer, output_dir=out)
    run_uncertainty_visualizations(config, bundle, trainer, output_dir=out)


def step_inference(config, patient_id=None, num_examples=5, detailed=False):
    from multi_modal_gnn_tpu.inference import run_inference

    bundle = _load_bundle(config)
    trainer = _load_trainer(config, bundle)
    cohort = None
    cohort_path = Path(config.data.interim_dir) / "cohort.parquet"
    if cohort_path.exists():
        from multi_modal_gnn_tpu.utils.io import load_dataframe

        cohort = load_dataframe(cohort_path)
    run_inference(
        config, bundle, trainer, config.data.output_dir,
        patient_id=patient_id, num_examples=num_examples, detailed=detailed,
        cohort=cohort,
    )


def step_export_serving(config):
    from multi_modal_gnn_tpu.evaluation.baselines import ALSBaseline
    from multi_modal_gnn_tpu.graph.schema import LAB, PATIENT
    from multi_modal_gnn_tpu.serving import export_serving

    bundle = _load_bundle(config)
    trainer = _load_trainer(config, bundle, require_checkpoint=True)
    # cold-start factors: ALS on the train split so the artifact can fold in
    # patients outside the training graph (serving.predict_cold_start)
    p_idx, l_idx, values = trainer.masker.split_arrays("train")
    als = ALSBaseline(
        bundle.graph.num_nodes(PATIENT), bundle.graph.num_nodes(LAB)
    ).fit(values, p_idx, l_idx)
    # conformal radii: validation-split calibration so the artifact can
    # serve coverage-guaranteed intervals (predict(return_interval=True));
    # skipped when the val split is too small for the level
    conformal = conformal_cold = None
    alpha = config.evaluation.extras.get("conformal_alpha", 0.1)
    if alpha:
        from multi_modal_gnn_tpu.evaluation.conformal import (
            calibrate_cold_start,
            calibrate_from_trainer,
        )

        try:
            conformal = calibrate_from_trainer(trainer, alpha=float(alpha))
            # separate radii for the fold-in channel (different predictor,
            # different residual distribution)
            conformal_cold = calibrate_cold_start(
                als, trainer.masker, bundle.graph.num_nodes(LAB), alpha=float(alpha)
            )
        except ValueError as e:
            # a missing conformal block is a silent downgrade of a default-on
            # serving artifact — say so loudly, with the reason, and continue
            # (the point-prediction artifact is still valid)
            logger.warning(
                "Conformal calibration FAILED — serving artifact will have "
                "no prediction intervals (predict(return_interval=True) "
                "will raise): %s", e,
            )
    out = Path(config.data.output_dir) / "serving"
    export_serving(
        trainer, bundle, out, cold_start=als,
        conformal=conformal, conformal_cold=conformal_cold,
    )
    print(f"serving artifact: {out} ({sorted(p.name for p in out.iterdir())})")


STEPS = [
    ("preprocess", "Load raw data, select cohort, engineer features", step_preprocess),
    ("build-graph", "Assemble the padded heterogeneous graph", step_build_graph),
    ("train", "Train the GNN with mask-and-recover supervision", step_train),
    ("evaluate", "Winsorized metrics, baselines, stratification", step_evaluate),
    ("audit", "Leakage audit + robust metrics", step_audit),
    ("visualize", "All plot families", step_visualize),
    ("inference", "Per-patient imputation reports", step_inference),
    ("export-serving", "AOT serving artifact (cached node state)", step_export_serving),
]


def parse_step_range(spec: str, n_steps: int):
    if "-" in spec:
        a, b = spec.split("-", 1)
        lo, hi = int(a), int(b)
    else:
        lo = hi = int(spec)
    if not (1 <= lo <= hi <= n_steps):
        raise ValueError(f"step range {spec} outside 1..{n_steps}")
    return list(range(lo - 1, hi))


def run_step(index: int, config, confirm: bool) -> bool:
    name, desc, fn = STEPS[index]
    print(f"\n{BOLD}{CYAN}[{index + 1}/{len(STEPS)}] {name}{RESET} — {desc}")
    if confirm:
        answer = input("Run this step? [Y/n/q] ").strip().lower()
        if answer == "q":
            sys.exit(0)
        if answer == "n":
            print(f"{YELLOW}skipped{RESET}")
            return True
    t0 = time.perf_counter()
    try:
        fn(config)
    except Exception as exc:  # noqa: BLE001 - runner reports and continues/aborts
        print(f"{RED}FAILED{RESET}: {exc}")
        if confirm:
            answer = input("Continue anyway? [y/N] ").strip().lower()
            return answer == "y"
        return False
    print(f"{GREEN}done{RESET} in {time.perf_counter() - t0:.1f}s")
    return True


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--config", default="conf/config.yaml")
    parser.add_argument("--step", default=None, help="step number N or range A-B (1-based)")
    parser.add_argument("--no-confirm", action="store_true", help="run without prompts")
    parser.add_argument("--list", action="store_true", help="list steps and exit")
    # inference-step options (reference src/inference.py:418-430)
    parser.add_argument("--patient-id", type=int, default=None,
                        help="inference: report a specific patient entity id")
    parser.add_argument("--num-examples", type=int, default=5,
                        help="inference: number of example patients")
    parser.add_argument("--detailed", action="store_true",
                        help="inference: include measured/imputed lab listings")
    parser.add_argument("--force", action="store_true",
                        help="restore checkpoints even if their config hash differs")
    args = parser.parse_args()

    global FORCE_RESTORE
    FORCE_RESTORE = bool(args.force)

    if args.list:
        for i, (name, desc, _) in enumerate(STEPS):
            print(f"  {i + 1}. {name:<12} {desc}")
        return 0

    import os

    if os.environ.get("MMGNN_FORCE_CPU"):
        # the site hook pins jax to the remote TPU; honor an explicit CPU ask
        from multi_modal_gnn_tpu.utils.platform import force_cpu_devices

        force_cpu_devices(int(os.environ.get("MMGNN_CPU_DEVICES", "1")))

    from multi_modal_gnn_tpu.config import load_config
    from multi_modal_gnn_tpu.utils.logging import setup_logging

    config = load_config(args.config)
    setup_logging(
        config.logging.level,
        config.logging.log_file if config.logging.save_to_file else None,
    )

    # bind inference CLI options into its step function
    import functools

    for i, (name, desc, fn) in enumerate(STEPS):
        if name == "inference":
            STEPS[i] = (
                name,
                desc,
                functools.partial(
                    step_inference,
                    patient_id=args.patient_id,
                    num_examples=args.num_examples,
                    detailed=args.detailed,
                ),
            )

    indices = (
        parse_step_range(args.step, len(STEPS)) if args.step else range(len(STEPS))
    )
    print(f"{BOLD}multi_modal_gnn_tpu pipeline{RESET} — config {args.config}")
    t0 = time.perf_counter()
    for i in indices:
        if not run_step(i, config, confirm=not args.no_confirm):
            print(f"{RED}Pipeline aborted at step {i + 1}.{RESET}")
            return 1
    print(f"\n{GREEN}{BOLD}Pipeline complete{RESET} in {time.perf_counter() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
