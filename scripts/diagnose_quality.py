"""Quality-gap diagnostic on the eICU-statistics-matched synthetic cohort.

Computes the Bayes conditional ceiling (evaluation/ceiling.py) and the ALS
matrix-factorization baseline, then optionally trains the GNN with config
overrides and reports test metrics against those yardsticks.

Usage (one JAX process at a time — see CLAUDE.md):
    python scripts/diagnose_quality.py --skip-train          # yardsticks only
    python scripts/diagnose_quality.py --epochs 1300 --scan-chunk 100 \
        --no-scheduler --dropout 0.0
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=1300)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--no-scheduler", action="store_true")
    ap.add_argument("--dropout", type=float, default=None)
    ap.add_argument("--mask-fraction", type=float, default=None)
    ap.add_argument("--no-batch-norm", action="store_true")
    ap.add_argument("--arch", type=str, default=None, choices=["rgcn", "hgt"],
                    help="model.architecture override (default: config's RGCN)")
    ap.add_argument("--hidden-dim", type=int, default=None)
    ap.add_argument("--num-layers", type=int, default=None)
    ap.add_argument("--degree-threshold", type=int, default=None)
    ap.add_argument("--bilinear-rank", type=int, default=0)
    ap.add_argument("--bilinear-source", type=str, default="head",
                    choices=["head", "embedding", "context"])
    ap.add_argument("--value-context", action="store_true",
                    help="enable the observed-value channel (model.extras.value_context)")
    ap.add_argument("--als-init", action="store_true",
                    help="warm-start the embedding-bilinear channel at the ALS "
                         "solution (training/warmstart.py); implies "
                         "bilinear_source=embedding, bilinear_rank>=rank+1")
    ap.add_argument("--sideinfo", action="store_true",
                    help="warm-start with the dx/rx side-information baseline "
                         "(SideInfoALSBaseline) instead of plain ALS; implies "
                         "--als-init with bilinear_rank >= rank+1+mem_rank")
    ap.add_argument("--mem-rank", type=int, default=None,
                    help="membership SVD rank for --sideinfo (default: als rank)")
    ap.add_argument("--ridge-reg", type=float, default=30.0,
                    help="per-lab ridge regularizer for --sideinfo")
    ap.add_argument("--weight-decay", type=float, default=None)
    ap.add_argument("--loss", type=str, default=None, choices=["mae", "mse", "huber"])
    ap.add_argument("--embedding-weight-decay", type=float, default=None)
    ap.add_argument("--scan-chunk", type=int, default=100)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--data-seed", type=int, default=0)
    ap.add_argument("--signal", type=float, default=0.6)
    ap.add_argument("--spec", type=str, default="eicu",
                    choices=["eicu", "mimic", "scale"],
                    help="cohort shape: eicu demo (default), MIMIC-shaped "
                         "(46k patients / 720 labs), or the 100k scale config")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-yardsticks", action="store_true")
    ap.add_argument("--als-rank", type=int, default=None, help="default: latent_dim")
    ap.add_argument("--als-reg", type=float, default=None, help="default: ALSBaseline's")
    ap.add_argument("--als-iters", type=int, default=None)
    ap.add_argument(
        "--als-sweep", action="store_true",
        help="grid-search ALS reg on the val split, report best-on-val test metrics",
    )
    ap.add_argument("--cpu", action="store_true", help="force host CPU backend")
    ap.add_argument("--tag", type=str, default="")
    args = ap.parse_args()

    if args.cpu:
        from multi_modal_gnn_tpu.utils.platform import force_cpu_devices

        force_cpu_devices(1)

    import dataclasses

    from multi_modal_gnn_tpu.config import Config
    from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, generate_synthetic_tables
    from multi_modal_gnn_tpu.evaluation.baselines import ALSBaseline
    from multi_modal_gnn_tpu.evaluation.ceiling import gaussian_conditional_ceiling
    from multi_modal_gnn_tpu.evaluation.metrics import (
        compute_regression_metrics,
        winsorize_residuals,
    )
    from multi_modal_gnn_tpu.graph.build import build_heterogeneous_graph
    from multi_modal_gnn_tpu.graph.schema import LAB, PATIENT
    from multi_modal_gnn_tpu.training.masker import EdgeMasker

    config = Config()
    tc = config.train
    base_spec = {
        "eicu": SyntheticSpec.eicu_demo,
        "mimic": SyntheticSpec.mimic_scale,
        "scale": SyntheticSpec.scale_100k,
    }[args.spec]()
    spec = dataclasses.replace(
        base_spec, seed=args.data_seed, signal_strength=args.signal
    )
    tables, latents = generate_synthetic_tables(spec, return_latents=True)
    bundle = build_heterogeneous_graph(
        labs=tables["labs_normalized"],
        diagnoses=tables["diagnoses"],
        medications=tables["medications"],
        cohort=tables["cohort"],
        labitems=tables["labitems"],
        config=config,
    )
    masker = EdgeMasker(
        bundle.graph,
        train_split=tc.train_split,
        val_split=tc.val_split,
        test_split=tc.test_split,
        mask_fraction=tc.mask_fraction if args.mask_fraction is None else args.mask_fraction,
        seed=args.seed,
        host_edges=bundle.patient_lab_host(),
    )

    # graph lab index -> generator lab index (ITEMID = 51000 + j)
    lab_indexer = bundle.meta.indexers[LAB]
    num_graph_labs = bundle.graph.num_nodes(LAB)
    w_graph = np.zeros((num_graph_labs, latents.w_lab.shape[1]))
    for g in range(num_graph_labs):
        w_graph[g] = latents.w_lab[int(lab_indexer.id_of(g)) - 51000]

    tr_p, tr_l, tr_v = masker.split_arrays("train")
    te_p, te_l, te_v = masker.split_arrays("test")
    num_patients = bundle.graph.num_nodes(PATIENT)

    report: dict = {
        "spec": {"signal": spec.signal_strength, "latent_dim": spec.latent_dim,
                 "num_patients": spec.num_patients, "num_labs": spec.num_labs},
        "splits": masker.split_sizes(),
        "args": vars(args),
    }

    if not args.skip_yardsticks:
        ceil = gaussian_conditional_ceiling(
            w_graph, latents.signal, tr_p, tr_l, tr_v, te_p, te_l, te_v,
            num_patients=num_patients,
        )
        report["ceiling"] = {
            "expected": ceil["expected"],
            "realized": ceil["realized"],
            "unconditional_r2": ceil["unconditional_r2"],
            "mean_posterior_var": ceil["mean_posterior_var"],
        }
        print("Conditional ceiling (Bayes, oracle W, train-obs only):")
        print("  expected:", json.dumps(ceil["expected"]))
        print("  realized:", json.dumps(ceil["realized"]))
        print("  unconditional (oracle-z) R^2:", ceil["unconditional_r2"])

        # combined ceiling: labs posterior + dx/rx membership one-hots
        from multi_modal_gnn_tpu.evaluation.ceiling import (
            crossfit_oracle_ceiling,
            gaussian_posterior_means,
        )
        from multi_modal_gnn_tpu.training.warmstart import bundle_membership_matrix

        pat_indexer = bundle.meta.indexers[PATIENT]
        z_graph = np.zeros((num_patients, latents.z.shape[1]))
        for g in range(num_patients):
            z_graph[g] = latents.z[int(pat_indexer.id_of(g)) - 100000]
        mu, _ = gaussian_posterior_means(
            w_graph, latents.signal, tr_p, tr_l, tr_v, num_patients=num_patients
        )
        memberships_y = bundle_membership_matrix(bundle)
        combined = crossfit_oracle_ceiling(
            w_graph, latents.signal, z_graph,
            np.hstack([mu, memberships_y]), te_p, te_l, te_v,
        )
        report["combined_ceiling"] = combined
        print("Combined ceiling (labs + dx/rx memberships, cross-fitted oracle ridge):")
        print("  realized:", json.dumps(combined["realized"]))

        va_p, va_l, va_v = masker.split_arrays("val")
        rank = args.als_rank or spec.latent_dim
        als_kwargs = {}
        if args.als_reg is not None:
            als_kwargs["reg"] = args.als_reg
        if args.als_iters is not None:
            als_kwargs["iters"] = args.als_iters

        t0 = time.perf_counter()
        if args.als_sweep:
            # model-select reg on the val split (the ALS analogue of the
            # trainer's best-val checkpointing) — the Bayes-matched reg for
            # this generator is sigma^2 = 1 - s^2 on the patient solve
            best = None
            for reg in (1.0, 2.0, 3.0, 5.0, 8.0, 12.0, 20.0, 30.0, 50.0):
                m = ALSBaseline(num_patients, num_graph_labs, rank=rank, reg=reg,
                                **{k: v for k, v in als_kwargs.items() if k != "reg"}
                                ).fit(tr_v, tr_p, tr_l)
                val_r2 = compute_regression_metrics(m.predict(va_p, va_l), va_v)["r2"]
                test_m = compute_regression_metrics(m.predict(te_p, te_l), te_v)
                print(f"  ALS reg={reg}: val r2={val_r2:.4f} test r2={test_m['r2']:.4f}")
                if best is None or val_r2 > best[0]:
                    best = (val_r2, reg, test_m)
            als_m = dict(best[2], reg=best[1], val_r2=best[0], rank=rank)
        else:
            als = ALSBaseline(num_patients, num_graph_labs, rank=rank, **als_kwargs).fit(
                tr_v, tr_p, tr_l
            )
            als_m = compute_regression_metrics(als.predict(te_p, te_l), te_v)
        report["als"] = als_m
        print(f"ALS (rank {rank}, {time.perf_counter() - t0:.1f}s):",
              json.dumps(als_m))

    if not args.skip_train:
        from multi_modal_gnn_tpu.models.factory import build_model
        from multi_modal_gnn_tpu.training.trainer import Trainer

        mc = config.model
        overrides = {}
        if args.arch is not None:
            overrides["architecture"] = args.arch.upper()
        if args.dropout is not None:
            overrides["dropout"] = args.dropout
        if args.no_batch_norm:
            overrides["use_batch_norm"] = False
        if args.hidden_dim is not None:
            overrides["hidden_dim"] = args.hidden_dim
        if args.num_layers is not None:
            overrides["num_layers"] = args.num_layers
        if args.degree_threshold is not None:
            overrides["degree_threshold"] = args.degree_threshold
        if args.value_context:
            overrides["extras"] = {**mc.extras, "value_context": True}
        if args.sideinfo:
            args.als_init = True
        if args.als_init:
            # the warm start plants into the embedding-bilinear channel
            rank = args.als_rank or spec.latent_dim
            need = rank + 1
            if args.sideinfo:
                need += args.mem_rank if args.mem_rank is not None else rank
            args.bilinear_rank = max(args.bilinear_rank, need)
            args.bilinear_source = "embedding"
        if args.bilinear_rank:
            overrides["edge_head"] = dataclasses.replace(
                mc.edge_head,
                extras={
                    "bilinear_rank": args.bilinear_rank,
                    "bilinear_source": args.bilinear_source,
                },
            )
        if overrides:
            mc = dataclasses.replace(mc, **overrides)
        opt = dataclasses.replace(
            tc.optimizer,
            lr=args.lr,
            **({"weight_decay": args.weight_decay} if args.weight_decay is not None else {}),
            **(
                {"embedding_weight_decay": args.embedding_weight_decay}
                if args.embedding_weight_decay is not None
                else {}
            ),
        )
        sched = dataclasses.replace(tc.lr_scheduler, enabled=not args.no_scheduler)
        tc2 = dataclasses.replace(
            tc,
            epochs=args.epochs,
            early_stopping_patience=10**9,
            optimizer=opt,
            lr_scheduler=sched,
            seed=args.seed,
            scan_chunk=args.scan_chunk,
            **({"mask_fraction": args.mask_fraction} if args.mask_fraction is not None else {}),
            **({"loss": args.loss} if args.loss is not None else {}),
        )
        cfg2 = dataclasses.replace(config, model=mc, train=tc2)

        model = build_model(cfg2, bundle.graph)
        trainer = Trainer(model, bundle.graph, masker, cfg2)
        if args.als_init:
            from multi_modal_gnn_tpu.training.warmstart import (
                bundle_membership_matrix,
                warm_start_trainer,
            )

            rank = args.als_rank or spec.latent_dim
            memberships = bundle_membership_matrix(bundle) if args.sideinfo else None
            als = warm_start_trainer(
                trainer,
                rank=rank,
                reg=args.als_reg if args.als_reg is not None else 12.0,
                memberships=memberships,
                mem_rank=args.mem_rank,
                ridge_reg=args.ridge_reg,
            )
            if args.sideinfo:
                si_m = compute_regression_metrics(als.predict(te_p, te_l), te_v)
                print("SideInfoALS baseline test metrics:", json.dumps(si_m))
                report["sideinfo_baseline"] = si_m
            pre = compute_regression_metrics(
                trainer.predict("test").astype(np.float64), te_v
            )
            print("Warm-start (epoch 0) test metrics:", json.dumps(pre))
            report["warm_start_epoch0"] = pre
        t0 = time.perf_counter()
        try:
            trainer.fit(scan_chunk=args.scan_chunk)
        except Exception as exc:  # noqa: BLE001 — the yardsticks above are
            # expensive (minutes at MIMIC scale); never lose them to a
            # transient device fault mid-fine-tune.  Record and still write.
            import traceback

            traceback.print_exc()
            report["train_error"] = f"{type(exc).__name__}: {exc}"
        else:
            train_s = time.perf_counter() - t0

            best = trainer.best_state if trainer.best_state is not None else trainer.state
            preds = trainer.predict("test", state=best).astype(np.float64)
            raw = compute_regression_metrics(preds, te_v)
            preds_w, capped = winsorize_residuals(preds, te_v, te_l, sigma=3.0)
            wins = compute_regression_metrics(preds_w, te_v)
            report["model"] = {
                "raw": raw,
                "winsorized": wins,
                "best_val_loss": trainer.best_val_loss,
                "final_train_loss": trainer.history["train_loss"][-1],
                "epochs_run": len(trainer.history["train_loss"]),
                "train_time_s": train_s,
                "overrides": overrides,
                "lr": args.lr,
                "scheduler": not args.no_scheduler,
            }
            print("Model   raw:", json.dumps(raw))
            print("Model  wins:", json.dumps(wins))
            print(f"({len(trainer.history['train_loss'])} epochs in {train_s:.1f}s)")

    out_dir = Path("outputs/diagnostics")
    out_dir.mkdir(parents=True, exist_ok=True)
    tag = args.tag or time.strftime("%H%M%S")
    out_path = out_dir / f"quality_{tag}.json"
    def _default(o):
        try:
            return float(o)
        except (TypeError, ValueError):
            return str(o)

    out_path.write_text(json.dumps(report, indent=2, default=_default))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
