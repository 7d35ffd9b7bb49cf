"""Mini-batch (Cluster-GCN) quality at K>1 — VERDICT round-2 item 5.

K=1 == full-batch is pinned exactly (tests/test_minibatch.py); this script
measures what the locality approximation actually COSTS in test R^2 on the
realistic cohort, with the flagship side-info recipe:

    side-info warm start (epoch-0 plant identical at every K — the plant
    lives in the parameters) + fine-tune at lr 1e-4 / MSE / no scheduler,
    K in {1, 2, 4, 8} window-aligned patient clusters.

Writes outputs/diagnostics/minibatch_quality.json; the measured deltas are
pinned in tests/test_minibatch.py::test_k_gt1_quality_on_realistic_cohort.

Usage: python scripts/minibatch_quality.py --cpu --epochs 300
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

RANK = 8


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--ks", type=str, default="1,2,4,8")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tag", type=str, default="")
    args = ap.parse_args()

    if args.cpu:
        from multi_modal_gnn_tpu.utils.platform import force_cpu_devices

        force_cpu_devices(1)

    from multi_modal_gnn_tpu.config import Config
    from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, generate_synthetic_tables
    from multi_modal_gnn_tpu.evaluation.metrics import (
        compute_regression_metrics,
        winsorize_residuals,
    )
    from multi_modal_gnn_tpu.graph.build import build_heterogeneous_graph
    from multi_modal_gnn_tpu.models.factory import build_model
    from multi_modal_gnn_tpu.training.masker import EdgeMasker
    from multi_modal_gnn_tpu.training.minibatch import MiniBatchTrainer
    from multi_modal_gnn_tpu.training.trainer import Trainer
    from multi_modal_gnn_tpu.training.warmstart import (
        bundle_membership_matrix,
        warm_start_trainer,
    )

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            edge_head=dataclasses.replace(
                cfg.model.edge_head,
                extras={"bilinear_rank": 2 * RANK + 1, "bilinear_source": "embedding"},
            ),
        ),
        train=dataclasses.replace(
            cfg.train,
            loss="mse",
            epochs=args.epochs,
            early_stopping_patience=10**9,
            optimizer=dataclasses.replace(cfg.train.optimizer, lr=args.lr),
            lr_scheduler=dataclasses.replace(cfg.train.lr_scheduler, enabled=False),
        ),
    )
    spec = dataclasses.replace(SyntheticSpec.eicu_demo(), seed=0, signal_strength=0.6)
    tables = generate_synthetic_tables(spec)
    bundle = build_heterogeneous_graph(
        labs=tables["labs_normalized"],
        diagnoses=tables["diagnoses"],
        medications=tables["medications"],
        cohort=tables["cohort"],
        labitems=tables["labitems"],
        config=cfg,
    )
    memberships = bundle_membership_matrix(bundle)

    report: dict = {"args": vars(args), "ks": {}}
    for k in [int(x) for x in args.ks.split(",")]:
        masker = EdgeMasker(bundle.graph, seed=42, host_edges=bundle.patient_lab_host())
        model = build_model(cfg, bundle.graph)
        if k == 1:
            trainer = Trainer(model, bundle.graph, masker, cfg)
        else:
            trainer = MiniBatchTrainer(model, bundle, masker, cfg, num_clusters=k)
        warm_start_trainer(trainer, rank=RANK, reg=12.0, memberships=memberships)
        _, te_l, te_v = masker.split_arrays("test")
        pre = compute_regression_metrics(
            trainer.predict("test").astype(np.float64), te_v
        )
        import jax

        loss = float("nan")  # defined even at --epochs 0
        t0 = time.perf_counter()
        for _ in range(args.epochs):
            loss = trainer.train_epoch()
            val = trainer.validate()
            if val < trainer.best_val_loss:
                trainer.best_val_loss = val
                trainer.best_state = jax.tree_util.tree_map(
                    lambda x: x.copy(), trainer.state
                )
            trainer.epoch += 1
        dt = time.perf_counter() - t0
        best = trainer.best_state if trainer.best_state is not None else trainer.state
        preds = trainer.predict("test", state=best).astype(np.float64)
        raw = compute_regression_metrics(preds, te_v)
        pw, capped = winsorize_residuals(preds, te_v, te_l, sigma=3.0)
        wins = compute_regression_metrics(pw, te_v)
        report["ks"][str(k)] = {
            "epoch0": pre,
            "final_raw": raw,
            "final_winsorized": wins,
            "train_time_s": dt,
            "final_loss": float(loss),
        }
        print(f"K={k}: epoch0 r2={pre['r2']:.4f}  final raw r2={raw['r2']:.4f}  "
              f"win r2={wins['r2']:.4f}  ({dt:.0f}s)")

    out = Path("outputs/diagnostics") / f"minibatch_quality{args.tag}.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2, default=float))
    print("wrote", out)


if __name__ == "__main__":
    main()
