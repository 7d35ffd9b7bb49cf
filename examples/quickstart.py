"""End-to-end library quickstart: tables -> graph -> train -> eval -> serve.

Runs on whatever accelerator JAX finds; set QUICKSTART_CPU=1 to force host
CPU (useful on machines where the TPU is remote or busy), QUICKSTART_EPOCHS
to shorten training.  The same flow, driven from YAML instead of code, is
``python run_pipeline.py --no-confirm``; see docs/MIGRATION.md if you are
coming from the PyTorch reference.
"""

import dataclasses
import os

if os.environ.get("QUICKSTART_CPU"):
    from multi_modal_gnn_tpu.utils.platform import force_cpu_devices

    force_cpu_devices(1)

import numpy as np

from multi_modal_gnn_tpu import Config
from multi_modal_gnn_tpu.data import SyntheticSpec, generate_synthetic_tables
from multi_modal_gnn_tpu.evaluation import evaluate_model
from multi_modal_gnn_tpu.graph import (
    build_heterogeneous_graph,
    load_graph,
    save_graph,
    validate_graph,
)
from multi_modal_gnn_tpu.serving import ServingModel, export_serving
from multi_modal_gnn_tpu.training import train_pipeline

OUT = "outputs/quickstart"
EPOCHS = int(os.environ.get("QUICKSTART_EPOCHS", "100"))

# 1. data: an eICU-statistics-matched synthetic cohort (swap in the eICU /
#    MIMIC-III loaders via data/preprocess.py for real CSVs)
cfg = Config().replace(train=dataclasses.replace(Config().train, epochs=EPOCHS))
tables = generate_synthetic_tables(
    SyntheticSpec(num_patients=400, num_labs=25, num_diagnoses=20,
                  num_medications=15, seed=0)
)

# 2. graph: 4 node types, 6 relations, padded dst-sorted device arrays
bundle = build_heterogeneous_graph(
    tables["labs_normalized"], tables["diagnoses"], tables["medications"],
    tables["cohort"], tables["labitems"], cfg,
)
validate_graph(bundle.graph)
save_graph(bundle, f"{OUT}/graph")
bundle = load_graph(f"{OUT}/graph.npz")  # round-trips

# 3. train: masked-edge regression, early stopping, best-val checkpointing
trainer, results = train_pipeline(cfg, bundle, OUT)
print(f"test loss after {results['num_epochs']} epochs: {results['test_loss']:.4f}")

# 4. evaluate: winsorized metrics, per-lab CSV, degree/frequency strata
metrics = evaluate_model(trainer, bundle, cfg, output_dir=OUT)
print("overall:", {k: round(v, 4) for k, v in metrics["overall_metrics"].items()})

# 5. serve: AOT artifact a host can load with only jax + this directory
export_serving(trainer, bundle, f"{OUT}/serving")
served = ServingModel.load(f"{OUT}/serving")
patient0 = served.predict_patient(0, denormalize=True)
print("patient 0, first 3 labs:", dict(list(patient0.items())[:3]))

# arbitrary (patient, lab) pairs in one padded, pre-compiled call
preds = served.predict(np.array([0, 1, 2]), np.array([3, 4, 5]))
print("3 pair predictions:", np.round(preds, 3))
