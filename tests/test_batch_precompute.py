"""SplitBatch per-slot precomputes (degrees, sample_weights) are a pure
hoist: training with them must be bit-identical to the in-step gathers.

The degree-gate gather (models/rgcn.py predict_lab_values) and the lab
loss-weight gather (training/trainer.py _train_step_impl) are constant
across epochs; Trainer._augment_batch computes them once at batch-build
time so they never run inside (or get hoisted to the prologue of) the
scanned train dispatch — at the 3.96M-row scale the two hoisted gathers
cost ~73 ms per dispatch (PERFORMANCE.md "Device trace").
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle
from multi_modal_gnn_tpu.models.factory import build_model
from multi_modal_gnn_tpu.training.masker import EdgeMasker
from multi_modal_gnn_tpu.training.trainer import Trainer


def _setup(epochs=5):
    cfg = Config()
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, epochs=epochs))
    spec = SyntheticSpec(
        num_patients=120, num_labs=12, num_diagnoses=8, num_medications=6,
        mean_labs_per_patient=8.0, seed=11,
    )
    bundle = make_synthetic_bundle(spec, cfg)
    return cfg, bundle


class _PlainTrainer(Trainer):
    """Trainer with the precompute disabled (in-step gathers, round-1 path)."""

    def _augment_batch(self, split, base):
        return base


def test_precompute_matches_instep_gathers():
    cfg, bundle = _setup()

    def run(cls):
        masker = EdgeMasker(bundle.graph, seed=0, host_edges=bundle.patient_lab_host())
        model = build_model(cfg, bundle.graph)
        tr = cls(model, bundle.graph, masker, cfg)
        losses = [tr.train_epoch() for _ in range(3)]
        val = tr.validate("val")
        return losses, val

    losses_aug, val_aug = run(Trainer)
    losses_plain, val_plain = run(_PlainTrainer)
    np.testing.assert_array_equal(np.asarray(losses_aug), np.asarray(losses_plain))
    np.testing.assert_array_equal(np.float32(val_aug), np.float32(val_plain))


def test_precomputed_values_correct():
    cfg, bundle = _setup()
    masker = EdgeMasker(bundle.graph, seed=0, host_edges=bundle.patient_lab_host())
    model = build_model(cfg, bundle.graph)
    tr = Trainer(model, bundle.graph, masker, cfg)
    batch = tr._get_batch("train")
    assert batch.degrees is not None and batch.sample_weights is not None
    np.testing.assert_array_equal(
        np.asarray(batch.degrees),
        np.asarray(bundle.graph.patient_lab_degree)[np.asarray(batch.patient_idx)],
    )
    np.testing.assert_allclose(
        np.asarray(batch.sample_weights),
        np.asarray(tr.lab_weights)[np.asarray(batch.lab_idx)],
        rtol=0,
    )
    # cached on identity: same masker batch object -> same augmented object
    assert tr._get_batch("train") is batch


# scan-vs-loop parity under the (default) augmented batches is covered by
# tests/test_observability.py::test_scanned_epochs_match_loop
