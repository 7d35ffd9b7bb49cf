"""Slot-major train batches (EdgeMasker.slot_major_train): the batch is laid
out in the patient gather plan's window-slot order so the patient-side
backward scatter needs no reorder gather (GatherPlan.identity).  These tests
pin exact numerical equivalence with the row-major layout."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle
from multi_modal_gnn_tpu.models.factory import build_model, init_model_variables
from multi_modal_gnn_tpu.training.masker import EdgeMasker
from multi_modal_gnn_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def setup():
    cfg = Config()
    # dropout off: the per-row dropout draw depends on batch layout, which
    # would mask the equivalence this test pins
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, dropout=0.0, use_pallas=True),
    )
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=9), cfg)
    host = bundle.patient_lab_host()
    m_row = EdgeMasker(bundle.graph, seed=4, host_edges=host)
    m_slot = EdgeMasker(
        bundle.graph, seed=4, host_edges=host,
        slot_major_train=True, slot_major_min_rows=0,  # force it on the tiny cohort
    )
    return cfg, bundle, m_row, m_slot


def test_layout_roundtrip(setup):
    """Slot batch holds the same (patient, lab, value) rows, recoverable via
    slot_map, with the identity patient plan and no lab plan."""
    _, _, m_row, m_slot = setup
    b_row, b_slot = m_row.get_split("train"), m_slot.get_split("train")
    slots = m_slot.slot_map("train")
    n = b_row.num_valid
    assert b_slot.num_valid == n
    assert m_row.slot_map("train") is None
    assert b_slot.patient_plan.identity and not b_row.patient_plan.identity
    assert b_slot.lab_plan is None and b_row.lab_plan is not None
    for row_arr, slot_arr in (
        (b_row.patient_idx, b_slot.patient_idx),
        (b_row.lab_idx, b_slot.lab_idx),
        (b_row.values, b_slot.values),
        (b_row.valid, b_slot.valid),
    ):
        np.testing.assert_array_equal(
            np.asarray(slot_arr)[slots[:n]], np.asarray(row_arr)[:n]
        )
    # slot validity covers exactly the n real rows
    assert float(np.asarray(b_slot.valid).sum()) == n
    # every slot's patient lands inside its window (the kernel invariant)
    from multi_modal_gnn_tpu.graph.hetero import WINDOW

    win_local = np.asarray(b_slot.patient_plan.win_local)
    tile_map = np.asarray(b_slot.patient_plan.win_tile_map)
    p = np.asarray(b_slot.patient_idx)
    real = win_local < WINDOW
    windows = np.repeat(tile_map, len(p) // len(tile_map))
    np.testing.assert_array_equal(
        p[real], (windows * WINDOW + win_local)[real]
    )


def test_train_step_parity(setup):
    """One train step with corresponding supervision masks produces the same
    loss and the same parameters (float tolerance) in both layouts."""
    cfg, bundle, m_row, m_slot = setup
    model = build_model(cfg, bundle.graph)
    variables = init_model_variables(model, bundle.graph, jax.random.key(0))
    t_row = Trainer(model, bundle.graph, m_row, cfg, variables=variables)
    t_slot = Trainer(model, bundle.graph, m_slot, cfg, variables=variables)

    b_row, b_slot = m_row.get_split("train"), m_slot.get_split("train")
    slots = m_slot.slot_map("train")
    n = b_row.num_valid
    rng = np.random.default_rng(0)
    sup_row_np = (rng.random(b_row.valid.shape[0]) < 0.4).astype(np.float32)
    sup_row_np *= np.asarray(b_row.valid)
    sup_slot_np = np.zeros(b_slot.valid.shape[0], np.float32)
    sup_slot_np[slots[:n]] = sup_row_np[:n]

    key = jax.random.key(7)
    copy = lambda s: jax.tree_util.tree_map(jnp.array, s)  # noqa: E731 (donation)
    s_row, l_row = t_row._train_step(
        copy(t_row.state), bundle.graph, b_row, t_row.lab_weights, jnp.asarray(sup_row_np), key
    )
    s_slot, l_slot = t_slot._train_step(
        copy(t_slot.state), bundle.graph, b_slot, t_slot.lab_weights, jnp.asarray(sup_slot_np), key
    )
    np.testing.assert_allclose(float(l_row), float(l_slot), rtol=1e-5)
    # atol: the layouts accumulate gradients in different orders (window
    # tiling + the lab-block regroup), so f32 sums reassociate; identical
    # math, few-ulp-scale drift after the adam update
    for a, b in zip(
        jax.tree_util.tree_leaves(s_row.params), jax.tree_util.tree_leaves(s_slot.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=4e-4)


def test_predict_order_matches(setup):
    """predict() returns split-ordered values in both layouts."""
    cfg, bundle, m_row, m_slot = setup
    model = build_model(cfg, bundle.graph)
    variables = init_model_variables(model, bundle.graph, jax.random.key(0))
    t_row = Trainer(model, bundle.graph, m_row, cfg, variables=variables)
    t_slot = Trainer(model, bundle.graph, m_slot, cfg, variables=variables)
    p_row = t_row.predict("train")
    p_slot = t_slot.predict("train")
    np.testing.assert_allclose(p_row, p_slot, atol=1e-5)


def test_train_step_parity_span_mode(setup):
    """Slot-major + arbitrary-base span lab tiles (lab_tile_mode='span'):
    one train step matches the row-major layout — same loss, same params
    (the lab-side gather/scatter rides per-tile dynamic slices of the
    resident table instead of aligned BlockSpec blocks)."""
    cfg, bundle, m_row, _ = setup
    host = bundle.patient_lab_host()
    m_span = EdgeMasker(
        bundle.graph, seed=4, host_edges=host,
        slot_major_train=True, slot_major_min_rows=0,
        lab_block_rows=128, lab_tile_mode="span",
    )
    b_span = m_span.get_split("train")
    assert b_span.patient_plan.lab_span_mode
    assert int(np.asarray(b_span.patient_plan.lab_block_map).max()) >= 0

    model = build_model(cfg, bundle.graph)
    variables = init_model_variables(model, bundle.graph, jax.random.key(0))
    t_row = Trainer(model, bundle.graph, m_row, cfg, variables=variables)
    t_span = Trainer(model, bundle.graph, m_span, cfg, variables=variables)

    b_row = m_row.get_split("train")
    slots = m_span.slot_map("train")
    n = b_row.num_valid
    rng = np.random.default_rng(0)
    sup_row_np = (rng.random(b_row.valid.shape[0]) < 0.4).astype(np.float32)
    sup_row_np *= np.asarray(b_row.valid)
    sup_span_np = np.zeros(b_span.valid.shape[0], np.float32)
    sup_span_np[slots[:n]] = sup_row_np[:n]

    key = jax.random.key(7)
    copy = lambda s: jax.tree_util.tree_map(jnp.array, s)  # noqa: E731 (donation)
    s_row, l_row = t_row._train_step(
        copy(t_row.state), bundle.graph, b_row, t_row.lab_weights,
        jnp.asarray(sup_row_np), key,
    )
    s_span, l_span = t_span._train_step(
        copy(t_span.state), bundle.graph, b_span, t_span.lab_weights,
        jnp.asarray(sup_span_np), key,
    )
    np.testing.assert_allclose(float(l_row), float(l_span), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_row.params), jax.tree_util.tree_leaves(s_span.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=4e-4)


def test_train_pipeline_routes_lab_tile_extras(tmp_path, setup):
    """train.extras.lab_tile_rows/lab_tile_mode reach the pipeline's masker."""
    cfg, bundle, _, _ = setup
    cfg2 = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, use_pallas=True),
        train=dataclasses.replace(
            cfg.train, epochs=2,
            extras={**cfg.train.extras, "lab_tile_rows": 128,
                    "lab_tile_mode": "span"},
        ),
    )
    from multi_modal_gnn_tpu.training.trainer import train_pipeline

    trainer, results = train_pipeline(cfg2, bundle, tmp_path)
    assert trainer.masker.lab_block_rows == 128
    assert trainer.masker.lab_tile_mode == "span"
    assert np.isfinite(results["test_loss"])


def test_value_context_positions_slot_major(setup):
    """train_positions places each edge's padded-array position at its slot."""
    _, bundle, _, m_slot = setup
    pos = m_slot.train_positions()
    slots = m_slot.slot_map("train")
    idx = m_slot.split_indices("train")
    np.testing.assert_array_equal(pos[slots[: len(idx)]], idx)
