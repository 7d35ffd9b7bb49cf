"""Observed-value conditioning channel (models/rgcn.py value_context).

The reference's SAGEConv never reads edge_attr (src/model.py:116-131), so its
architecture cannot condition on a patient's observed lab values.  The
value-context channel is this framework's opt-in extension; these tests pin
its two safety properties:

  * leakage-freedom — predictions NEVER depend on val/test edge values, and
    a supervised train edge never sees its own target;
  * the channel is real — predictions DO depend on train edge values.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle
from multi_modal_gnn_tpu.graph.schema import PATIENT_LAB
from multi_modal_gnn_tpu.models.factory import build_model
from multi_modal_gnn_tpu.training.masker import EdgeMasker
from multi_modal_gnn_tpu.training.trainer import Trainer


def _vctx_config(arch="RGCN", **model_extras):
    cfg = Config()
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, architecture=arch, extras={"value_context": True, **model_extras}
        ),
    )


# the channel is shared (models/context.py) — pin the leakage properties for
# both architectures
@pytest.fixture(scope="module", params=["RGCN", "HGT"])
def setup(request):
    cfg = _vctx_config(arch=request.param)
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=11), cfg)
    masker = EdgeMasker(bundle.graph, seed=5, host_edges=bundle.patient_lab_host())
    trainer = Trainer(build_model(cfg, bundle.graph), bundle.graph, masker, cfg)
    for _ in range(3):
        trainer.train_epoch()
        trainer.epoch += 1
    return cfg, bundle, masker, trainer


def _perturbed_graph(graph, positions, delta=100.0):
    es = graph.edges[PATIENT_LAB]
    val = np.asarray(es.val).copy()
    val[positions] += delta
    es2 = es.replace(val=jnp.asarray(val))
    return graph.replace(edges={**graph.edges, PATIENT_LAB: es2})


def test_masker_visibility_arrays(setup):
    _, bundle, masker, _ = setup
    num_padded = bundle.graph.patient_lab.num_padded
    base = masker.visibility_base(num_padded)
    assert base.shape == (num_padded,)
    assert base.sum() == masker.split_sizes()["train"]
    assert (base[masker.split_indices("val")] == 0).all()
    assert (base[masker.split_indices("test")] == 0).all()
    assert (base[masker.split_indices("train")] == 1).all()
    assert (base[masker.num_edges :] == 0).all()  # padding

    pos = masker.train_positions()
    assert pos.shape == (masker.get_split("train").valid.shape[0],)
    n = masker.split_sizes()["train"]
    np.testing.assert_array_equal(pos[:n], masker.split_indices("train"))


def test_no_leakage_from_heldout_values(setup):
    """Perturbing val/test edge values must not move ANY prediction."""
    _, bundle, masker, tr = setup
    batch = masker.get_split("test")
    heldout = np.concatenate([masker.split_indices("val"), masker.split_indices("test")])
    g2 = _perturbed_graph(bundle.graph, heldout)
    _, p1 = tr._eval_step(tr.state, bundle.graph, batch)
    _, p2 = tr._eval_step(tr.state, g2, batch)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_channel_conditions_on_train_values(setup):
    """Perturbing TRAIN edge values must move predictions (channel is live)."""
    _, bundle, masker, tr = setup
    batch = masker.get_split("test")
    g2 = _perturbed_graph(bundle.graph, masker.split_indices("train"))
    _, p1 = tr._eval_step(tr.state, bundle.graph, batch)
    _, p2 = tr._eval_step(tr.state, g2, batch)
    assert np.abs(np.asarray(p1) - np.asarray(p2)).max() > 1e-4


def test_supervised_edges_hidden_in_train_step(setup):
    """With every train edge supervised (sup_mask = all), the train forward
    must see NO values at all — so perturbing even train values cannot move
    the loss."""
    _, bundle, masker, tr = setup
    batch = masker.get_split("train")
    sup = batch.valid  # supervise everything -> visibility knocked to zero
    key = tr.rngs.key_for("dropout", 999)
    g2 = _perturbed_graph(bundle.graph, masker.split_indices("train"))
    # the train step donates its state argument -> pass a fresh copy each call
    copy_state = lambda: jax.tree_util.tree_map(jnp.array, tr.state)  # noqa: E731
    _, l1 = tr._train_step(copy_state(), bundle.graph, batch, tr.lab_weights, sup, key)
    _, l2 = tr._train_step(copy_state(), g2, batch, tr.lab_weights, sup, key)
    assert float(l1) == pytest.approx(float(l2), abs=1e-6)


def test_context_bilinear_source_requires_value_context():
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            edge_head=dataclasses.replace(
                cfg.model.edge_head, extras={"bilinear_rank": 4, "bilinear_source": "context"}
            ),
        ),
    )
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=11), cfg)
    with pytest.raises(ValueError, match="value_context"):
        build_model(cfg, bundle.graph)


def test_context_bilinear_trains():
    cfg = _vctx_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            extras={"value_context": True},
            edge_head=dataclasses.replace(
                cfg.model.edge_head, extras={"bilinear_rank": 4, "bilinear_source": "context"}
            ),
        ),
    )
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=11), cfg)
    masker = EdgeMasker(bundle.graph, seed=5, host_edges=bundle.patient_lab_host())
    tr = Trainer(build_model(cfg, bundle.graph), bundle.graph, masker, cfg)
    losses = []
    for _ in range(5):
        losses.append(tr.train_epoch())
        tr.epoch += 1
    assert np.isfinite(losses).all()


def test_shard_map_trainer_accepts_value_context():
    """Round 2: the explicit shard_map trainers support value_context (the
    visibility base rides the sharded graph; knockout runs shard-locally).
    Numeric parity with single-device is pinned in
    tests/test_parallel.py::test_dp_value_context_matches_single_device —
    here just pin that construction + one epoch work on the 8-device mesh."""
    from multi_modal_gnn_tpu.parallel.dp import DataParallelTrainer
    from multi_modal_gnn_tpu.parallel.mesh import make_mesh

    cfg = _vctx_config()
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=11), cfg)
    masker = EdgeMasker(bundle.graph, seed=5, host_edges=bundle.patient_lab_host())
    dp = DataParallelTrainer(bundle.graph, masker, cfg, mesh=make_mesh(8))
    assert np.isfinite(dp.train_epoch())
