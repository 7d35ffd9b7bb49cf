"""Model tests: shapes, dual-head routing, train/eval mode behavior."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.models.factory import build_model, count_parameters, init_model_variables


@pytest.fixture(scope="module")
def model_and_vars(tiny_graph):
    cfg = Config()
    model = build_model(cfg, tiny_graph)
    variables = init_model_variables(model, tiny_graph, jax.random.key(0))
    return model, variables


def test_parameter_count_structure(model_and_vars, tiny_graph):
    model, variables = model_and_vars
    params = variables["params"]
    h = 128
    counts = tiny_graph.node_count_map
    # embedding tables exactly sized to the graph
    for nt, n in counts.items():
        assert params[f"embed_{nt}"]["embedding"].shape == (n, h)
    # 6 relations x 2 layers of SAGE weights
    for i in range(2):
        conv = params[f"conv_{i}"]
        neigh = [k for k in conv if k.startswith("neigh_")]
        root = [k for k in conv if k.startswith("root_")]
        assert len(neigh) == 6 and len(root) == 6
        for k in neigh:
            assert conv[k]["kernel"].shape == (h, h)
            assert "bias" in conv[k]
        for k in root:
            assert "bias" not in conv[k]  # PyG SAGEConv root has no bias
    assert count_parameters(params) > 0


def test_parameter_count_reconciliation():
    """On eICU shapes the model counts exactly 752,514 parameters, and the
    non-embedding subtotal is exactly the 483,970 the reference README
    reports — the reference counted before its lazy ``_init_embeddings``
    created the tables (src/model.py:180-204).  Pins README 'Parameter-count
    reconciliation'."""
    from multi_modal_gnn_tpu.graph.build import assemble_graph
    from multi_modal_gnn_tpu.graph.schema import (
        PATIENT_DIAGNOSIS,
        PATIENT_LAB,
        PATIENT_MEDICATION,
    )

    counts = {"patient": 1834, "lab": 50, "diagnosis": 114, "medication": 100}
    one = np.zeros(1, dtype=np.int32)
    edge_arrays = {
        PATIENT_LAB: (one, one, np.zeros(1, dtype=np.float32)),
        PATIENT_DIAGNOSIS: (one, one, None),
        PATIENT_MEDICATION: (one, one, None),
    }
    graph = assemble_graph(edge_arrays, counts, pad_multiple=8)
    cfg = Config()
    model = build_model(cfg, graph)
    variables = init_model_variables(model, graph, jax.random.key(0))
    total = count_parameters(variables["params"])
    embedding_params = cfg.model.hidden_dim * sum(counts.values())
    assert total == 752_514
    assert total - embedding_params == 483_970


def test_eval_deterministic(model_and_vars, tiny_graph):
    model, variables = model_and_vars
    p = jnp.arange(16, dtype=jnp.int32) % tiny_graph.num_nodes("patient")
    l = jnp.arange(16, dtype=jnp.int32) % tiny_graph.num_nodes("lab")
    f = jax.jit(
        lambda v, g, pi, li: model.apply(
            v, g, pi, li, train=False, method=model.predict_lab_values
        )
    )
    a = f(variables, tiny_graph, p, l)
    b = f(variables, tiny_graph, p, l)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dual_head_routing(model_and_vars, tiny_graph):
    """Pairs below the degree threshold must come from the tabular head:
    zeroing the GNN head's output layer must NOT change their predictions,
    and MUST change high-degree ones."""
    model, variables = model_and_vars
    deg = np.asarray(tiny_graph.patient_lab_degree)
    low = np.where(deg < 6)[0]
    high = np.where(deg >= 6)[0]
    assert len(low) > 0 and len(high) > 0, "tiny graph should straddle the threshold"
    p = jnp.asarray(np.concatenate([low[:4], high[:4]]).astype(np.int32))
    l = jnp.zeros_like(p)

    f = jax.jit(
        lambda v, g, pi, li: model.apply(
            v, g, pi, li, train=False, method=model.predict_lab_values
        )
    )
    base = np.asarray(f(variables, tiny_graph, p, l))

    zeroed = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    params = jax.tree_util.tree_map(jnp.asarray, variables["params"])
    import flax

    params = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") else dict(params)
    params["edge_predictor"]["dense_out"]["kernel"] = jnp.zeros_like(
        params["edge_predictor"]["dense_out"]["kernel"]
    )
    params["edge_predictor"]["dense_out"]["bias"] = jnp.full_like(
        params["edge_predictor"]["dense_out"]["bias"], 123.0
    )
    zeroed = {**variables, "params": params}
    mod = np.asarray(f(zeroed, tiny_graph, p, l))

    n_low = len(low[:4])
    np.testing.assert_allclose(mod[:n_low], base[:n_low], rtol=1e-6)
    assert np.all(np.abs(mod[n_low:] - base[n_low:]) > 1.0)


def test_dropout_active_in_train_mode(model_and_vars, tiny_graph):
    model, variables = model_and_vars
    p = jnp.zeros(8, jnp.int32)
    l = jnp.zeros(8, jnp.int32)
    f = jax.jit(
        lambda v, g, pi, li, k: model.apply(
            v, g, pi, li, train=True, method=model.predict_lab_values,
            rngs={"dropout": k, "edge_dropout": jax.random.fold_in(k, 1)},
            mutable=["batch_stats"],
        )[0]
    )
    a = np.asarray(f(variables, tiny_graph, p, l, jax.random.key(1)))
    b = np.asarray(f(variables, tiny_graph, p, l, jax.random.key(2)))
    assert not np.allclose(a, b), "different dropout keys must give different outputs"


def test_hgt_variant_runs(tiny_graph):
    cfg = Config()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, architecture="HGT"))
    model = build_model(cfg, tiny_graph)
    variables = init_model_variables(model, tiny_graph, jax.random.key(0))
    p = jnp.zeros(4, jnp.int32)
    l = jnp.zeros(4, jnp.int32)
    out = jax.jit(
        lambda v, g, pi, li: model.apply(
            v, g, pi, li, train=False, method=model.predict_lab_values
        )
    )(variables, tiny_graph, p, l)
    assert out.shape == (4,)
    assert np.all(np.isfinite(np.asarray(out)))


def test_hgt_dense_attention_matches_segment(tiny_graph):
    """The dense-attention tier (joint masked softmax over concatenated
    source spaces, MXU matmuls) is numerically equivalent to the per-edge
    segment tier — same grouped normalization, multiplicity-weighted
    (models/hgt.py HGTLayer docstring)."""
    cfg = Config()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, architecture="HGT"))
    model = build_model(cfg, tiny_graph)
    variables = init_model_variables(model, tiny_graph, jax.random.key(3))
    rng_np = np.random.default_rng(0)
    n_lab = tiny_graph.num_nodes("lab")
    n_pat = tiny_graph.num_nodes("patient")
    p = jnp.asarray(rng_np.integers(0, n_pat, 64).astype(np.int32))
    l = jnp.asarray(rng_np.integers(0, n_lab, 64).astype(np.int32))

    # tiny_graph relations are all under the dense budget -> dense engages
    out_dense = jax.jit(
        lambda v, g, pi, li: model.apply(
            v, g, pi, li, train=False, method=model.predict_lab_values
        )
    )(variables, tiny_graph, p, l)
    # strip the dense adjacencies -> segment tier is the only option
    seg_graph = tiny_graph.replace(
        edges={
            et: es.replace(dense_adj=None) for et, es in tiny_graph.edges.items()
        }
    )
    out_seg = jax.jit(
        lambda v, g, pi, li: model.apply(
            v, g, pi, li, train=False, method=model.predict_lab_values
        )
    )(variables, seg_graph, p, l)
    np.testing.assert_allclose(
        np.asarray(out_dense), np.asarray(out_seg), rtol=2e-5, atol=2e-5
    )


def test_hgt_dense_attn_budget_config_knob(tiny_graph):
    """model.extras.hgt_dense_attn_bytes reaches the layers; 0 disables the
    dense tier (outputs unchanged either way — tier equivalence)."""
    cfg = Config()
    base = dataclasses.replace(cfg.model, architecture="HGT")
    m_on = build_model(cfg.replace(model=base), tiny_graph)
    m_off = build_model(
        cfg.replace(model=dataclasses.replace(base, extras={"hgt_dense_attn_bytes": 0})),
        tiny_graph,
    )
    assert m_on.dense_attn_max_bytes == 134_217_728
    assert m_off.dense_attn_max_bytes == 0
    variables = init_model_variables(m_on, tiny_graph, jax.random.key(5))
    p = jnp.zeros(8, jnp.int32)
    l = jnp.zeros(8, jnp.int32)
    run = lambda m: np.asarray(  # noqa: E731
        jax.jit(
            lambda v, g, pi, li: m.apply(
                v, g, pi, li, train=False, method=m.predict_lab_values
            )
        )(variables, tiny_graph, p, l)
    )
    np.testing.assert_allclose(run(m_on), run(m_off), rtol=2e-5, atol=2e-5)


def test_patient_encoder_l2_normalized(model_and_vars, tiny_graph):
    model, variables = model_and_vars
    x_dict = jax.jit(
        lambda v, : model.apply(v, train=False, method=model.encode_nodes)
    )(variables)
    norms = np.linalg.norm(np.asarray(x_dict["patient"]), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_factored_head_equals_concat_linear(rng, tiny_graph):
    """FactoredEdgeHead == EdgeRegressionHead on concat, with stitched weights."""
    import flax

    from multi_modal_gnn_tpu.models.layers import EdgeRegressionHead, FactoredEdgeHead

    d, h = 16, 8
    num_p, num_l, b = 12, 5, 20
    xp = jnp.asarray(rng.standard_normal((num_p, d)).astype(np.float32))
    xl = jnp.asarray(rng.standard_normal((num_l, d)).astype(np.float32))
    p_idx = jnp.asarray(rng.integers(0, num_p, b).astype(np.int32))
    l_idx = jnp.asarray(rng.integers(0, num_l, b).astype(np.int32))

    fact = FactoredEdgeHead(node_dim=d, hidden_dims=(h, 4), dropout=0.0)
    fvars = fact.init(jax.random.key(0), xp, xl, p_idx, l_idx)

    conc = EdgeRegressionHead(input_dim=2 * d, hidden_dims=(h, 4), dropout=0.0)
    cvars = conc.init(jax.random.key(1), jnp.zeros((1, 2 * d)))
    # stitch the factored weights into the concat layout
    cp = flax.core.unfreeze(cvars)["params"] if hasattr(flax.core, "unfreeze") else dict(cvars["params"])
    fp = fvars["params"]
    cp["dense_0"]["kernel"] = jnp.concatenate(
        [fp["proj_patient"]["kernel"], fp["proj_lab"]["kernel"]], axis=0
    )
    cp["dense_0"]["bias"] = fp["proj_patient"]["bias"]
    cp["dense_1"] = fp["dense_1"]
    cp["dense_out"] = fp["dense_out"]

    got = fact.apply(fvars, xp, xl, p_idx, l_idx)
    pre = jnp.concatenate([xp[p_idx], xl[l_idx]], axis=-1)
    want = conc.apply({"params": cp}, pre)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_factored_head_plan_gradient_parity():
    """Factored-head gathers through GatherPlans (MXU scatter-free backward)
    must match plain indexing to float tolerance, gradients included."""
    from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle
    from multi_modal_gnn_tpu.training.masker import EdgeMasker

    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model,
            use_pallas=True,  # interpret-mode kernels on CPU
            extras={"head_style": "factored"},
            edge_head=dataclasses.replace(cfg.model.edge_head, extras={"bilinear_rank": 4}),
        )
    )
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=2), cfg)
    g = bundle.graph
    masker = EdgeMasker(g, seed=3, host_edges=bundle.patient_lab_host())
    batch = masker.get_split("train")
    model = build_model(cfg, g)
    variables = init_model_variables(model, g, jax.random.key(0))

    def loss(vars_, pp, lp):
        preds = model.apply(
            vars_, g, batch.patient_idx, batch.lab_idx, train=False,
            method=model.predict_lab_values, patient_plan=pp, lab_plan=lp,
        )
        return jnp.sum((preds - batch.values) ** 2 * batch.valid)

    l_plan, g_plan = jax.value_and_grad(loss)(variables, batch.patient_plan, batch.lab_plan)
    l_none, g_none = jax.value_and_grad(loss)(variables, None, None)
    assert float(abs(l_plan - l_none)) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(g_plan), jax.tree_util.tree_leaves(g_none)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_dual_head_fusion_model_parity():
    """model.extras.dual_head_fusion='on' (one fused_pair_head_dual call for
    both heads) must match the predicated single-head calls exactly — preds
    and grads — on a slot-major batch with degree masks."""
    from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle
    from multi_modal_gnn_tpu.training.masker import EdgeMasker

    def make(mode):
        cfg = Config()
        cfg = cfg.replace(
            model=dataclasses.replace(
                cfg.model,
                use_pallas=True,  # interpret-mode kernels on CPU
                extras={"head_style": "factored", "dual_head_fusion": mode},
            )
        )
        return cfg

    cfg_on, cfg_off = make("on"), make("off")
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=2), cfg_on)
    g = bundle.graph
    masker = EdgeMasker(
        g, seed=3, host_edges=bundle.patient_lab_host(),
        slot_major_train=True, slot_major_min_rows=1,
    )
    batch = masker.get_split("train")
    assert getattr(batch.patient_plan, "identity", False)
    degrees = jnp.take(g.patient_lab_degree, batch.patient_idx)

    model_on = build_model(cfg_on, g)
    model_off = build_model(cfg_off, g)
    variables = init_model_variables(model_on, g, jax.random.key(0))

    def loss(model):
        def f(vars_):
            preds = model.apply(
                vars_, g, batch.patient_idx, batch.lab_idx, train=False,
                method=model.predict_lab_values,
                patient_plan=batch.patient_plan, lab_plan=batch.lab_plan,
                degrees=degrees,
            )
            return jnp.sum((preds - batch.values) ** 2 * batch.valid)
        return f

    l_on, g_on = jax.value_and_grad(loss(model_on))(variables)
    l_off, g_off = jax.value_and_grad(loss(model_off))(variables)
    assert float(abs(l_on - l_off)) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(g_on), jax.tree_util.tree_leaves(g_off)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_hgt_flash_attention_matches_segment(tiny_bundle):
    """The FLASH tier (windowed flash-softmax kernels over the combined
    per-destination plans, ops/pallas_attention.py) is numerically
    equivalent to the per-edge segment tier — same grouped softmax over all
    relations into a destination (round-5 verdict item 1)."""
    from multi_modal_gnn_tpu.graph.attn_plan import build_attn_plans

    tiny_graph = tiny_bundle.graph
    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, architecture="HGT", use_pallas=True)
    )
    model = build_model(cfg, tiny_graph)
    assert model.impl == "pallas"
    variables = init_model_variables(model, tiny_graph, jax.random.key(3))
    rng_np = np.random.default_rng(0)
    p = jnp.asarray(rng_np.integers(0, tiny_graph.num_nodes("patient"), 64).astype(np.int32))
    l = jnp.asarray(rng_np.integers(0, tiny_graph.num_nodes("lab"), 64).astype(np.int32))

    # no dense adjacencies + no plans -> segment tier
    seg_graph = tiny_graph.replace(
        edges={et: es.replace(dense_adj=None) for et, es in tiny_graph.edges.items()}
    )
    # no dense adjacencies + plans -> flash tier on every group
    plans = build_attn_plans(seg_graph, tiny_bundle.host_edges)
    assert set(plans) == set(et[2] for et in seg_graph.edge_types)
    flash_graph = seg_graph.replace(attn_plans=plans)

    fwd = jax.jit(
        lambda v, g, pi, li: model.apply(
            v, g, pi, li, train=False, method=model.predict_lab_values
        )
    )
    out_seg = fwd(variables, seg_graph, p, l)
    out_flash = fwd(variables, flash_graph, p, l)
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_seg), rtol=2e-5, atol=2e-5
    )


def test_hgt_flash_gradients_match_segment(tiny_bundle):
    """Training gradients through the flash tier (two window-walk backward
    kernels) match the segment tier's autodiff gradients."""
    from multi_modal_gnn_tpu.graph.attn_plan import build_attn_plans

    tiny_graph = tiny_bundle.graph
    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, architecture="HGT", use_pallas=True, dropout=0.0
        )
    )
    model = build_model(cfg, tiny_graph)
    variables = init_model_variables(model, tiny_graph, jax.random.key(3))
    rng_np = np.random.default_rng(1)
    p = jnp.asarray(rng_np.integers(0, tiny_graph.num_nodes("patient"), 64).astype(np.int32))
    l = jnp.asarray(rng_np.integers(0, tiny_graph.num_nodes("lab"), 64).astype(np.int32))
    y = jnp.asarray(rng_np.normal(size=64), jnp.float32)

    seg_graph = tiny_graph.replace(
        edges={et: es.replace(dense_adj=None) for et, es in tiny_graph.edges.items()}
    )
    flash_graph = seg_graph.replace(
        attn_plans=build_attn_plans(seg_graph, tiny_bundle.host_edges)
    )

    def loss(params, g):
        pred = model.apply(
            {**variables, "params": params}, g, p, l,
            train=False, method=model.predict_lab_values,
        )
        return jnp.mean((pred - y) ** 2)

    from jax.flatten_util import ravel_pytree

    g_seg = jax.jit(jax.grad(loss))(variables["params"], seg_graph)
    g_flash = jax.jit(jax.grad(loss))(variables["params"], flash_graph)
    flat_s, _ = ravel_pytree(g_seg)
    flat_f, _ = ravel_pytree(g_flash)
    np.testing.assert_allclose(
        np.asarray(flat_f), np.asarray(flat_s), rtol=1e-3, atol=1e-5
    )
