"""Flash-attention kernel parity: forward + gradients vs a jnp oracle.

The oracle (``flash_attention_ref``) is segment-softmax attention over the
same combined plan arrays; gradients of the oracle come from jax autodiff,
gradients of the kernel from the two window-walk backward passes
(ops/pallas_attention.py).  Runs in Pallas interpret mode on CPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_gnn_tpu.graph.attn_plan import (
    AttnGroupPlan,
    _build_side,
    build_attn_plans,
)
from multi_modal_gnn_tpu.ops.pallas_attention import (
    flash_attention_group,
    flash_attention_ref,
)


def _random_group(
    num_dst=300, num_src=150, num_edges=4000, seed=0, resident_max=2048, span_rows=64
) -> AttnGroupPlan:
    rng = np.random.default_rng(seed)
    src = rng.integers(0, num_src, num_edges).astype(np.int32)
    dst = rng.integers(0, num_dst, num_edges).astype(np.int32)
    fwd = _build_side(src, dst, num_dst, num_src, span_rows, resident_max)
    rev = _build_side(dst, src, num_src, num_dst, span_rows, resident_max)
    assert fwd is not None and rev is not None
    return AttnGroupPlan(
        fwd=fwd, rev=rev, rel_keys=(), src_offsets=(0,),
        num_src_total=num_src, num_dst=num_dst, num_edges=num_edges,
    )


def _qkv(plan, h=64, seed=1):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(plan.num_dst, h)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(plan.num_src_total, h)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(plan.num_src_total, h)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("nh", [1, 4])
def test_forward_matches_reference_resident(nh):
    plan = _random_group()
    q, k, v = _qkv(plan)
    out = flash_attention_group(q, k, v, plan, nh, interpret=True)
    ref = flash_attention_ref(q, k, v, plan, nh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_forward_empty_destinations_are_zero():
    # destinations above 100 receive no edges at all
    rng = np.random.default_rng(3)
    src = rng.integers(0, 50, 1000).astype(np.int32)
    dst = rng.integers(0, 100, 1000).astype(np.int32)
    fwd = _build_side(src, dst, 400, 50, 64, 2048)
    rev = _build_side(dst, src, 50, 400, 64, 2048)
    plan = AttnGroupPlan(fwd=fwd, rev=rev, num_src_total=50, num_dst=400, num_edges=1000)
    q, k, v = _qkv(plan)
    out = np.asarray(flash_attention_group(q, k, v, plan, 4, interpret=True))
    assert np.all(out[100:] == 0.0)
    ref = np.asarray(flash_attention_ref(q, k, v, plan, 4))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("nh", [4])
def test_gradients_match_reference_resident(nh):
    plan = _random_group(num_dst=200, num_src=120, num_edges=3000)
    q, k, v = _qkv(plan)
    w = jnp.asarray(
        np.random.default_rng(7).normal(size=(plan.num_dst, q.shape[1])), jnp.float32
    )

    def loss_kernel(q_, k_, v_):
        return jnp.sum(w * flash_attention_group(q_, k_, v_, plan, nh, interpret=True))

    def loss_ref(q_, k_, v_):
        return jnp.sum(w * flash_attention_ref(q_, k_, v_, plan, nh))

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, gr, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5, err_msg=name
        )


def test_forward_and_grad_span_tier():
    """Force the span layout on BOTH sides (resident_max=0)."""
    # dense enough that a 1024-edge tile's sources fit the span (the span
    # packer's inflation gate rejects too-sparse layouts by design)
    plan = _random_group(
        num_dst=300, num_src=260, num_edges=20000, resident_max=0, span_rows=128
    )
    assert plan.fwd.use_span and plan.rev.use_span
    q, k, v = _qkv(plan)
    out = flash_attention_group(q, k, v, plan, 4, interpret=True)
    ref = flash_attention_ref(q, k, v, plan, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    w = jnp.ones_like(out)
    gk = jax.grad(
        lambda *a: jnp.sum(w * flash_attention_group(*a, plan, 4, interpret=True)),
        argnums=(0, 1, 2),
    )(q, k, v)
    gr = jax.grad(
        lambda *a: jnp.sum(w * flash_attention_ref(*a, plan, 4)), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b, name in zip(gk, gr, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5, err_msg=name
        )


def test_duplicate_edges_accumulate_mass():
    """Duplicate (src, dst) edges each carry their own softmax slot — the
    segment-tier contract (multiplicity weighting in the dense tier)."""
    src = np.array([0, 0, 1], dtype=np.int32)
    dst = np.array([0, 0, 0], dtype=np.int32)
    fwd = _build_side(src, dst, 2, 2, 64, 2048)
    rev = _build_side(dst, src, 2, 2, 64, 2048)
    plan = AttnGroupPlan(fwd=fwd, rev=rev, num_src_total=2, num_dst=2, num_edges=3)
    h, nh = 8, 2
    q = jnp.ones((2, h), jnp.float32)
    k = jnp.asarray(np.random.default_rng(0).normal(size=(2, h)), jnp.float32)
    v = jnp.asarray(np.random.default_rng(1).normal(size=(2, h)), jnp.float32)
    out = flash_attention_group(q, k, v, plan, nh, interpret=True)
    ref = flash_attention_ref(q, k, v, plan, nh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_build_attn_plans_groups_match_graph(tmp_path):
    """Plans built from a real bundle: one group per destination type, every
    relation represented, edge counts conserved."""
    from multi_modal_gnn_tpu.config import Config
    from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle

    cfg = Config()
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=5), cfg)
    plans = build_attn_plans(bundle.graph, bundle.host_edges)
    assert set(plans) == set(et[2] for et in bundle.graph.edge_types)
    for dst_t, plan in plans.items():
        ets = [et for et in bundle.graph.edge_types if et[2] == dst_t]
        assert plan.rel_keys == tuple(ets)
        total = sum(bundle.graph.edges[et].num_valid for et in ets)
        assert plan.num_edges == total


def test_high_ladder_rung_sparse_low_dst_group():
    """The round-5 span-ladder extension (graph/attn_plan._SPAN_LADDER up to
    16/32x base): a LOW-dst-count group whose edges spread across a large
    gather table (the scale config's diagnosis group shape — 400k edges
    into 4 dst windows over 100k patients) packs only at a tall span, and
    the kernels must stay exact on that layout.  Shrunk here: 256 dst over
    a 6k-row source at low per-window density forces span escalation."""
    rng = np.random.default_rng(3)
    num_dst, num_src, num_edges = 256, 6000, 20000
    src = rng.integers(0, num_src, num_edges).astype(np.int32)
    dst = rng.integers(0, num_dst, num_edges).astype(np.int32)
    fwd = _build_side(src, dst, num_dst, num_src, 128, 512)
    rev = _build_side(dst, src, num_src, num_dst, 128, 512)
    assert fwd is not None and rev is not None
    # the point of the test: the forward side escalated past the base span
    assert fwd.use_span and fwd.span_rows >= 512, fwd.span_rows
    plan = AttnGroupPlan(
        fwd=fwd, rev=rev, rel_keys=(), src_offsets=(0,),
        num_src_total=num_src, num_dst=num_dst, num_edges=num_edges,
    )
    q, k, v = _qkv(plan)
    nh = 4
    out = flash_attention_group(q, k, v, plan, nh, interpret=True)
    ref = flash_attention_ref(q, k, v, plan, nh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    w = jnp.asarray(np.random.default_rng(4).normal(size=out.shape), jnp.float32)
    g_k = jax.grad(
        lambda q_, k_, v_: jnp.sum(flash_attention_group(q_, k_, v_, plan, nh, interpret=True) * w),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_r = jax.grad(
        lambda q_, k_, v_: jnp.sum(flash_attention_ref(q_, k_, v_, plan, nh) * w),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5)
