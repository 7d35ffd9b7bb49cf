"""Observed-value context channel, shared by both architectures.

The reference's message passing ignores ``edge_attr`` entirely — lab values
ride the graph but never enter a message (src/model.py:116-131), so its only
information channel is supervised matrix factorization.  The Bayes-optimal
predictor for a masked lab, however, conditions on the patient's *other
observed values* (evaluation/ceiling.py).  This beyond-reference opt-in
(``model.extras.value_context``) adds one value-weighted aggregation per
side before layer 0:

    ctx[p] = mean_{visible e: p->l} val_e * x[l],   (+ visible-count channel)
    ctx[l] = mean_{visible e: p->l} val_e * x[p],   (+ visible-count channel)

projected and added to the node features.  Visibility (``EdgeSet.val_vis``,
set by the trainer per forward) excludes supervised/val/test edges, so the
channel is leakage-free under the mask-and-recover protocol — pinned by
tests/test_value_context.py for RGCN and HGT alike.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from multi_modal_gnn_tpu.graph.hetero import HeteroGraph
from multi_modal_gnn_tpu.graph.schema import LAB, PATIENT, PATIENT_LAB


def patient_value_context(
    x_l: jax.Array, es, axis_name: str | None = None
) -> Tuple[jax.Array, jax.Array]:
    """(mean value-weighted lab-feature context [num_patients, D],
    visible count [num_patients]) — the sufficient statistic the Bayes
    predictor conditions on (evaluation/ceiling.py: the posterior mean of
    a patient's latent state is a linear map of sum_obs val * w_lab).
    Unsorted segment over src — off the reference hot path (opt-in)."""
    vis = es.val_vis if es.val_vis is not None else es.mask
    v = (es.val * vis).astype(x_l.dtype)
    # mode="clip": padding rows carry dst == num_dst (one past the lab
    # table; the default fill mode would gather NaN, and NaN * 0 = NaN)
    wsum_p = jax.ops.segment_sum(
        jnp.take(x_l, es.dst, axis=0, mode="clip") * v[:, None],
        es.src, num_segments=es.num_src,
    )
    cnt_p = jax.ops.segment_sum(vis, es.src, num_segments=es.num_src)
    if axis_name is not None:  # edge-sharded SPMD: combine partials
        wsum_p = jax.lax.psum(wsum_p, axis_name)
        cnt_p = jax.lax.psum(cnt_p, axis_name)
    ctx = wsum_p / jnp.maximum(cnt_p, 1.0)[:, None].astype(wsum_p.dtype)
    return ctx, cnt_p


def inject_value_context(
    x_dict: Dict[str, jax.Array],
    graph: HeteroGraph,
    vctx_patient,
    vctx_lab,
    axis_name: str | None = None,
) -> Dict[str, jax.Array]:
    """Add the observed-value channel to patient/lab features (one
    value-weighted aggregation per side; module doc).  ``EdgeSet.val_vis``
    gates which values this forward may see; absent (e.g. during init) it
    falls back to the structural mask, which the trainer never allows at
    train/eval time.  ``vctx_patient`` / ``vctx_lab`` are the caller's
    Dense(hidden, hidden+1) projections."""
    es = graph.edges.get(PATIENT_LAB)
    if es is None or es.val is None:
        return x_dict
    x_p, x_l = x_dict[PATIENT], x_dict[LAB]
    vis = es.val_vis if es.val_vis is not None else es.mask
    v = (es.val * vis).astype(x_p.dtype)

    # per-lab context: edges are dst(=lab)-sorted — the fast segment path
    num_seg = es.num_dst + 1  # dummy segment swallows padding
    wsum_l = jax.ops.segment_sum(
        jnp.take(x_p, es.src, axis=0) * v[:, None],
        es.dst, num_segments=num_seg, indices_are_sorted=True,
    )[: es.num_dst]
    cnt_l = jax.ops.segment_sum(
        vis, es.dst, num_segments=num_seg, indices_are_sorted=True
    )[: es.num_dst]
    ctx_p, cnt_p = patient_value_context(x_l, es, axis_name)
    if axis_name is not None:
        wsum_l = jax.lax.psum(wsum_l, axis_name)
        cnt_l = jax.lax.psum(cnt_l, axis_name)

    def with_frac(mean, cnt, total):
        frac = (cnt / float(total)).astype(mean.dtype)
        return jnp.concatenate([mean, frac[:, None]], axis=-1)

    ctx_l = wsum_l / jnp.maximum(cnt_l, 1.0)[:, None].astype(wsum_l.dtype)
    out = dict(x_dict)
    out[PATIENT] = x_p + vctx_patient(with_frac(ctx_p, cnt_p, es.num_dst))
    out[LAB] = x_l + vctx_lab(with_frac(ctx_l, cnt_l, es.num_src))
    return out
