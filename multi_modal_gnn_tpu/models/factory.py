"""Model factory (reference: src/model.py:523-572)."""

from __future__ import annotations

import logging
from typing import Union

import jax
import jax.numpy as jnp

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.graph.hetero import HeteroGraph
from multi_modal_gnn_tpu.models.hgt import HeteroGT
from multi_modal_gnn_tpu.models.rgcn import HeteroRGCN

logger = logging.getLogger(__name__)

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def build_model(
    config: Config, graph: HeteroGraph, axis_name: str | None = None
) -> Union[HeteroRGCN, HeteroGT]:
    """Instantiate the configured architecture, statically sized to the graph.

    ``axis_name`` marks the mesh axis edge arrays are sharded over when the
    model runs inside shard_map data parallelism (parallel/dp.py).
    """
    mc = config.model
    if mc.compute_dtype == "auto":
        # probe the chip's f32-vs-bf16 MXU rate once (utils/mxu_probe.py);
        # bf16 engages only where it measures >= 15% faster (not this v5e)
        from multi_modal_gnn_tpu.utils.mxu_probe import resolve_compute_dtype

        dtype = _DTYPES.get(resolve_compute_dtype("auto"), jnp.float32)
    else:
        dtype = _DTYPES.get(mc.compute_dtype, jnp.float32)
    impl = "pallas" if mc.use_pallas else "xla"
    common = dict(
        node_counts=graph.node_counts,
        edge_types=graph.edge_types,
        hidden_dim=mc.hidden_dim,
        num_layers=mc.num_layers,
        dropout=mc.dropout,
        head_hidden_dims=tuple(mc.edge_head.hidden_dims),
        dtype=dtype,
    )
    bl_source = str(mc.edge_head.extras.get("bilinear_source", "head"))
    value_context = bool(mc.extras.get("value_context", False))
    if bl_source == "context" and not value_context:
        raise ValueError(
            "edge_head.extras.bilinear_source='context' requires "
            "model.extras.value_context=true — without the trainer's "
            "val_vis gating the context channel would read val/test values "
            "(leakage)"
        )
    if mc.architecture == "RGCN":
        # factored heads win when pair count dwarfs node count (large
        # cohorts); concat wins on op-count-bound small graphs
        num_patients = dict(graph.node_counts).get("patient", 0)
        head_style = mc.extras.get("head_style", "auto")
        if head_style == "auto":
            head_style = "factored" if num_patients >= 20_000 else "concat"
        model = HeteroRGCN(
            **common,
            activation=mc.activation,
            use_batch_norm=mc.use_batch_norm,
            aggregation=mc.aggregation,
            degree_threshold=mc.degree_threshold,
            impl=impl,
            axis_name=axis_name,
            head_style=head_style,
            bilinear_rank=int(mc.edge_head.extras.get("bilinear_rank", 0)),
            bilinear_source=bl_source,
            value_context=value_context,
            dual_head_fusion=str(mc.extras.get("dual_head_fusion", "auto")),
        )
    elif mc.architecture == "HGT":
        model = HeteroGT(
            **common,
            num_heads=mc.num_heads,
            impl=impl,
            axis_name=axis_name,
            bilinear_rank=int(mc.edge_head.extras.get("bilinear_rank", 0)),
            bilinear_source=bl_source,
            value_context=value_context,
            # dense-attention joint-logits budget (models/hgt.py HGTLayer;
            # 0 disables the tier)
            dense_attn_max_bytes=int(
                mc.extras.get("hgt_dense_attn_bytes", 134_217_728)
            ),
        )
    else:
        raise ValueError(f"Unknown architecture: {mc.architecture}")
    logger.info("Built %s model (hidden=%d, layers=%d)", mc.architecture, mc.hidden_dim, mc.num_layers)
    return model


def init_model_variables(model, graph: HeteroGraph, rng: jax.Array):
    """Initialize parameters + batch stats with one jitted abstract forward.

    Wrapped in jit so initialization is a single XLA compilation instead of
    hundreds of op-by-op dispatches (which dominate wall time on this host).
    """
    params_rng, dropout_rng = jax.random.split(rng)
    dummy_idx = jnp.zeros(8, dtype=jnp.int32)

    @jax.jit
    def _init(p_rng, d_rng, g):
        return model.init(
            {"params": p_rng, "dropout": d_rng},
            g,
            dummy_idx,
            dummy_idx,
            train=False,
            method=model.predict_lab_values,
        )

    return _init(params_rng, dropout_rng, graph)


def count_parameters(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
