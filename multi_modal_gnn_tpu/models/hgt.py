"""Heterogeneous graph transformer (alternative architecture).

Capability-parity with the reference's (unused-in-production) ``HeteroGT``
(src/model.py:403-516): attention-based message passing over typed relations.
Implemented TPU-natively as per-edge multi-head attention with a grouped
segment-softmax over each destination's incoming edges across all relations —
no PyG ``HGTConv``.  Unlike the reference variant (which consumes handcrafted
patient features), this uses the same learnable ID-embedding tables as the
production model, so it runs on the same graph artifact.

Beyond-reference opt-ins (shared with HeteroRGCN, same config keys):
``value_context`` (models/context.py — condition on observed lab values,
leakage-gated by ``EdgeSet.val_vis``) and the embedding-bilinear channel
(``edge_head.extras.bilinear_rank/bilinear_source``) that
training/warmstart.py plants the exact ALS solution into.  Without them,
typed attention over featureless ID embeddings cannot beat the per-lab mean
on the synthetic cohort (README "Results"); with them the HGT trunk gets
the same information channels the RGCN quality ladder measured.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multi_modal_gnn_tpu.graph.hetero import HeteroGraph
from multi_modal_gnn_tpu.graph.schema import EdgeTypeKey, LAB, PATIENT, PATIENT_LAB
from multi_modal_gnn_tpu.models.context import (
    inject_value_context,
    patient_value_context,
)
from multi_modal_gnn_tpu.models.layers import EdgeRegressionHead, make_dense
from multi_modal_gnn_tpu.ops.segment import segment_softmax, segment_sum


def _et_key(et: EdgeTypeKey) -> str:
    return "__".join(et)


class HGTLayer(nn.Module):
    """One layer of typed multi-head attention message passing.

    Two interchangeable execution tiers per destination-type group (the
    same philosophy as the RGCN aggregation tiers, ops/segment.py):

      * DENSE attention — when every relation into the destination type
        carries a dense adjacency (graph.dense_adjacency_max_bytes) and the
        joint logits tensor fits ``dense_attn_max_bytes``: one masked
        softmax over the CONCATENATED source spaces, computed as batched
        MXU matmuls ``Q K^T`` / ``attn @ V``.  At EHR bipartite shapes
        (eICU: patients x [labs|dx|rx] = 1834 x 264) this replaces every
        per-edge gather and both segment passes — the ops that dominate the
        segment tier's wall time at small scale (PERFORMANCE.md "HGT");
      * SEGMENT attention — per-edge gathers + grouped segment-softmax,
        exact for any scale, and the only tier under shard_map (edge
        shards + psum; dense joint logits do not shard along edges).

    Tiers are numerically equivalent (same grouped normalization,
    multiplicity-weighted for duplicate edges; pinned in
    tests/test_model.py::test_hgt_dense_attention_matches_segment).
    """

    edge_types: Tuple[EdgeTypeKey, ...]
    node_types: Tuple[str, ...]
    hidden_dim: int
    num_heads: int = 4
    axis_name: str | None = None  # mesh axis edges are sharded over (SPMD)
    dtype: jnp.dtype | None = None
    # joint-logits byte budget for the dense tier (0 disables): engages on
    # eICU-scale groups (~2 MB), never at MIMIC/scale shapes (>0.5 GB)
    dense_attn_max_bytes: int = 134_217_728
    # "pallas" enables the FLASH tier (round 5): windowed flash-softmax
    # kernels over the combined per-destination plans the graph carries
    # (graph.attn_plans, graph/attn_plan.py).  Engages when the dense tier
    # does not (the dense tier wins at eICU shapes, the flash tier at
    # 5M-edge scale where dense logits blow every budget and the segment
    # tier's gathers are the measured 87/88.75 ms — PERFORMANCE.md "HGT").
    impl: str = "xla"

    def setup(self):
        h = self.hidden_dim
        self.q_proj = {nt: make_dense(h, h, name=f"q_{nt}") for nt in self.node_types}
        self.k_proj = {_et_key(et): make_dense(h, h, name=f"k_{_et_key(et)}") for et in self.edge_types}
        self.v_proj = {_et_key(et): make_dense(h, h, name=f"v_{_et_key(et)}") for et in self.edge_types}
        self.out_proj = {nt: make_dense(h, h, name=f"out_{nt}") for nt in self.node_types}

    def _dense_group_ok(self, graph: HeteroGraph, ets, num_dst: int) -> bool:
        if self.axis_name is not None or self.dense_attn_max_bytes <= 0:
            return False
        if any(graph.edges[et].dense_adj is None for et in ets):
            return False
        total_src = sum(graph.edges[et].dense_adj.shape[1] for et in ets)
        return num_dst * total_src * self.num_heads * 4 <= self.dense_attn_max_bytes

    def _dense_attention(self, x_dict, graph, dst_t, ets, q_nodes):
        """Joint masked softmax over concatenated source spaces — all MXU.

        ``dense_adj[d, s] = multiplicity / in-degree``; multiplying the
        exp-weights by multiplicity reproduces per-edge softmax exactly
        (duplicate edges share one logit, so their mass adds)."""
        h, nh = self.hidden_dim, self.num_heads
        dh = h // nh
        logits_parts, mult_parts, v_parts = [], [], []
        for et in ets:
            key = _et_key(et)
            es = graph.edges[et]
            src_t = et[0]
            k = self.k_proj[key](x_dict[src_t]).reshape(-1, nh, dh)
            v = self.v_proj[key](x_dict[src_t]).reshape(-1, nh, dh)
            logits_parts.append(
                jnp.einsum("dhk,shk->dsh", q_nodes, k) / jnp.sqrt(float(dh))
            )
            counts = es.dst_count.astype(jnp.float32)
            mult_parts.append(
                es.dense_adj.astype(jnp.float32)
                * jnp.maximum(counts, 1.0)[:, None]
            )
            v_parts.append(v)
        logits = jnp.concatenate(logits_parts, axis=1)  # [D, S_total, H]
        mult = jnp.concatenate(mult_parts, axis=1)  # [D, S_total]
        present = mult > 0
        neg = jnp.asarray(-jnp.inf, logits.dtype)
        logits = jnp.where(present[:, :, None], logits, neg)
        logits = logits - jax.lax.stop_gradient(
            jnp.max(jnp.where(present[:, :, None], logits, -1e30), axis=1, keepdims=True)
        )
        w = jnp.where(present[:, :, None], jnp.exp(logits) * mult[:, :, None], 0.0)
        denom = jnp.sum(w, axis=1, keepdims=True)
        attn = w / jnp.maximum(denom, 1e-20)
        values = jnp.concatenate(v_parts, axis=0)  # [S_total, H, dh]
        return jnp.einsum("dsh,shk->dhk", attn, values)

    def __call__(self, x_dict: Dict[str, jax.Array], graph: HeteroGraph) -> Dict[str, jax.Array]:
        h, nh = self.hidden_dim, self.num_heads
        dh = h // nh
        # Group incoming edges by destination node type so attention
        # normalizes across *all* relations that point at a node.
        incoming: Dict[str, list] = {}
        for et in self.edge_types:
            incoming.setdefault(et[2], []).append(et)

        out: Dict[str, jax.Array] = {}
        for dst_t, ets in incoming.items():
            q_nodes = self.q_proj[dst_t](x_dict[dst_t]).reshape(-1, nh, dh)
            num_dst = x_dict[dst_t].shape[0]
            if self._dense_group_ok(graph, ets, num_dst):
                agg = self._dense_attention(x_dict, graph, dst_t, ets, q_nodes)
                agg = agg.reshape(num_dst, h)
                out[dst_t] = nn.gelu(self.out_proj[dst_t](agg)) + x_dict[dst_t]
                continue
            plan = None
            if (
                self.impl == "pallas"
                and self.axis_name is None
                and graph.attn_plans is not None
            ):
                plan = graph.attn_plans.get(dst_t)
            if plan is not None:
                # FLASH tier: grouped softmax over the combined virtual
                # relation — per-relation K/V projections stacked into one
                # source table, one windowed flash kernel per direction
                from multi_modal_gnn_tpu.ops.pallas_attention import (
                    flash_attention_group,
                )

                ktab = jnp.concatenate(
                    [self.k_proj[_et_key(et)](x_dict[et[0]]) for et in plan.rel_keys],
                    axis=0,
                )
                vtab = jnp.concatenate(
                    [self.v_proj[_et_key(et)](x_dict[et[0]]) for et in plan.rel_keys],
                    axis=0,
                )
                agg = flash_attention_group(
                    q_nodes.reshape(num_dst, h), ktab, vtab, plan, nh
                )
                out[dst_t] = nn.gelu(self.out_proj[dst_t](agg)) + x_dict[dst_t]
                continue
            logits_parts, value_parts, dst_parts = [], [], []
            for et in ets:
                key = _et_key(et)
                es = graph.edges[et]
                src_t = et[0]
                k = self.k_proj[key](x_dict[src_t]).reshape(-1, nh, dh)[es.src]
                v = self.v_proj[key](x_dict[src_t]).reshape(-1, nh, dh)[es.src]
                # padded edges have dst == num_dst; clamp the gather and kill
                # their logits so they receive zero attention mass
                dst_c = jnp.minimum(es.dst, es.num_dst - 1)
                q = q_nodes[dst_c]
                logit = jnp.einsum("ehd,ehd->eh", q, k) / jnp.sqrt(float(dh))
                logit = jnp.where(es.mask[:, None] > 0, logit, -jnp.inf)
                logits_parts.append(logit)
                value_parts.append(v)
                dst_parts.append(dst_c)
            logits = jnp.concatenate(logits_parts, axis=0)
            values = jnp.concatenate(value_parts, axis=0)
            dsts = jnp.concatenate(dst_parts, axis=0)
            attn = segment_softmax(
                logits, dsts, num_segments=num_dst, axis_name=self.axis_name
            )
            attn = jnp.where(jnp.isfinite(logits), attn, 0.0)
            agg = segment_sum(values * attn[..., None], dsts, num_segments=num_dst)
            if self.axis_name is not None:
                # partial per-destination sums from each edge shard
                agg = jax.lax.psum(agg, self.axis_name)
            agg = agg.reshape(num_dst, h)
            out[dst_t] = nn.gelu(self.out_proj[dst_t](agg)) + x_dict[dst_t]
        for nt in self.node_types:
            out.setdefault(nt, x_dict[nt])
        return out


class HeteroGT(nn.Module):
    node_counts: Tuple[Tuple[str, int], ...]
    edge_types: Tuple[EdgeTypeKey, ...]
    hidden_dim: int = 128
    num_layers: int = 2
    num_heads: int = 4
    dropout: float = 0.2
    head_hidden_dims: Tuple[int, ...] = (64, 32)
    axis_name: str | None = None  # set under shard_map data parallelism
    # beyond-reference opt-ins, same semantics as HeteroRGCN's fields (see
    # models/rgcn.py ``bilinear_rank``/``bilinear_source``/``value_context``
    # docs); factory wires them from the same config keys for both archs
    bilinear_rank: int = 0
    bilinear_source: str = "head"
    value_context: bool = False
    # dense-attention tier joint-logits budget (HGTLayer doc; 0 disables);
    # config: model.extras.hgt_dense_attn_bytes
    dense_attn_max_bytes: int = 134_217_728
    # "pallas" enables the flash-attention tier when the graph carries
    # attn_plans (see HGTLayer.impl); wired from model.use_pallas
    impl: str = "xla"
    dtype: jnp.dtype | None = None
    # mini-batch cluster subgraphs (training/minibatch.py) resolve local
    # patient rows through HeteroGraph.patient_id_base in encode_nodes
    supports_patient_id_base = True

    @property
    def node_types(self) -> Tuple[str, ...]:
        return tuple(name for name, _ in self.node_counts)

    def setup(self):
        counts = dict(self.node_counts)
        self.embeddings = {
            nt: nn.Embed(
                num_embeddings=counts[nt],
                features=self.hidden_dim,
                embedding_init=nn.initializers.xavier_uniform(),
                name=f"embed_{nt}",
            )
            for nt in self.node_types
        }
        self.layers = [
            HGTLayer(
                edge_types=self.edge_types,
                node_types=self.node_types,
                hidden_dim=self.hidden_dim,
                num_heads=self.num_heads,
                axis_name=self.axis_name,
                dense_attn_max_bytes=self.dense_attn_max_bytes,
                impl=self.impl,
                name=f"hgt_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.edge_predictor = EdgeRegressionHead(
            input_dim=2 * self.hidden_dim,
            hidden_dims=self.head_hidden_dims,
            dropout=self.dropout,
            bilinear_rank=self.bilinear_rank if self.bilinear_source == "head" else 0,
            name="edge_predictor",
        )
        if self.bilinear_rank > 0 and self.bilinear_source in ("embedding", "context"):
            scale = nn.initializers.normal(stddev=1.0 / jnp.sqrt(self.hidden_dim))
            self.bilinear_u = self.param(
                "bilinear_u", scale, (self.hidden_dim, self.bilinear_rank)
            )
            self.bilinear_l = self.param(
                "bilinear_l", scale, (self.hidden_dim, self.bilinear_rank)
            )
        if self.value_context:
            # input = [value-weighted mean context (D), visible-count channel (1)]
            self.vctx_patient = make_dense(
                self.hidden_dim, self.hidden_dim + 1, dtype=self.dtype, name="vctx_patient"
            )
            self.vctx_lab = make_dense(
                self.hidden_dim, self.hidden_dim + 1, dtype=self.dtype, name="vctx_lab"
            )

    def encode_nodes(
        self, graph: Optional[HeteroGraph] = None, train: bool = False
    ) -> Dict[str, jax.Array]:
        """Embed every node id.  On a mini-batch cluster subgraph
        (``graph.patient_id_base`` set) the patient rows are the LOCAL
        window of the global table — local index + base, clamped past the
        global count to the last (edge-free, loss-masked) row — mirroring
        HeteroRGCN.encode_nodes so cluster training works for both
        architectures."""
        counts = dict(self.node_counts)
        x_dict = {}
        for nt in self.node_types:
            if (
                nt == PATIENT
                and graph is not None
                and graph.patient_id_base is not None
            ):
                idx = jnp.minimum(
                    jnp.arange(graph.num_nodes(PATIENT), dtype=jnp.int32)
                    + graph.patient_id_base,
                    counts[PATIENT] - 1,
                )
            else:
                idx = jnp.arange(counts[nt], dtype=jnp.int32)
            x_dict[nt] = self.embeddings[nt](idx)
        return x_dict

    def __call__(self, graph: HeteroGraph, train: bool = False) -> Dict[str, jax.Array]:
        x_dict = self.encode_nodes(graph, train=train)
        if self.value_context:
            x_dict = inject_value_context(
                x_dict, graph, self.vctx_patient, self.vctx_lab, self.axis_name
            )
        for layer in self.layers:
            x_dict = layer(x_dict, graph)
        return x_dict

    def _bilinear_term(
        self, graph: HeteroGraph, patient_indices: jax.Array, lab_indices: jax.Array
    ) -> jax.Array | None:
        """Shared low-rank MF readout over the raw ID tables (or the
        value-context statistic) — the channel training/warmstart.py plants
        the exact ALS solution into.  None when not configured."""
        if self.bilinear_rank <= 0 or self.bilinear_source == "head":
            return None
        # project tables to rank width BEFORE gathering (row-wise identical,
        # shrinks per-pair activations hidden_dim -> rank — see the RGCN
        # twin for the MIMIC-scale memory rationale)
        c_r = jnp.take(
            self.embeddings[LAB].embedding @ self.bilinear_l, lab_indices, axis=0
        )
        if self.bilinear_source == "embedding":
            # patient_indices are graph-LOCAL; on a cluster subgraph the
            # global table row is local + patient_id_base (same clamp as
            # encode_nodes)
            p_glob = patient_indices
            if graph.patient_id_base is not None:
                p_glob = jnp.minimum(
                    patient_indices + graph.patient_id_base,
                    dict(self.node_counts)[PATIENT] - 1,
                )
            u_r = jnp.take(
                self.embeddings[PATIENT].embedding @ self.bilinear_u, p_glob, axis=0
            )
        else:  # "context" — requires value_context (enforced by the factory)
            ctx_p, _ = patient_value_context(
                self.embeddings[LAB](
                    jnp.arange(dict(self.node_counts)[LAB], dtype=jnp.int32)
                ),
                graph.edges[PATIENT_LAB],
                self.axis_name,
            )
            u_r = (ctx_p @ self.bilinear_u)[patient_indices]
        return jnp.sum(u_r * c_r, axis=-1)

    def predict_lab_values(
        self,
        graph: HeteroGraph,
        patient_indices: jax.Array,
        lab_indices: jax.Array,
        train: bool = False,
        patient_plan=None,  # accepted for Trainer interface parity; unused
        lab_plan=None,
        degrees=None,  # HGT has no degree gate; accepted for interface parity
    ) -> jax.Array:
        x_dict = self(graph, train=train)
        pair = jnp.concatenate(
            [x_dict[PATIENT][patient_indices], x_dict[LAB][lab_indices]], axis=-1
        )
        pred = self.edge_predictor(pair, train=train)[..., 0]
        bl = self._bilinear_term(graph, patient_indices, lab_indices)
        return pred if bl is None else pred + bl

    # -- serving (cached node state) — see HeteroRGCN.compute_node_state -----

    def compute_node_state(self, graph: HeteroGraph):
        if graph.patient_id_base is not None:
            raise ValueError(
                "serving state must be computed on the FULL graph, not a "
                "mini-batch cluster subgraph (patient_id_base is set)"
            )
        x_dict = self(graph, train=False)
        state = {"final_p": x_dict[PATIENT], "final_l": x_dict[LAB]}
        if self.bilinear_rank > 0 and self.bilinear_source in ("embedding", "context"):
            counts = dict(self.node_counts)
            lab_ids = jnp.arange(counts[LAB], dtype=jnp.int32)
            c = self.embeddings[LAB](lab_ids)
            if self.bilinear_source == "embedding":
                pat_ids = jnp.arange(counts[PATIENT], dtype=jnp.int32)
                u = self.embeddings[PATIENT](pat_ids)
            else:  # "context"
                u, _ = patient_value_context(
                    c, graph.edges[PATIENT_LAB], self.axis_name
                )
            state["bl_u"] = u @ self.bilinear_u
            state["bl_l"] = c @ self.bilinear_l
        return state

    def predict_pairs_cached(self, state, patient_indices, lab_indices):
        pair = jnp.concatenate(
            [state["final_p"][patient_indices], state["final_l"][lab_indices]], axis=-1
        )
        pred = self.edge_predictor(pair, train=False)[..., 0]
        if "bl_u" in state:
            pred = pred + jnp.sum(
                state["bl_u"][patient_indices] * state["bl_l"][lab_indices], axis=-1
            )
        return pred
