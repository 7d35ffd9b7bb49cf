"""Heterogeneous relational GNN (the production architecture).

Capability-parity with the reference ``HeteroRGCN`` (src/model.py:33-335),
re-designed for XLA:

  * ID-embedding tables per node type (Xavier-uniform), patient embeddings
    passed through a 3-layer MLP + L2 norm;
  * ``num_layers`` x [per-relation SAGE(mean) -> sum over relations ->
    per-type BatchNorm -> activation -> dropout(between layers)];
  * dual edge-regression heads gated on patient lab-degree — computed as a
    masked ``jnp.where`` over both branches (no boolean indexing / dynamic
    shapes), so the whole prediction is one fused jitted graph;
  * message passing is gather + sorted segment reduction (ops/segment.py),
    optionally the fused Pallas kernel.

All shapes are static: node counts and the relation list are module fields
(part of the jit cache key), and embedding tables are sized at construction —
the reference's lazy ``_init_embeddings`` dance (src/model.py:180-204,
evaluate.py:629) disappears.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multi_modal_gnn_tpu.graph.hetero import TILE_E, HeteroGraph
from multi_modal_gnn_tpu.graph.schema import EdgeTypeKey, PATIENT, LAB, PATIENT_LAB
from multi_modal_gnn_tpu.models.context import (
    inject_value_context,
    patient_value_context,
)
from multi_modal_gnn_tpu.models.layers import (
    EdgeRegressionHead,
    FactoredEdgeHead,
    PatientEncoder,
    get_activation,
    make_dense,
)
from multi_modal_gnn_tpu.ops.segment import aggregate_neighbors


def _et_key(et: EdgeTypeKey) -> str:
    return "__".join(et)


class HeteroSAGELayer(nn.Module):
    """One layer of per-relation SAGE convolutions summed per destination.

    Per relation r (PyG SAGEConv semantics, reference src/model.py:116-131):
        out_r[dst] = W_neigh_r @ agg_{src in N_r(dst)} x[src] + W_root_r @ x[dst] + b_r
    and destinations receiving multiple relations sum their outputs
    (HeteroConv aggr='sum').
    """

    edge_types: Tuple[EdgeTypeKey, ...]
    node_types: Tuple[str, ...]
    hidden_dim: int
    aggregation: str = "mean"
    impl: str = "xla"
    axis_name: str | None = None  # mesh axis edges are sharded over (SPMD)
    dtype: jnp.dtype | None = None

    def setup(self):
        lin_neigh = {}
        lin_root = {}
        for et in self.edge_types:
            key = _et_key(et)
            lin_neigh[key] = make_dense(
                self.hidden_dim, self.hidden_dim, use_bias=True, dtype=self.dtype,
                name=f"neigh_{key}",
            )
            lin_root[key] = make_dense(
                self.hidden_dim, self.hidden_dim, use_bias=False, dtype=self.dtype,
                name=f"root_{key}",
            )
        self.lin_neigh = lin_neigh
        self.lin_root = lin_root

    def __call__(self, x_dict: Dict[str, jax.Array], graph: HeteroGraph) -> Dict[str, jax.Array]:
        from multi_modal_gnn_tpu.graph.schema import mirror_edge_type

        # group relations by destination: the HeteroConv sum
        #   out[dst] = sum_r (msg_r @ W_r + b_r) + x_dst @ W_root_r ...
        # is ONE matmul per destination type on the concatenated messages,
        #   out[dst] = [msg_1 .. msg_k, x_dst*k?] — see below — which cuts
        # the per-layer op count from 2k matmuls + k adds to k aggregations
        # + 1 concat + 1 matmul (kernels concatenated along the K axis; the
        # MXU prefers one K=(k+1)*D contraction over k+1 small ones).
        by_dst: Dict[str, list] = {}
        for et in self.edge_types:
            by_dst.setdefault(et[2], []).append(et)

        out: Dict[str, jax.Array] = {}
        for dst_t, ets in by_dst.items():
            parts = []
            kernels = []
            bias = None
            root_kernel = None
            for et in ets:
                src_t = et[0]
                key = _et_key(et)
                x_in = x_dict[src_t]
                if self.dtype is not None:
                    x_in = x_in.astype(self.dtype)  # bf16 halves gather
                    # traffic; the Pallas indicator matmuls run 4x faster
                msg = aggregate_neighbors(
                    x_in,
                    graph.edges[et],
                    self.aggregation,
                    impl=self.impl,
                    axis_name=self.axis_name,
                    # the mirrored relation's windowed plan drives the
                    # backward scatter on the MXU too (ops/pallas_segment.py)
                    edges_rev=graph.edges.get(mirror_edge_type(et)),
                )
                parts.append(msg)
                neigh, root = self.lin_neigh[key], self.lin_root[key]
                if self.is_initializing():
                    # flax creates Dense params inside __call__; touch each
                    # once so the param tree keeps the per-relation layout
                    neigh(msg[:1])
                    root(x_dict[dst_t][:1])
                kernels.append(neigh.variables["params"]["kernel"])
                b = neigh.variables["params"]["bias"]
                bias = b if bias is None else bias + b
                rk = root.variables["params"]["kernel"]
                root_kernel = rk if root_kernel is None else root_kernel + rk
            # the k root transforms fold into one summed kernel:
            #   sum_r x_dst @ W_root_r = x_dst @ (sum_r W_root_r)
            kernels.append(root_kernel)
            parts.append(
                x_dict[dst_t] if self.dtype is None else x_dict[dst_t].astype(self.dtype)
            )
            w_cat = jnp.concatenate(kernels, axis=0)
            x_cat = jnp.concatenate(parts, axis=-1)
            if self.dtype is not None:
                w_cat = w_cat.astype(self.dtype)
            out[dst_t] = jnp.dot(x_cat, w_cat) + bias.astype(x_cat.dtype)
        # node types receiving no relation in this layer (possible with
        # bidirectional=false configs) pass through unchanged, so later
        # layers / heads can still read them (same carry-through as HGTLayer)
        for nt in self.node_types:
            if nt in x_dict:
                out.setdefault(nt, x_dict[nt])
        return out


class HeteroRGCN(nn.Module):
    node_counts: Tuple[Tuple[str, int], ...]
    edge_types: Tuple[EdgeTypeKey, ...]
    hidden_dim: int = 128
    num_layers: int = 2
    dropout: float = 0.2
    activation: str = "relu"
    use_batch_norm: bool = True
    aggregation: str = "mean"
    head_hidden_dims: Tuple[int, ...] = (64, 32)
    degree_threshold: int = 6
    impl: str = "xla"
    axis_name: str | None = None  # set under shard_map data parallelism
    # "concat" applies the head MLP to concatenated pair embeddings (fewer
    # ops — wins on small graphs); "factored" projects per NODE first and
    # gathers the narrow projections (53x fewer first-layer FLOPs — wins at
    # scale).  Mathematically identical; models/factory.py picks by size.
    head_style: str = "concat"
    # beyond-reference opt-in: low-rank bilinear term in both heads
    # (models/layers.py EdgeRegressionHead.bilinear_rank rationale)
    bilinear_rank: int = 0
    # where the bilinear term reads from: "head" applies <A h_p, B h_l> to
    # each head's own (pre/post-GNN, MLP'd/normalized) inputs; "embedding"
    # applies ONE shared term to the RAW ID-embedding tables — exactly the
    # ALS matrix-factorization parametrization (evaluation/baselines.py),
    # whose factors the per-entity ridge (optimizer.embedding_weight_decay)
    # shrinks the way ALS's reg does.  The L2-normalized patient encoder and
    # ReLU'd post-GNN features cannot express the per-patient magnitude
    # shrinkage the Bayes-optimal predictor needs (evaluation/ceiling.py);
    # raw embeddings can.
    bilinear_source: str = "head"
    # dual-head kernel fusion (ops/pallas_pairhead.fused_pair_head_dual):
    # "auto" fuses both heads into one kernel call ONLY when degree
    # predication is unavailable (no per-tile masks) — with degree-clustered
    # patient windows the two heads' active-tile sets are nearly disjoint,
    # and predicated single-head calls measured FASTER than the fused call
    # (scale config: 49.8 vs 52.2 ms/epoch; PERFORMANCE.md "Dual-head
    # fusion").  "on" forces fusion (wins when the masks overlap heavily,
    # e.g. unsorted windows or thresholds that mix within tiles); "off"
    # never fuses.
    dual_head_fusion: str = "auto"
    # beyond-reference opt-in (model.extras.value_context): condition on the
    # OBSERVED patient-lab values.  The reference's SAGEConv ignores
    # edge_attr entirely (src/model.py:116-131 — lab values ride the graph
    # as edge_attr but never enter a message), so its information channel is
    # purely supervised matrix factorization; the Bayes-optimal predictor
    # for a masked lab, however, conditions on the patient's *other observed
    # values* (evaluation/ceiling.py).  This adds one value-weighted
    # aggregation per side before layer 0:
    #     ctx[p] = mean_{visible e: p->l} val_e * x[l],   (+ visible count)
    #     ctx[l] = mean_{visible e: p->l} val_e * x[p],   (+ visible count)
    # projected and added to the node features.  Visibility (EdgeSet.val_vis,
    # set by the trainer) excludes supervised/val/test edges, so the channel
    # is leakage-free under the mask-and-recover protocol.
    value_context: bool = False
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
        self.patient_encoder = PatientEncoder(
            hidden_dim=self.hidden_dim,
            dropout=self.dropout,
            use_batch_norm=self.use_batch_norm,
            dtype=self.dtype,
            name="patient_encoder",
        )
        self.convs = [
            HeteroSAGELayer(
                edge_types=self.edge_types,
                node_types=self.node_types,
                hidden_dim=self.hidden_dim,
                aggregation=self.aggregation,
                impl=self.impl,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=f"conv_{i}",
            )
            for i in range(self.num_layers)
        ]
        if self.use_batch_norm:
            self.batch_norms = [
                {
                    nt: nn.BatchNorm(
                        use_running_average=None,
                        momentum=0.9,
                        epsilon=1e-5,
                        name=f"bn_{i}_{nt}",
                    )
                    for nt in self.node_types
                }
                for i in range(self.num_layers)
            ]
        head_rank = self.bilinear_rank if self.bilinear_source == "head" else 0
        if self.head_style == "factored":
            head_cls = lambda name: FactoredEdgeHead(  # noqa: E731
                node_dim=self.hidden_dim,
                hidden_dims=self.head_hidden_dims,
                dropout=self.dropout,
                dtype=self.dtype,
                bilinear_rank=head_rank,
                name=name,
            )
        else:
            head_cls = lambda name: EdgeRegressionHead(  # noqa: E731
                input_dim=2 * self.hidden_dim,
                hidden_dims=self.head_hidden_dims,
                dropout=self.dropout,
                dtype=self.dtype,
                bilinear_rank=head_rank,
                name=name,
            )
        self.edge_predictor = head_cls("edge_predictor")
        self.tabular_mlp = head_cls("tabular_mlp")
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
        self.inter_layer_dropout = nn.Dropout(rate=self.dropout)

    def encode_nodes(
        self, train: bool = False, graph: HeteroGraph | None = None
    ) -> Dict[str, jax.Array]:
        """Initial (pre-GNN) embeddings; patient table goes through the MLP.

        With a cluster subgraph (``graph.patient_id_base`` set,
        training/minibatch.py) the patient lookup reads the LOCAL window
        ``[base, base + local_count)`` of the global embedding table, so one
        table (and one optimizer state) serves every cluster; pad patients
        past the global count clamp to the last row (edge-free, loss-masked).
        """
        counts = dict(self.node_counts)
        x_dict = {}
        for nt in self.node_types:
            n = counts[nt]
            idx = None
            if nt == PATIENT and graph is not None and graph.patient_id_base is not None:
                n_local = graph.num_nodes(PATIENT)
                idx = jnp.minimum(
                    jnp.arange(n_local, dtype=jnp.int32) + graph.patient_id_base,
                    counts[PATIENT] - 1,
                )
            if idx is None:
                idx = jnp.arange(n, dtype=jnp.int32)
            x_dict[nt] = self.embeddings[nt](idx)
        if PATIENT in x_dict:
            x_dict[PATIENT] = self.patient_encoder(x_dict[PATIENT], train=train)
        return x_dict

    def _inject_value_context(
        self, x_dict: Dict[str, jax.Array], graph: HeteroGraph
    ) -> Dict[str, jax.Array]:
        """Observed-value channel (shared impl: models/context.py)."""
        return inject_value_context(
            x_dict, graph, self.vctx_patient, self.vctx_lab, self.axis_name
        )

    def _patient_value_context(self, x_l: jax.Array, es) -> Tuple[jax.Array, jax.Array]:
        """Patient-side context statistic (shared impl: models/context.py)."""
        return patient_value_context(x_l, es, self.axis_name)

    def propagate(
        self, x_dict: Dict[str, jax.Array], graph: HeteroGraph, train: bool = False
    ) -> Dict[str, jax.Array]:
        act = get_activation(self.activation)
        if self.value_context:
            x_dict = self._inject_value_context(x_dict, graph)
        for layer_idx in range(self.num_layers):
            x_dict = self.convs[layer_idx](x_dict, graph)
            if self.use_batch_norm:
                x_dict = {
                    nt: self.batch_norms[layer_idx][nt](x, use_running_average=not train)
                    for nt, x in x_dict.items()
                }
            x_dict = {nt: act(x) for nt, x in x_dict.items()}
            if layer_idx < self.num_layers - 1:
                x_dict = {
                    nt: self.inter_layer_dropout(x, deterministic=not train)
                    for nt, x in x_dict.items()
                }
        return x_dict

    def __call__(self, graph: HeteroGraph, train: bool = False) -> Dict[str, jax.Array]:
        return self.propagate(self.encode_nodes(train=train, graph=graph), graph, train=train)

    def predict_lab_values(
        self,
        graph: HeteroGraph,
        patient_indices: jax.Array,
        lab_indices: jax.Array,
        train: bool = False,
        patient_plan=None,
        lab_plan=None,
        degrees: jax.Array | None = None,
    ) -> jax.Array:
        """Degree-gated dual-head prediction for (patient, lab) pairs.

        Both heads run on every pair and a ``jnp.where`` on the patient
        lab-degree picks the branch (reference routing: src/model.py:273-335,
        hard threshold src/model.py:178) — no dynamic shapes under jit.

        ``patient_plan`` / ``lab_plan`` (GatherPlan, optional): with the
        Pallas backend they move the batch-gather backward (a scatter-add
        into the node matrices) onto the MXU segment kernel.
        """
        initial = self.encode_nodes(train=train, graph=graph)
        final = self.propagate(initial, graph, train=train)

        if self.head_style == "factored":
            # per-node projections; the pair gather moves narrow rows.  The
            # plans move the B-pair scatter-add backwards onto the MXU
            # segment kernel (trace-measured as the dominant scale-epoch
            # cost; PERFORMANCE.md "Device trace")
            use_plans = self.impl == "pallas" and self.axis_name is None
            pp = patient_plan if use_plans else None
            lp = lab_plan if use_plans else None
            # degree-predicated head tiles: with a slot-major batch, a tile
            # whose real slots are ALL >= threshold never contributes its
            # tabular prediction (the gate below discards it), so the fused
            # kernel skips the whole tile; symmetrically, all-low tiles skip
            # the GNN head.  Exact by the gate; at the 5M-edge scale ~98.5%
            # of patients are high-degree and ~70% of tab-head tiles skip.
            tab_mask = gnn_mask = None
            if (
                pp is not None
                and getattr(pp, "identity", False)
                and degrees is not None
                and degrees.shape[0] % TILE_E == 0
            ):
                low_t = (degrees < self.degree_threshold).reshape(-1, TILE_E)
                tab_mask = jnp.any(low_t, axis=1).astype(jnp.int32)
                gnn_mask = jnp.any(~low_t, axis=1).astype(jnp.int32)
            # dual-head fusion: both heads share the slot layout / window
            # map / lab ids, so one fused_pair_head_dual call runs them with
            # shared one-hot gathers — at H0=64 the concatenated tables fill
            # the 128-wide MXU passes the single-head calls leave half-empty
            # (ops/pallas_pairhead.py "Dual-head fusion")
            import jax as _jax

            head_rank = self.bilinear_rank if self.bilinear_source == "head" else 0
            want_dual = self.dual_head_fusion == "on" or (
                self.dual_head_fusion == "auto" and tab_mask is None
            )
            use_dual = (
                want_dual
                and pp is not None
                and getattr(pp, "identity", False)
                and getattr(pp, "lab_block_rows", 0) in (0, None)
                and len(self.head_hidden_dims) == 2
                and head_rank == 0
                and not self.is_initializing()
                and (
                    not train
                    or self.dropout == 0.0
                    or _jax.default_backend() == "tpu"
                )
            )
            if use_dual:
                from multi_modal_gnn_tpu.ops.pallas_pairhead import (
                    fused_pair_head_dual,
                )

                pt_p, pt_l, w1_t, b1_t, w2_t, b2_t, seed_t = self.tabular_mlp(
                    initial[PATIENT], initial[LAB], patient_indices, lab_indices,
                    train=train, project_only=True,
                )
                pg_p, pg_l, w1_g, b1_g, w2_g, b2_g, seed_g = self.edge_predictor(
                    final[PATIENT], final[LAB], patient_indices, lab_indices,
                    train=train, project_only=True,
                )
                rate = float(self.dropout) if train else 0.0
                tab_pred, gnn_pred = fused_pair_head_dual(
                    pt_p, pt_l, w1_t, b1_t, w2_t, b2_t,
                    pg_p, pg_l, w1_g, b1_g, w2_g, b2_g,
                    lab_indices, pp.win_local, pp.win_tile_map,
                    jnp.concatenate([seed_t, seed_g]), tab_mask, gnn_mask,
                    pp.num_windows, rate,
                    _jax.default_backend() != "tpu",
                )
            else:
                tab_pred = self.tabular_mlp(
                    initial[PATIENT], initial[LAB], patient_indices, lab_indices,
                    train=train, patient_plan=pp, lab_plan=lp, tile_mask=tab_mask,
                )[..., 0]
                gnn_pred = self.edge_predictor(
                    final[PATIENT], final[LAB], patient_indices, lab_indices,
                    train=train, patient_plan=pp, lab_plan=lp, tile_mask=gnn_mask,
                )[..., 0]
        else:
            if self.impl == "pallas" and patient_plan is not None and self.axis_name is None:
                from multi_modal_gnn_tpu.ops.pallas_segment import take_with_plan

                take_p = lambda x: take_with_plan(x, patient_indices, patient_plan)  # noqa: E731
                take_l = lambda x: take_with_plan(x, lab_indices, lab_plan)  # noqa: E731
            else:
                take_p = lambda x: x[patient_indices]  # noqa: E731
                take_l = lambda x: x[lab_indices]  # noqa: E731
            pre = jnp.concatenate([take_p(initial[PATIENT]), take_l(initial[LAB])], axis=-1)
            post = jnp.concatenate([take_p(final[PATIENT]), take_l(final[LAB])], axis=-1)
            tab_pred = self.tabular_mlp(pre, train=train)[..., 0]
            gnn_pred = self.edge_predictor(post, train=train)[..., 0]

        if degrees is None:
            # per-pair gather; at 3.96M rows this is ~34 ms of latency-bound
            # random rows — callers on the hot path precompute it once
            # (SplitBatch.degrees) since it never changes across epochs
            degrees = graph.patient_lab_degree[patient_indices]
        pred = jnp.where(degrees < self.degree_threshold, tab_pred, gnn_pred)
        if self.bilinear_rank > 0 and self.bilinear_source == "embedding":
            # shared MF term over the raw ID tables (see bilinear_source doc).
            # patient_indices are graph-LOCAL; on a mini-batch cluster graph
            # the global table row is local + patient_id_base (encode_nodes
            # applies the same offset, with the same last-row clamp)
            p_glob = patient_indices
            if graph.patient_id_base is not None:
                p_glob = jnp.minimum(
                    patient_indices + graph.patient_id_base,
                    dict(self.node_counts)[PATIENT] - 1,
                )
            # project the TABLES first, then gather rank-wide rows: row-wise
            # identical to gathering 128-wide embeddings and projecting per
            # pair, but the per-pair activations shrink hidden_dim -> rank
            # (at 3.9M pairs that is ~2 GB -> ~0.25 GB per side, and the
            # backward scatters into the small projected table instead of
            # scattering 128-wide rows) — required headroom for long scan
            # chunks at MIMIC scale
            u_r = jnp.take(
                self.embeddings[PATIENT].embedding @ self.bilinear_u, p_glob, axis=0
            )
            c_r = jnp.take(
                self.embeddings[LAB].embedding @ self.bilinear_l, lab_indices, axis=0
            )
            pred = pred + jnp.sum(u_r * c_r, axis=-1)
        elif self.bilinear_rank > 0 and self.bilinear_source == "context":
            # conditional bilinear readout — the differentiable replica of
            # the Bayes form y(p,l) = w_l^T M (sum_obs val * w_lab)
            # (evaluation/ceiling.py): u = the patient's value-weighted mean
            # of RAW lab embeddings over this step's visible observations,
            # c = the target lab's raw embedding; the shared table ties the
            # conditioning basis to the readout basis.  Requires
            # value_context (the trainer's val_vis gating) — enforced by
            # models/factory.py — so the channel never sees val/test values.
            ctx_p, _ = self._patient_value_context(
                initial[LAB], graph.edges[PATIENT_LAB]
            )
            u_r = (ctx_p @ self.bilinear_u)[patient_indices]
            c_r = jnp.take(
                self.embeddings[LAB].embedding @ self.bilinear_l, lab_indices, axis=0
            )
            pred = pred + jnp.sum(u_r * c_r, axis=-1)
        return pred

    # -- serving (cached node state) -----------------------------------------
    # Every prediction channel above is node-factorable: the heads consume
    # per-node vectors, the gate consumes per-patient degrees, and both
    # bilinear variants reduce to <bl_u[p], bl_l[l]> of node-level factor
    # rows.  For a frozen (params, graph) pair the node state is constant,
    # so serving computes it ONCE and per-request cost is two tiny MLPs on
    # the batch — no per-request GNN propagation.  Exactness vs
    # predict_lab_values(train=False) is pinned in tests/test_serving.py.
    # No reference analogue (its inference re-runs the full GNN per call,
    # src/inference.py:92-159).

    def compute_node_state(self, graph: HeteroGraph) -> Dict[str, jax.Array]:
        """Everything predict_pairs_cached needs, computed from one eval-mode
        forward over the full graph (value_context rides the graph's
        ``val_vis`` exactly as in the trainer's eval step)."""
        if graph.patient_id_base is not None:
            raise ValueError(
                "serving state must be computed on the FULL graph, not a "
                "mini-batch cluster subgraph (patient_id_base is set)"
            )
        initial = self.encode_nodes(train=False, graph=graph)
        final = self.propagate(initial, graph, train=False)
        state = {
            "init_p": initial[PATIENT],
            "init_l": initial[LAB],
            "final_p": final[PATIENT],
            "final_l": final[LAB],
            "degree": graph.patient_lab_degree,
        }
        # bilinear_source == "head" needs no extra state: its rank is folded
        # into the FactoredEdgeHead modules themselves (setup, head_rank),
        # which predict_pairs_cached calls with the node tables
        if self.bilinear_rank > 0 and self.bilinear_source in ("embedding", "context"):
            counts = dict(self.node_counts)  # static (name, count) pairs
            lab_ids = jnp.arange(counts[LAB], dtype=jnp.int32)
            c = self.embeddings[LAB](lab_ids)
            if self.bilinear_source == "embedding":
                pat_ids = jnp.arange(counts[PATIENT], dtype=jnp.int32)
                u = self.embeddings[PATIENT](pat_ids)
            else:  # "context"
                u, _ = self._patient_value_context(c, graph.edges[PATIENT_LAB])
            state["bl_u"] = u @ self.bilinear_u
            state["bl_l"] = c @ self.bilinear_l
        return state

    def predict_pairs_cached(
        self,
        state: Dict[str, jax.Array],
        patient_indices: jax.Array,
        lab_indices: jax.Array,
    ) -> jax.Array:
        """predict_lab_values(train=False) from a compute_node_state dict —
        the serving fast path (no graph, no propagation, no plans)."""
        if self.head_style == "factored":
            tab_pred = self.tabular_mlp(
                state["init_p"], state["init_l"], patient_indices, lab_indices,
                train=False,
            )[..., 0]
            gnn_pred = self.edge_predictor(
                state["final_p"], state["final_l"], patient_indices, lab_indices,
                train=False,
            )[..., 0]
        else:
            pre = jnp.concatenate(
                [state["init_p"][patient_indices], state["init_l"][lab_indices]], axis=-1
            )
            post = jnp.concatenate(
                [state["final_p"][patient_indices], state["final_l"][lab_indices]], axis=-1
            )
            tab_pred = self.tabular_mlp(pre, train=False)[..., 0]
            gnn_pred = self.edge_predictor(post, train=False)[..., 0]
        degrees = state["degree"][patient_indices]
        pred = jnp.where(degrees < self.degree_threshold, tab_pred, gnn_pred)
        if "bl_u" in state:
            pred = pred + jnp.sum(
                state["bl_u"][patient_indices] * state["bl_l"][lab_indices], axis=-1
            )
        return pred
