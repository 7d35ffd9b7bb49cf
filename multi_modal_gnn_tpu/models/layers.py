"""Shared building blocks: initializers, MLP head, activations."""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — the torch.nn.Linear default, used
    so training dynamics track the reference closely."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype=jnp.float32))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_kernel_init_fan(fan_in: int) -> Callable:
    """Kernel init with an explicit fan-in (for factored layers that split a
    wider linear into parallel blocks but must keep the original init scale)."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype=jnp.float32))
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_linear_bias_init(fan_in: int) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype=jnp.float32))
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def make_dense(
    features: int,
    in_features: int,
    use_bias: bool = True,
    dtype=None,
    name=None,
    fan_in_override: int | None = None,
):
    fan = fan_in_override or in_features
    return nn.Dense(
        features=features,
        use_bias=use_bias,
        kernel_init=(
            torch_linear_kernel_init_fan(fan) if fan_in_override else torch_linear_kernel_init
        ),
        bias_init=torch_linear_bias_init(fan),
        dtype=dtype,
        name=name,
    )


ACTIVATIONS: dict[str, Callable] = {
    "relu": nn.relu,
    "elu": nn.elu,
    "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.01),
}


def get_activation(name: str) -> Callable:
    try:
        return ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"Unknown activation: {name}") from None


class EdgeRegressionHead(nn.Module):
    """MLP mapping concatenated [h_patient; h_lab] to a scalar lab value.

    Mirrors the reference head (src/model.py:342-396): per hidden layer
    Linear -> ReLU -> Dropout, then a final Linear to ``output_dim``.

    ``bilinear_rank > 0`` (beyond-reference, opt-in via
    model.edge_head.extras.bilinear_rank) adds a learned low-rank bilinear
    term ``<A h_p, B h_l>`` to the MLP output.  Rationale: the imputation
    signal is collaborative-filtering-shaped (value ~ <u_patient, w_lab>),
    a *multiplicative* interaction that ReLU MLPs over concatenated inputs
    approximate poorly — the reference's own pure-MLP iteration 2 scored
    R^2 = 0.029 (BASELINE.md) and our conditional-ceiling analysis on the
    synthetic cohort shows the MLP head recovering a fraction of what a
    bilinear model (ALS) reaches.  One rank-r product term closes that gap
    while keeping the MLP for additive structure.
    """

    input_dim: int
    hidden_dims: Sequence[int] = (64, 32)
    output_dim: int = 1
    dropout: float = 0.2
    dtype: jnp.dtype | None = None
    bilinear_rank: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pair = x
        prev = self.input_dim
        for i, h in enumerate(self.hidden_dims):
            x = make_dense(h, prev, dtype=self.dtype, name=f"dense_{i}")(x)
            x = nn.relu(x)
            # Separate rng stream: head dropout acts on *edge-batch* rows,
            # which are sharded under data parallelism — the caller folds the
            # mesh position into this stream so shards draw independent masks
            # (node-level dropout stays on the shared 'dropout' stream since
            # node arrays are replicated).
            x = nn.Dropout(
                rate=self.dropout, deterministic=not train, rng_collection="edge_dropout"
            )(x)
            prev = h
        out = make_dense(self.output_dim, prev, dtype=self.dtype, name="dense_out")(x)
        if self.bilinear_rank > 0:
            d = self.input_dim // 2
            u, c = pair[..., :d], pair[..., d:]
            scale = nn.initializers.normal(stddev=1.0 / jnp.sqrt(d))
            a = self.param("bilinear_u", scale, (d, self.bilinear_rank))
            b = self.param("bilinear_l", scale, (d, self.bilinear_rank))
            term = jnp.sum((u @ a) * (c @ b), axis=-1, keepdims=True)
            out = out + term.astype(out.dtype)
        return out


class FactoredEdgeHead(nn.Module):
    """Edge head whose first layer is factored into node-level projections.

    Mathematically identical to :class:`EdgeRegressionHead` on
    ``concat([x_p[p_idx], x_l[l_idx]])`` — a linear over a concat is the sum
    of two linears — but the first-layer matmul runs at NODE count instead of
    EDGE count (53x fewer FLOPs at 3.5M pairs / 100k patients) and the
    per-pair gather moves ``hidden_dims[0]``-wide rows instead of two
    ``node_dim``-wide ones.  Same parameter count; init scale preserved via
    fan-in override.
    """

    node_dim: int
    hidden_dims: Sequence[int] = (64, 32)
    output_dim: int = 1
    dropout: float = 0.2
    dtype: jnp.dtype | None = None
    bilinear_rank: int = 0  # see EdgeRegressionHead.bilinear_rank

    @nn.compact
    def __call__(
        self,
        x_p_nodes: jax.Array,  # [num_patients, node_dim]
        x_l_nodes: jax.Array,  # [num_labs, node_dim]
        p_idx: jax.Array,  # [B]
        l_idx: jax.Array,  # [B]
        train: bool = False,
        patient_plan=None,  # GatherPlan — batch-gather backward on the MXU
        lab_plan=None,
        tile_mask=None,  # int32[num_tiles] degree-predication (fused path only)
        project_only: bool = False,  # return (proj_p, proj_l, w1, b1, w2, b2, seed)
    ) -> jax.Array:
        # with plans, the row-gather backwards (scatter-adds of B pair
        # gradients into the node matrices — the dominant head cost at the
        # 3.5M-pair scale, 24 ms each by device trace; PERFORMANCE.md) run
        # the windowed segment kernel instead of XLA scatters
        if patient_plan is not None or lab_plan is not None:
            from multi_modal_gnn_tpu.ops.pallas_segment import take_with_plan

            take_p = lambda x: take_with_plan(x, p_idx, patient_plan)  # noqa: E731
            take_l = lambda x: take_with_plan(x, l_idx, lab_plan)  # noqa: E731
        else:
            take_p = lambda x: x[p_idx]  # noqa: E731
            take_l = lambda x: x[l_idx]  # noqa: E731
        h0 = self.hidden_dims[0]
        fan = 2 * self.node_dim  # the concat layer's fan-in
        proj_p = make_dense(
            h0, self.node_dim, dtype=self.dtype, name="proj_patient", fan_in_override=fan
        )(x_p_nodes)
        proj_l = make_dense(
            h0, self.node_dim, use_bias=False, dtype=self.dtype, name="proj_lab",
            fan_in_override=fan,
        )(x_l_nodes)

        if project_only:
            # dual-head fusion (HeteroRGCN.predict_lab_values): hand the
            # caller this head's node projections + MLP params + dropout
            # seed so both heads run in ONE fused_pair_head_dual call.
            # Same param tree as every other path (names match).
            return (proj_p, proj_l) + self._mlp_pieces(train)

        # fused pair-head kernel: with a slot-major batch (identity patient
        # plan) and the reference's 2-hidden-layer head, the whole MLP runs
        # in VMEM tiles — no B x H0 HBM intermediate exists, forward or
        # backward (ops/pallas_pairhead.py).  The init pass runs the unfused
        # path so the param tree is identical either way.
        import jax as _jax

        use_fused = (
            patient_plan is not None
            and getattr(patient_plan, "identity", False)
            and len(self.hidden_dims) == 2
            and self.output_dim == 1
            and not self.is_initializing()
            # the in-kernel dropout PRNG only lowers on real TPU; interpret
            # mode (CPU tests) runs fused only when dropout is inactive
            and (not train or self.dropout == 0.0 or _jax.default_backend() == "tpu")
        )
        if use_fused:
            out = self._fused_mlp(proj_p, proj_l, l_idx, patient_plan, train, tile_mask)
            if self.bilinear_rank > 0:
                d = self.node_dim
                scale = nn.initializers.normal(stddev=1.0 / jnp.sqrt(d))
                a = self.param("bilinear_u", scale, (d, self.bilinear_rank))
                b = self.param("bilinear_l", scale, (d, self.bilinear_rank))
                term = jnp.sum(
                    take_p(x_p_nodes @ a) * take_l(x_l_nodes @ b),
                    axis=-1, keepdims=True,
                )
                out = out + term.astype(out.dtype)
            return out

        x = nn.relu(take_p(proj_p) + take_l(proj_l))
        x = nn.Dropout(
            rate=self.dropout, deterministic=not train, rng_collection="edge_dropout"
        )(x)
        prev = h0
        for i, h in enumerate(self.hidden_dims[1:], start=1):
            x = make_dense(h, prev, dtype=self.dtype, name=f"dense_{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(
                rate=self.dropout, deterministic=not train, rng_collection="edge_dropout"
            )(x)
            prev = h
        out = make_dense(self.output_dim, prev, dtype=self.dtype, name="dense_out")(x)
        if self.bilinear_rank > 0:
            # node-level projections, gathered narrow — same factoring win
            d = self.node_dim
            scale = nn.initializers.normal(stddev=1.0 / jnp.sqrt(d))
            a = self.param("bilinear_u", scale, (d, self.bilinear_rank))
            b = self.param("bilinear_l", scale, (d, self.bilinear_rank))
            term = jnp.sum(
                take_p(x_p_nodes @ a) * take_l(x_l_nodes @ b), axis=-1, keepdims=True
            )
            out = out + term.astype(out.dtype)
        return out

    def _mlp_pieces(self, train: bool):
        """(w1, b1, w2, b2, seed) for the fused kernels, read from the
        modules the unfused init pass created — same param tree.  Compute
        dtype on w1 (the big matmul operand); biases / w2 / b2 stay f32:
        they join f32 accumulators in-kernel, and Mosaic only supports
        32-bit scalar extracts (b2[0, 0])."""
        import jax as _jax

        d1 = make_dense(
            self.hidden_dims[1], self.hidden_dims[0], dtype=self.dtype, name="dense_1"
        )
        dout = make_dense(
            self.output_dim, self.hidden_dims[1], dtype=self.dtype, name="dense_out"
        )
        dt = self.dtype or jnp.float32
        w1 = d1.variables["params"]["kernel"].astype(dt)
        b1 = d1.variables["params"]["bias"].astype(jnp.float32)
        w2 = dout.variables["params"]["kernel"][:, 0].astype(jnp.float32)
        b2 = dout.variables["params"]["bias"][0].astype(jnp.float32)
        rate = float(self.dropout) if train else 0.0
        if rate > 0.0:
            seed = _jax.random.key_data(self.make_rng("edge_dropout")).astype(
                jnp.uint32
            ).reshape(-1)[:2]
        else:
            seed = jnp.zeros(2, jnp.uint32)
        return w1, b1, w2, b2, seed

    def _fused_mlp(
        self, proj_p, proj_l, l_idx, plan, train: bool, tile_mask=None
    ) -> jax.Array:
        """Run dense_1 + dense_out through the fused pair kernel."""
        import jax as _jax

        from multi_modal_gnn_tpu.ops.pallas_pairhead import fused_pair_head

        w1, b1, w2, b2, seed = self._mlp_pieces(train)
        w1 = w1.astype(proj_p.dtype)
        rate = float(self.dropout) if train else 0.0
        out = fused_pair_head(
            proj_p, proj_l, w1, b1, w2, b2,
            l_idx, plan.win_local, plan.win_tile_map, seed, tile_mask,
            getattr(plan, "lab_block_map", None),
            plan.num_windows, rate,
            _jax.default_backend() != "tpu",
            getattr(plan, "lab_block_rows", 0),
            getattr(plan, "lab_span_mode", False),
        )
        return out[:, None]


class PatientEncoder(nn.Module):
    """3-layer MLP over patient ID-embeddings followed by L2 normalization
    (reference: src/model.py:93-105, 229-232)."""

    hidden_dim: int = 128
    dropout: float = 0.2
    use_batch_norm: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(2):
            x = make_dense(self.hidden_dim, self.hidden_dim, dtype=self.dtype, name=f"dense_{i}")(x)
            if self.use_batch_norm:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    name=f"bn_{i}",
                )(x)
            x = nn.relu(x)
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        x = make_dense(self.hidden_dim, self.hidden_dim, dtype=self.dtype, name="dense_out")(x)
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.maximum(norm, 1e-12)
