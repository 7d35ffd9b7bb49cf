"""Regression losses and lab-wise inverse-variance reweighting.

Reference semantics reproduced exactly:
  * per-sample mae/mse/huber (src/model.py:579-612);
  * supervision-masked, lab-weighted mean over the supervised subset
    (src/train.py:364-386);
  * lab weights = 1 / (Var(lab) + 1e-6), unbiased variance over train-split
    values, default variance 1.0 for labs with < 2 samples, normalized so the
    mean weight is 1 (src/train.py:295-330).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def per_sample_loss(predictions: jax.Array, targets: jax.Array, loss_type: str) -> jax.Array:
    err = predictions - targets
    if loss_type == "mae":
        return jnp.abs(err)
    if loss_type == "mse":
        return err * err
    if loss_type == "huber":  # delta = 1.0, matching torch F.huber_loss default
        abs_err = jnp.abs(err)
        return jnp.where(abs_err <= 1.0, 0.5 * err * err, abs_err - 0.5)
    raise ValueError(f"Unknown loss type: {loss_type}")


def weighted_regression_loss(
    predictions: jax.Array,
    targets: jax.Array,
    sample_weights: jax.Array,
    supervision_mask: jax.Array,
    loss_type: str = "mae",
    axis_name: str | None = None,
) -> jax.Array:
    """Masked weighted mean: sum(loss * w * m) / sum(m).

    ``supervision_mask`` is a float mask combining the per-epoch Bernoulli
    supervision draw with the padding validity mask; the denominator counts
    supervised edges only, matching the reference's ``.mean()`` over the
    supervised subset.  Under shard_map data parallelism (``axis_name`` set,
    edges sharded) numerator and denominator psum over the mesh, so the loss
    — and therefore the gradients — are identical to the single-device run.
    """
    losses = per_sample_loss(predictions, targets, loss_type)
    num = (losses * sample_weights * supervision_mask).sum()
    den = supervision_mask.sum()
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / jnp.maximum(den, 1.0)


def masked_mean_loss(
    predictions: jax.Array,
    targets: jax.Array,
    valid_mask: jax.Array,
    loss_type: str = "mae",
    axis_name: str | None = None,
) -> jax.Array:
    """Unweighted masked mean (validation/test loss, src/train.py:394-431)."""
    losses = per_sample_loss(predictions, targets, loss_type)
    num = (losses * valid_mask).sum()
    den = valid_mask.sum()
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / jnp.maximum(den, 1.0)


def compute_regression_loss(
    predictions: jax.Array, targets: jax.Array, loss_type: str = "mae"
) -> jax.Array:
    """Scalar mean regression loss — API parity with the reference helper
    (src/model.py:579-612)."""
    return per_sample_loss(predictions, targets, loss_type).mean()


def compute_lab_weights(
    train_values: np.ndarray, train_lab_indices: np.ndarray, num_labs: int
) -> np.ndarray:
    """Inverse-variance lab weights from the train split (host-side, once)."""
    variances = np.ones(num_labs, dtype=np.float64)
    for lab_idx in range(num_labs):
        vals = train_values[train_lab_indices == lab_idx]
        if len(vals) > 1:
            variances[lab_idx] = vals.var(ddof=1)  # torch .var() is unbiased
    weights = 1.0 / (variances + 1e-6)
    weights = weights * num_labs / weights.sum()
    return weights.astype(np.float32)
