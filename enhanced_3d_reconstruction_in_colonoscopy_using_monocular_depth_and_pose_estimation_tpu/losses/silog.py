"""Scale-invariant logarithmic (SiLog) depth loss.

Reference: ``SiLogLoss`` in ``/root/reference/lightning_model.py:20-46``:

    d = log(target[mask]) - log(pred[mask])
    loss = sqrt(mean(d^2) - lambda * mean(d)^2)

The reference indexes with a boolean mask (dynamic shape). On TPU that would
force recompilation / host sync, so this implementation uses masked means
with static shapes — numerically identical for any mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _masked_mean(x: Array, mask: Array, eps: float = 1e-12) -> Array:
    denom = jnp.maximum(jnp.sum(mask), eps)
    return jnp.sum(x * mask) / denom


def silog_loss(pred: Array, target: Array, valid_mask: Array,
               lambd: float = 0.5, eps: float = 1e-12) -> Array:
    """SiLog loss over valid pixels.

    Args:
        pred: predicted depth, any shape, strictly positive on valid pixels.
        target: ground-truth depth, same shape.
        valid_mask: boolean/float mask of pixels to include.
        lambd: variance-focus weight (reference default 0.5).

    Returns:
        scalar loss (f32).
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mask = valid_mask.astype(jnp.float32)
    # Keep log() finite on masked-out pixels; they carry zero weight.
    safe_pred = jnp.where(mask > 0, pred, 1.0)
    safe_target = jnp.where(mask > 0, target, 1.0)
    diff_log = jnp.log(safe_target) - jnp.log(safe_pred)
    mean_sq = _masked_mean(diff_log * diff_log, mask, eps)
    mean = _masked_mean(diff_log, mask, eps)
    var_focus = mean_sq - lambd * mean * mean
    return jnp.sqrt(jnp.maximum(var_focus, eps))
