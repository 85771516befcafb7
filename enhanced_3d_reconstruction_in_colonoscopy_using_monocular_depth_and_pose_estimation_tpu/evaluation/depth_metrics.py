"""Depth-estimation evaluation metrics (D1, AbsRel, RMSE, L1).

Reference: ``compute_errors`` in ``/root/reference/eval/evaluation.py:16-60``.
The reference operates on boolean-mask-indexed flat tensors; here the metrics
take an explicit mask so shapes stay static under ``jit`` (TPU-friendly), with
identical results.

Definitions (over valid pixels):
    l1      = mean(|pred - gt|)
    abs_rel = mean(|pred - gt| / (gt + 1e-6))
    rmse    = sqrt(mean((pred - gt)^2))
    d1      = mean(max(gt/pred, pred/gt) < 1.1)     # delta < 1.1 (10%)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

DEPTH_METRIC_NAMES = ("d1", "abs_rel", "rmse", "l1")


def _masked_mean(x: Array, mask: Array, eps: float = 1e-12) -> Array:
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), eps)


def compute_depth_errors(pred: Array, gt: Array,
                         valid_mask: Array | None = None) -> dict[str, Array]:
    """Compute D1/AbsRel/RMSE/L1 over valid pixels.

    Args:
        pred: predicted depth (any shape).
        gt: ground-truth depth (same shape).
        valid_mask: optional boolean mask; all pixels valid if None.

    Returns:
        dict of scalar f32 metrics.
    """
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    if valid_mask is None:
        mask = jnp.ones_like(pred)
    else:
        mask = valid_mask.astype(jnp.float32)

    diff = pred - gt
    epsilon = 1e-6  # same constant as the reference (evaluation.py:40)

    l1 = _masked_mean(jnp.abs(diff), mask)
    abs_rel = _masked_mean(jnp.abs(diff) / (gt + epsilon), mask)
    rmse = jnp.sqrt(_masked_mean(diff * diff, mask))

    # Guard div-by-zero on masked-out pixels only; valid pixels follow the
    # reference exactly (it divides raw tensors too).
    safe_pred = jnp.where(mask > 0, pred, 1.0)
    safe_gt = jnp.where(mask > 0, gt, 1.0)
    thresh = jnp.maximum(safe_gt / safe_pred, safe_pred / safe_gt)
    d1 = _masked_mean((thresh < 1.1).astype(jnp.float32), mask)

    return {"d1": d1, "abs_rel": abs_rel, "rmse": rmse, "l1": l1}
