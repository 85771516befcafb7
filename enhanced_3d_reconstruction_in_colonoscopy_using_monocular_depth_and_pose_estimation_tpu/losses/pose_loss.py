"""Relative-pose regression loss.

Reference: ``PoseEstimationModule.pose_loss``
(``/root/reference/pose_estimation_model.py:346-398``):

    L = L_t + beta * L_r + 0.1 * L_reg

    L_t   = mean_b sum(((t_hat - t) / max(||t||, eps))^2)   (scale-normalized L2)
    L_r   = mean_b (1 - <q_hat, q>^2)                        (geodesic surrogate,
             with double-cover sign flip before the dot product)
    L_reg = mean_b exp(-||q_hat_raw||)                       (anti-collapse norm
             regularizer on the *unnormalized* predicted quaternion)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def pose_loss(pred_pose: Array, gt_pose: Array, beta: float = 1.0,
              reg_weight: float = 0.1, eps: float = 1e-8) -> Array:
    """Combined translation + rotation + regularization loss.

    Args:
        pred_pose: (B, 7) predicted ``[tx,ty,tz,qx,qy,qz,qw]``.
        gt_pose: (B, 7) ground truth in the same layout.
        beta: rotation-loss weight (reference ``beta`` hyperparameter).
        reg_weight: weight of the quaternion-norm regularizer (ref: 0.1).

    Returns:
        scalar loss (f32).
    """
    pred_pose = pred_pose.astype(jnp.float32)
    gt_pose = gt_pose.astype(jnp.float32)
    pred_t, pred_q = pred_pose[:, :3], pred_pose[:, 3:]
    gt_t, gt_q = gt_pose[:, :3], gt_pose[:, 3:]

    # Norm regularizer on the raw (pre-normalization) predicted quaternion.
    pred_q_norm = jnp.linalg.norm(pred_q, axis=1, keepdims=True)
    quat_reg = jnp.mean(jnp.exp(-pred_q_norm))

    pred_qn = pred_q / jnp.maximum(pred_q_norm, eps)
    gt_qn = gt_q / jnp.maximum(jnp.linalg.norm(gt_q, axis=1, keepdims=True), eps)

    # Translation loss, scaled by the GT translation magnitude.
    trans_scale = jnp.maximum(jnp.linalg.norm(gt_t, axis=1, keepdims=True), eps)
    l_t = jnp.mean(jnp.sum(jnp.square((pred_t - gt_t) / trans_scale), axis=1))

    # Double-cover correction, then squared-dot rotation loss.
    dot = jnp.sum(pred_qn * gt_qn, axis=1)
    pred_qn = jnp.where(dot[:, None] < 0, -pred_qn, pred_qn)
    l_r = jnp.mean(1.0 - jnp.square(jnp.sum(pred_qn * gt_qn, axis=1)))

    return l_t + beta * l_r + reg_weight * quat_reg
