"""Pose/trajectory evaluation: ATE, RTE, ROTE, trajectory composition.

Reference: ``/root/reference/eval/evaluation.py`` —
``compute_ate`` (:85-98), ``compute_rte`` (:101-119), ``compute_rot_error``
(:122-161), ``compute_pose_errors`` (:164-208), ``calculate_scale_factor``
(:257-276), ``evaluate_trajectory`` (:211-254).

All metrics are pure JAX and jittable; the trajectory composition uses the
associative-scan pose chain from ``ops.quaternion``.

Known reference quirk NOT reproduced: the reference's ``compose_poses``
silently drops everything but the first batch when handed a 3-D
``(num_batches, N, 7)`` tensor (``evaluation.py:305-309``), so its epoch-end
trajectory metrics only cover one batch. Here ``evaluate_trajectory`` expects
a flat ``(N, 7)`` trajectory; callers flatten batches in frame order (see
``train/pose_task.py``), which evaluates the *whole* trajectory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import quaternion as quat

Array = jax.Array


def compute_ate(gt_trans: Array, pred_trans: Array) -> Array:
    """Absolute trajectory error: RMSE of position errors (N, 3)."""
    err = jnp.linalg.norm(gt_trans - pred_trans, axis=-1)
    return jnp.sqrt(jnp.mean(err * err))


def compute_rte(gt_trans: Array, pred_trans: Array) -> Array:
    """Relative translation error: mean error of consecutive-frame deltas."""
    gt_rel = jnp.diff(gt_trans, axis=0)
    pred_rel = jnp.diff(pred_trans, axis=0)
    return jnp.mean(jnp.linalg.norm(gt_rel - pred_rel, axis=-1))


def compute_rote(gt_quats: Array, pred_quats: Array) -> Array:
    """Mean rotation error in degrees between quaternion sequences (N, 4).

    Zero predicted quaternions fall back to identity, as in the reference
    (``evaluation.py:130-137``).
    """
    pred_quats = quat.sanitize(pred_quats)
    gt_quats = quat.sanitize(gt_quats)
    return jnp.mean(quat.geodesic_angle_deg(gt_quats, pred_quats))


def compute_pose_errors(pred_poses: Array, gt_poses: Array) -> dict[str, Array]:
    """Per-batch pose errors between predicted and GT 7-D poses.

    Mirrors ``compute_pose_errors`` (``evaluation.py:164-208``): normalize
    quaternions, flip predictions into the GT hemisphere, then ATE / RTE /
    ROTE over the batch treated as a short trajectory.
    """
    pred_poses = pred_poses.astype(jnp.float32)
    gt_poses = gt_poses.astype(jnp.float32)
    pred_t, pred_q = pred_poses[:, :3], quat.normalize(pred_poses[:, 3:])
    gt_t, gt_q = gt_poses[:, :3], quat.normalize(gt_poses[:, 3:])

    dot = jnp.sum(gt_q * pred_q, axis=1, keepdims=True)
    pred_q = jnp.where(dot < 0, -pred_q, pred_q)

    return {
        "ate": compute_ate(gt_t, pred_t),
        "rte": compute_rte(gt_t, pred_t),
        "rote": compute_rote(gt_q, pred_q),
    }


def calculate_scale_factor(pred_rel_poses: Array, gt_rel_poses: Array) -> Array:
    """Least-squares scale aligning predicted translations to GT.

    Reference eq. (6) implementation (``evaluation.py:257-276``):
    ``scale = sum(t_hat . t) / sum(t_hat . t_hat)``.
    """
    pred_t = pred_rel_poses[..., :3]
    gt_t = gt_rel_poses[..., :3]
    # Epsilon guard (same numerical-safety convention as the masked
    # means here): near-zero predicted translations — e.g. an
    # early-training collapse — would make this 0/0 = NaN and poison
    # every trajectory metric of the epoch.
    return (jnp.sum(pred_t * gt_t)
            / jnp.maximum(jnp.sum(pred_t * pred_t), 1e-12))


def evaluate_trajectory(pred_rel_poses: Array, gt_rel_poses: Array,
                        initial_pose: Array | None = None) -> dict[str, Array]:
    """Full-trajectory metrics from relative poses.

    Mirrors ``evaluate_trajectory`` (``evaluation.py:211-254``): scale-align
    predicted translations, compose both trajectories to absolute poses, then
    RTE on scaled relative translations, ATE on absolute positions and ROTE
    on absolute orientations.

    Args:
        pred_rel_poses: (N, 7) predicted relative poses.
        gt_rel_poses: (N, 7) GT relative poses.
        initial_pose: optional (7,) starting pose.
    """
    pred_rel_poses = jnp.asarray(pred_rel_poses, jnp.float32)
    gt_rel_poses = jnp.asarray(gt_rel_poses, jnp.float32)

    scale = calculate_scale_factor(pred_rel_poses, gt_rel_poses)
    scaled_pred = pred_rel_poses.at[:, :3].multiply(scale)

    pred_abs = quat.compose_poses(scaled_pred, initial_pose)
    gt_abs = quat.compose_poses(gt_rel_poses, initial_pose)

    return {
        "rte": compute_rte(scaled_pred[:, :3], gt_rel_poses[:, :3]),
        "ate": compute_ate(gt_abs[:, :3], pred_abs[:, :3]),
        "rote": compute_rote(gt_abs[:, 3:], pred_abs[:, 3:]),
    }
