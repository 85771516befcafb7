"""Evaluation edge cases: zero quaternions, padded trajectories, NaN
robustness of masks."""

import numpy as np
import jax.numpy as jnp

import e3d_tpu  # noqa: F401
from e3d_tpu.evaluation import (compute_pose_errors, compute_rote,
                                evaluate_trajectory)
from e3d_tpu.losses import silog_loss
from e3d_tpu.ops import quaternion as quat


def test_zero_quaternion_fallback_in_compose():
    """Zero quats become identity (evaluation.py:331-338 behavior)."""
    rel = np.zeros((3, 7), np.float32)
    rel[:, :3] = [1.0, 0.0, 0.0]
    # quats all zero -> identity -> pure translation accumulation
    abs_poses = np.asarray(quat.compose_poses(jnp.asarray(rel)))
    np.testing.assert_allclose(abs_poses[-1, :3], [3, 0, 0], atol=1e-6)
    np.testing.assert_allclose(abs_poses[-1, 3:], [0, 0, 0, 1], atol=1e-6)


def test_rote_zero_quat_uses_identity():
    gt = np.tile([0, 0, 0, 1.0], (4, 1)).astype(np.float32)
    pred = np.zeros((4, 4), np.float32)  # all-zero -> identity
    out = float(compute_rote(jnp.asarray(gt), jnp.asarray(pred)))
    assert out < 0.5


def test_pose_errors_batch_of_one():
    pose = np.array([[1.0, 2.0, 3.0, 0, 0, 0, 1]], np.float32)
    m = compute_pose_errors(jnp.asarray(pose), jnp.asarray(pose))
    assert float(m["ate"]) == 0.0
    # RTE over a single pose has no consecutive deltas; must not be NaN-fatal
    assert not np.isinf(float(m["rote"]))


def test_evaluate_trajectory_opposite_scale():
    rel = np.zeros((10, 7), np.float32)
    rel[:, 0] = 1.0
    rel[:, 6] = 1.0
    pred = rel.copy()
    pred[:, 0] = 0.25  # scale-off by 4x; alignment must fix it
    m = evaluate_trajectory(jnp.asarray(pred), jnp.asarray(rel))
    assert float(m["ate"]) < 1e-5
    assert float(m["rte"]) < 1e-5


def test_silog_fully_masked_is_finite():
    pred = jnp.ones((2, 4, 4))
    gt = jnp.ones((2, 4, 4))
    mask = jnp.zeros((2, 4, 4), bool)
    out = float(silog_loss(pred, gt, mask))
    assert np.isfinite(out)
