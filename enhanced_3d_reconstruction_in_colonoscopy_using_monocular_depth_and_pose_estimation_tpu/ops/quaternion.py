"""Quaternion algebra and SE(3) pose composition, pure JAX.

Quaternion convention is ``[qx, qy, qz, qw]`` (scalar last), matching the
reference (``/root/reference/eval/evaluation.py:385-485`` and the SimCol
``SavedRotationQuaternion_*.txt`` files).

The reference composes trajectories with a per-frame Python loop
(``evaluation.py:279-382``). Pose composition is an associative group
operation on SE(3), so here it is a single ``jax.lax.associative_scan`` —
one device program, O(log N) depth, no host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# Plain tuple: a module-level device array would force backend init
# at import time (breaks host-only imports of the package).
IDENTITY_QUAT = (0.0, 0.0, 0.0, 1.0)


def normalize(q: Array, eps: float = 1e-8) -> Array:
    """Normalize quaternions along the last axis (safe at zero norm)."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def sanitize(q: Array, eps: float = 1e-8) -> Array:
    """Replace (near-)zero quaternions with identity.

    Mirrors the zero-quaternion fallback of the reference
    (``evaluation.py:130-137`` and ``evaluation.py:331-338``).
    """
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    ident = jnp.broadcast_to(jnp.asarray(IDENTITY_QUAT, q.dtype), q.shape)
    return jnp.where(n < eps, ident, q)


def conjugate(q: Array) -> Array:
    """Quaternion conjugate: negate the vector part."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def multiply(q1: Array, q2: Array) -> Array:
    """Hamilton product of ``[x, y, z, w]`` quaternions; broadcasts.

    Same formula as the reference ``quaternion_multiply``
    (``evaluation.py:412-424``).
    """
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
    z = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
    return jnp.stack([x, y, z, w], axis=-1)


def rotate_vector(q: Array, v: Array) -> Array:
    """Rotate vectors ``v`` (..., 3) by unit quaternions ``q`` (..., 4).

    Uses the expanded form v' = v + 2*(w*(u x v) + u x (u x v)), the same
    identity as the reference ``quaternion_rotate_vector``
    (``evaluation.py:464-479``).
    """
    u = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (uv * w + uuv)


def to_rotation_matrix(q: Array) -> Array:
    """Unit quaternion(s) ``[x, y, z, w]`` -> rotation matrix (..., 3, 3).

    Matches ``scipy.spatial.transform.Rotation.from_quat(...).as_matrix()``
    (used by the reference at ``evaluation.py:143-144`` and
    ``depth_to_pointcloud.py:168``).
    """
    q = normalize(q)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def geodesic_angle_deg(q1: Array, q2: Array, eps: float = 1e-8) -> Array:
    """Rotation angle between two quaternions, in degrees.

    Equivalent to the reference's rotation-matrix trace formula
    (``evaluation.py:147-152``): for unit quaternions,
    ``theta = 2*arccos(|<q1, q2>|)``. The |.| makes it double-cover safe.
    """
    q1 = normalize(q1, eps)
    q2 = normalize(q2, eps)
    dot = jnp.clip(jnp.abs(jnp.sum(q1 * q2, axis=-1)), 0.0, 1.0)
    return jnp.degrees(2.0 * jnp.arccos(dot))


def relative_pose(pos1: Array, quat1: Array, pos2: Array, quat2: Array,
                  eps: float = 1e-8) -> Array:
    """GT relative pose between consecutive frames, reference semantics.

    Matches ``PoseDataset.__getitem__`` (``data_processing/
    pose_estimation.py:256-302``): translation = unit-normalized
    ``pos2 - pos1`` (world frame, NOT rotated into the camera frame), and
    rotation = ``q2 * conj(q1)``, unit-normalized. Returns ``[t(3), q(4)]``.
    """
    rel_t = pos2 - pos1
    rel_t = rel_t / (jnp.linalg.norm(rel_t, axis=-1, keepdims=True) + eps)
    rel_q = multiply(quat2, conjugate(quat1))
    rel_q = normalize(rel_q, eps)
    return jnp.concatenate([rel_t, rel_q], axis=-1)


def _compose_pair(a, b):
    """SE(3) composition: (t_a, q_a) then (t_b, q_b) in a's frame."""
    t_a, q_a = a
    t_b, q_b = b
    return (t_a + rotate_vector(q_a, t_b), multiply(q_a, q_b))


def compose_poses(relative_poses: Array, initial_pose: Array | None = None) -> Array:
    """Chain relative poses into absolute poses: P_tau = P1 * Omega_1 ... Omega_tau.

    Same math as the reference's sequential Python loop
    (``evaluation.py:319-382``) — new_q = q * q_rel,
    new_t = t + R(q) t_rel — but computed with
    ``jax.lax.associative_scan`` so an N-frame trajectory is one fused
    device program instead of N host iterations.

    Args:
        relative_poses: (N, 7) array of ``[t, q]`` relative poses.
        initial_pose: optional (7,) initial pose; identity if None.

    Returns:
        (N+1, 7) absolute poses, starting with the initial pose.
    """
    relative_poses = jnp.asarray(relative_poses, dtype=jnp.float32)
    if initial_pose is None:
        initial_pose = jnp.asarray([0.0, 0.0, 0.0] + list(IDENTITY_QUAT),
                                   jnp.float32)
    initial_pose = jnp.asarray(initial_pose, jnp.float32).reshape(7)

    t_rel = relative_poses[:, :3]
    # Normalize after the zero-quat fallback: the SE(3) pair op is only
    # associative for UNIT quaternions — raw network outputs are
    # unnormalized, and scanning them un-normalized compounds the norm
    # multiplicatively (garbage/overflowing trajectories within a few
    # hundred frames). The reference goes through scipy Rotation, which
    # normalizes internally (``evaluation.py:319-382``).
    q_rel = normalize(sanitize(relative_poses[:, 3:]))

    # Prepend the initial pose, then scan the group op.
    t_all = jnp.concatenate([initial_pose[None, :3], t_rel], axis=0)
    q0 = normalize(sanitize(initial_pose[None, 3:]))
    q_all = jnp.concatenate([q0, q_rel], axis=0)
    t_abs, q_abs = jax.lax.associative_scan(_compose_pair, (t_all, q_all), axis=0)
    return jnp.concatenate([t_abs, q_abs], axis=-1)
