"""Quaternion algebra vs scipy/numpy golden values."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

import e3d_tpu  # noqa: F401  (alias bootstrap)
from e3d_tpu.ops import quaternion as quat


def random_unit_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def test_multiply_matches_scipy(rng):
    q1 = random_unit_quats(rng, 16)
    q2 = random_unit_quats(rng, 16)
    ours = np.asarray(quat.multiply(jnp.asarray(q1), jnp.asarray(q2)))
    # scipy composes rotations: R(q1)*R(q2) == from_quat(q1)*from_quat(q2)
    expected = (R.from_quat(q1) * R.from_quat(q2)).as_quat()
    # Quaternion double cover: compare up to sign.
    sign = np.sign(np.sum(ours * expected, axis=1, keepdims=True))
    np.testing.assert_allclose(ours * sign, expected, atol=1e-6)


def test_rotate_vector_matches_scipy(rng):
    q = random_unit_quats(rng, 16)
    v = rng.normal(size=(16, 3))
    ours = np.asarray(quat.rotate_vector(jnp.asarray(q), jnp.asarray(v)))
    expected = R.from_quat(q).apply(v)
    np.testing.assert_allclose(ours, expected, atol=1e-6)


def test_to_rotation_matrix_matches_scipy(rng):
    q = random_unit_quats(rng, 16)
    ours = np.asarray(quat.to_rotation_matrix(jnp.asarray(q)))
    expected = R.from_quat(q).as_matrix()
    np.testing.assert_allclose(ours, expected, atol=1e-6)


def test_geodesic_angle_matches_trace_formula(rng):
    q1 = random_unit_quats(rng, 32)
    q2 = random_unit_quats(rng, 32)
    ours = np.asarray(quat.geodesic_angle_deg(jnp.asarray(q1), jnp.asarray(q2)))
    # Reference formula (evaluation.py:147-152).
    m1 = R.from_quat(q1).as_matrix()
    m2 = R.from_quat(q2).as_matrix()
    rel = np.einsum("nij,njk->nik", m1.transpose(0, 2, 1), m2)
    cos = np.clip((np.trace(rel, axis1=1, axis2=2) - 1) / 2, -1, 1)
    expected = np.degrees(np.arccos(cos))
    np.testing.assert_allclose(ours, expected, atol=1e-3)


def test_sanitize_replaces_zero_quats():
    q = jnp.asarray([[0.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]])
    out = np.asarray(quat.sanitize(q))
    np.testing.assert_allclose(out[0], [0, 0, 0, 1])
    np.testing.assert_allclose(out[1], [0, 0, 0, 1])


def test_compose_poses_matches_sequential_loop(rng):
    """associative_scan chain == the reference's per-frame Python loop."""
    n = 50
    rel_t = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    rel_q = random_unit_quats(rng, n).astype(np.float32)
    rel = np.concatenate([rel_t, rel_q], axis=1)

    ours = np.asarray(quat.compose_poses(jnp.asarray(rel)))

    # Sequential golden model (evaluation.py:319-382 semantics, numpy).
    cur_t = np.zeros(3)
    cur_q = np.array([0.0, 0.0, 0.0, 1.0])
    expected = [np.concatenate([cur_t, cur_q])]
    for i in range(n):
        new_q = (R.from_quat(cur_q) * R.from_quat(rel_q[i])).as_quat()
        new_t = cur_t + R.from_quat(cur_q).apply(rel_t[i])
        cur_t, cur_q = new_t, new_q
        expected.append(np.concatenate([cur_t, cur_q]))
    expected = np.stack(expected)

    np.testing.assert_allclose(ours[:, :3], expected[:, :3], atol=1e-3)
    # Quaternions up to sign.
    dots = np.abs(np.sum(ours[:, 3:] * expected[:, 3:], axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)


def test_compose_poses_unnormalized_matches_scipy(rng):
    """RAW (unnormalized) network-style quaternions: the SE(3) pair op is
    only associative for unit quats, so compose_poses must normalize
    before scanning — scipy Rotation (the reference chain) normalizes
    internally. Without it, quat norms compound multiplicatively and a
    few-hundred-frame trajectory overflows f32."""
    n = 300
    rel_t = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    # norms in [0.5, 3]: typical raw regressor output scales
    rel_q = (rng.normal(size=(n, 4)).astype(np.float32)
             * rng.uniform(0.5, 3.0, size=(n, 1)).astype(np.float32))

    ours = np.asarray(quat.compose_poses(
        jnp.asarray(np.concatenate([rel_t, rel_q], axis=1))))
    assert np.isfinite(ours).all()

    cur_t = np.zeros(3)
    cur_q = np.array([0.0, 0.0, 0.0, 1.0])
    expected = [np.concatenate([cur_t, cur_q])]
    for i in range(n):
        new_q = (R.from_quat(cur_q) * R.from_quat(rel_q[i])).as_quat()
        new_t = cur_t + R.from_quat(cur_q).apply(rel_t[i])
        cur_t, cur_q = new_t, new_q
        expected.append(np.concatenate([cur_t, cur_q]))
    expected = np.stack(expected)

    np.testing.assert_allclose(ours[:, :3], expected[:, :3], atol=2e-2)
    dots = np.abs(np.sum(quat_np_normalize(ours[:, 3:])
                         * expected[:, 3:], axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-3)


def quat_np_normalize(q):
    return q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-8)


def test_relative_pose_roundtrip(rng):
    """relative_pose(q1->q2) composed onto q1 returns q2's rotation."""
    q1 = random_unit_quats(rng, 8).astype(np.float32)
    q2 = random_unit_quats(rng, 8).astype(np.float32)
    p1 = rng.normal(size=(8, 3)).astype(np.float32)
    p2 = rng.normal(size=(8, 3)).astype(np.float32)
    rel = quat.relative_pose(jnp.asarray(p1), jnp.asarray(q1),
                             jnp.asarray(p2), jnp.asarray(q2))
    rel = np.asarray(rel)
    # t is the unit direction of p2-p1
    d = (p2 - p1)
    d = d / (np.linalg.norm(d, axis=1, keepdims=True) + 1e-8)
    np.testing.assert_allclose(rel[:, :3], d, atol=1e-5)
    # q_rel * q1 == q2 (reference convention: q_rel = q2 * conj(q1))
    recomposed = np.asarray(quat.multiply(jnp.asarray(rel[:, 3:]), jnp.asarray(q1)))
    dots = np.abs(np.sum(recomposed * q2, axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)
