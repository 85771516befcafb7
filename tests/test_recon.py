"""Reconstruction stack: backprojection, voxel grid, normals, Poisson mesh,
PLY round-trip."""

import numpy as np
import jax.numpy as jnp
import pytest

import e3d_tpu  # noqa: F401
from e3d_tpu.recon import (
    backproject_depth, pose_to_matrix, transform_points, voxel_downsample,
    write_ply, read_ply,
)


def test_backproject_pinhole():
    """Center pixel back-projects to (0, 0, z); off-center follows
    x=(u-cx)z/fx."""
    h = w = 8
    fx = fy = 4.0
    cx = cy = 3.5
    depth = np.full((h, w), 2000, np.uint16)  # 2 m after /1000
    pts, _, valid = backproject_depth(jnp.asarray(depth), fx, fy, cx, cy)
    pts = np.asarray(pts).reshape(h, w, 3)
    assert np.asarray(valid).all()
    np.testing.assert_allclose(pts[3, 3], [-0.25, -0.25, 2.0], atol=1e-6)
    np.testing.assert_allclose(pts[0, 7], [(7 - cx) * 2 / fx,
                                           (0 - cy) * 2 / fy, 2.0], atol=1e-6)


def test_backproject_truncation():
    depth = np.array([[500, 4000], [0, 1000]], np.uint16)
    _, _, valid = backproject_depth(jnp.asarray(depth), 1, 1, 0.5, 0.5)
    np.testing.assert_array_equal(np.asarray(valid),
                                  [True, False, False, True])


def test_pose_transform_roundtrip(rng):
    q = rng.normal(size=4).astype(np.float32)
    q /= np.linalg.norm(q)
    t = rng.normal(size=3).astype(np.float32)
    mat = np.asarray(pose_to_matrix(jnp.asarray(t), jnp.asarray(q)))
    from scipy.spatial.transform import Rotation as R
    expected = np.eye(4)
    expected[:3, :3] = R.from_quat(q).as_matrix()
    expected[:3, 3] = t
    np.testing.assert_allclose(mat, expected, atol=1e-6)

    pts = rng.normal(size=(10, 3)).astype(np.float32)
    ours = np.asarray(transform_points(jnp.asarray(pts), jnp.asarray(mat)))
    exp = (expected[:3, :3] @ pts.T).T + t
    np.testing.assert_allclose(ours, exp, atol=1e-5)


def test_voxel_downsample(rng):
    pts = rng.uniform(0, 1, size=(1000, 3)).astype(np.float32)
    out, _, _ = voxel_downsample(pts, 0.25)
    assert len(out) <= 4 ** 3
    assert len(out) > 10
    # every voxel mean is inside its own voxel bounds
    origin = pts.min(axis=0)
    keys_out = np.floor((out - origin) / 0.25)
    keys_in = np.unique(np.floor((pts - origin) / 0.25), axis=0)
    assert len(out) == len(keys_in)


def test_estimate_normals_plane(rng):
    from e3d_tpu.recon.native import estimate_normals
    pts = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32)
    pts[:, 2] = 0.01 * pts[:, 0]  # near-flat plane z ~= 0.01x
    normals = estimate_normals(pts, radius=0.5, max_nn=30,
                               orient_toward=np.array([0, 0, 10.0]))
    # normals should be ~ +z
    assert (normals[:, 2] > 0.9).mean() > 0.95


def test_poisson_mesh_sphere(rng):
    """Mesh a unit sphere point cloud; vertices should be near radius 1."""
    from e3d_tpu.recon.poisson import poisson_mesh
    n = 4000
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pts = dirs.astype(np.float32)
    normals = dirs.astype(np.float32)  # outward
    verts, tris = poisson_mesh(pts, normals, grid_depth=6,
                               density_percentile=5.0)
    assert len(verts) > 100
    assert len(tris) > 100
    assert tris.max() < len(verts)
    radii = np.linalg.norm(verts, axis=1)
    # isosurface hugs the sphere
    assert abs(float(np.median(radii)) - 1.0) < 0.15
    assert (np.abs(radii - 1.0) < 0.3).mean() > 0.9


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, size=(50, 3)).astype(np.float32)
    nrm = rng.normal(size=(50, 3)).astype(np.float32)
    tris = rng.integers(0, 50, size=(20, 3)).astype(np.int32)
    for binary in (True, False):
        path = str(tmp_path / f"test_{binary}.ply")
        write_ply(path, pts, colors=cols, normals=nrm, triangles=tris,
                  binary=binary)
        back = read_ply(path)
        np.testing.assert_allclose(back["points"], pts, atol=1e-5)
        np.testing.assert_allclose(back["normals"], nrm, atol=1e-5)
        np.testing.assert_allclose(back["colors"], cols, atol=1 / 255 + 1e-6)
        np.testing.assert_array_equal(back["triangles"], tris)


@pytest.mark.slow
def test_poisson_depth8_sphere():
    from e3d_tpu.recon.poisson import poisson_mesh

    """256^3 spectral solve + meshing (half the reference's depth-9 grid;
    depth 9 itself is demonstrated on the TPU — perf/poisson9.jsonl,
    README). Checks memory-lean divergence accumulation at scale."""
    rng = np.random.default_rng(0)
    v = rng.normal(size=(20000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    verts, tris = poisson_mesh(v.astype(np.float32), v.astype(np.float32),
                               grid_depth=8)
    assert len(verts) > 1000 and len(tris) > 1000
    r = np.linalg.norm(verts, axis=1)
    assert abs(float(r.mean()) - 1.0) < 0.05
    assert float(r.std()) < 0.05
