"""Geometric end-to-end reconstruction test.

A synthetic 'colon': the camera travels down the axis of a cylinder of
radius R; each frame's depth image is the exact ray-cylinder intersection
distance. Backprojecting every frame with its GT pose and fusing must
produce points on the cylinder surface, and the Poisson mesh must
reconstruct a tube of radius ~R — this validates the pinhole model, the
pose convention (camera-to-world, z forward) and the meshing stack
together. A sign/axis error anywhere breaks the radius check.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import e3d_tpu  # noqa: F401
from e3d_tpu.recon import backproject_depth, pose_to_matrix, voxel_downsample
from e3d_tpu.recon.native import estimate_normals
from e3d_tpu.recon.poisson import poisson_mesh


R_CYL = 1.0
FX = FY = 40.0
CX = CY = 31.5
HW = 64


def cylinder_depth_frame() -> np.ndarray:
    """Exact depth (meters) to a cylinder x^2+y^2=R^2 from the axis origin,
    camera looking along +z."""
    v, u = np.mgrid[0:HW, 0:HW].astype(np.float64)
    dx = (u - CX) / FX
    dy = (v - CY) / FY
    dz = np.ones_like(dx)
    # ray: t*(dx, dy, dz); cylinder: t^2 (dx^2+dy^2) = R^2
    radial = np.sqrt(dx * dx + dy * dy)
    radial = np.maximum(radial, 1e-6)
    t = R_CYL / radial
    depth_z = t * dz  # z-depth (pinhole depth images store z, not range)
    return depth_z


def test_cylinder_fusion_and_mesh():
    depth_m = cylinder_depth_frame()
    depth_mm = np.clip(depth_m * 1000.0, 0, 65535).astype(np.uint16)

    # camera positions along the cylinder axis, identity orientation
    all_pts = []
    for z0 in np.linspace(0.0, 2.0, 9):
        transform = pose_to_matrix(jnp.asarray([0.0, 0.0, z0]),
                                   jnp.asarray([0.0, 0.0, 0.0, 1.0]))
        pts, _, valid = backproject_depth(
            jnp.asarray(depth_mm), FX, FY, CX, CY,
            depth_scale=1000.0, depth_trunc=3.0, transform=transform)
        mask = np.asarray(valid)
        all_pts.append(np.asarray(pts)[mask])
    points = np.concatenate(all_pts)
    assert len(points) > 10000

    # every fused point lies on the cylinder surface
    radii = np.linalg.norm(points[:, :2], axis=1)
    np.testing.assert_allclose(radii, R_CYL, atol=2e-3)

    # meshing: downsample, normals oriented outward (away from the axis),
    # FFT-Poisson + marching tetrahedra
    pts_ds, _, _ = voxel_downsample(points, 0.02)
    axis_points = np.stack([np.zeros(len(pts_ds)), np.zeros(len(pts_ds)),
                            pts_ds[:, 2]], axis=1)
    normals = estimate_normals(pts_ds, radius=0.15, max_nn=30,
                               orient_toward=axis_points.astype(np.float32))
    normals = -normals  # outward
    verts, tris = poisson_mesh(pts_ds.astype(np.float32), normals,
                               grid_depth=6, density_percentile=2.0)
    assert len(verts) > 500 and len(tris) > 500
    # interior section of the tube (away from open ends)
    zmid = (verts[:, 2] > 0.8) & (verts[:, 2] < 2.2)
    assert zmid.sum() > 100
    mesh_radii = np.linalg.norm(verts[zmid][:, :2], axis=1)
    assert abs(np.median(mesh_radii) - R_CYL) < 0.12, np.median(mesh_radii)


def test_sparse_marching_matches_dense(monkeypatch):
    """The sparse active-cell path (device straddle mask + per-cell corner
    gather + native sparse mesher) must produce the same welded mesh as
    the dense full-volume path."""
    rng = np.random.default_rng(3)
    v = rng.normal(size=(20000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    points = v.astype(np.float32)
    normals = v.astype(np.float32)

    monkeypatch.setenv("E3D_MESH_THREADS", "1")
    monkeypatch.setenv("E3D_POISSON_READBACK", "f32")
    monkeypatch.setenv("E3D_POISSON_SPARSE", "0")
    vd, td = poisson_mesh(points, normals, grid_depth=6)
    monkeypatch.setenv("E3D_POISSON_SPARSE", "1")
    vs, ts = poisson_mesh(points, normals, grid_depth=6)

    # Single-threaded, both paths walk cells in the same lexicographic
    # order -> bitwise-identical welded output.
    np.testing.assert_array_equal(vs, vd)
    np.testing.assert_array_equal(ts, td)
    assert len(vd) > 1000

    # Multi-threaded sparse run: same geometry modulo vertex order.
    monkeypatch.setenv("E3D_MESH_THREADS", "4")
    vt, tt = poisson_mesh(points, normals, grid_depth=6)
    assert len(vt) == len(vd) and len(tt) == len(td)
    order_d = np.lexsort(vd.T)
    order_t = np.lexsort(vt.T)
    np.testing.assert_allclose(vt[order_t], vd[order_d], atol=1e-6)


def test_sparse_matches_dense_f16_readback(monkeypatch):
    """The PRODUCTION default is f16 readback: the sparse mask must be
    computed on f16-rounded chi (round_f16) so it agrees with the f16
    corner values the mesher interpolates — a cell that only straddles
    iso after rounding must be visited, or its meshed neighbor leaves a
    crack. Dense-f16 and sparse-f16 walk the same cells single-threaded,
    so the welded output is bitwise identical."""
    rng = np.random.default_rng(4)
    v = rng.normal(size=(20000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    points = v.astype(np.float32)
    normals = v.astype(np.float32)

    monkeypatch.setenv("E3D_MESH_THREADS", "1")
    monkeypatch.setenv("E3D_POISSON_READBACK", "f16")
    monkeypatch.setenv("E3D_POISSON_SPARSE", "0")
    vd, td = poisson_mesh(points, normals, grid_depth=6)
    monkeypatch.setenv("E3D_POISSON_SPARSE", "1")
    vs, ts = poisson_mesh(points, normals, grid_depth=6)
    np.testing.assert_array_equal(vs, vd)
    np.testing.assert_array_equal(ts, td)
    assert len(vd) > 1000
