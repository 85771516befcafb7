"""Depth -> point cloud reconstruction, vectorized JAX.

TPU-native replacement for the Open3D pipeline in
``/root/reference/depth_to_pointcloud.py``:

- ``backproject_depth``: pinhole back-projection with Open3D RGBD
  semantics (``create_from_color_and_depth``: depth/1000 scaling, 3 m
  truncation; ``depth_to_pointcloud.py:202-231``) — one fused device
  program per frame, vmappable over a whole trajectory;
- ``pose_to_matrix``: position + quaternion -> 4x4
  (``depth_to_pointcloud.py:154-174``, scipy semantics via
  ``ops.quaternion.to_rotation_matrix``);
- ``transform_points``: homogeneous transform (Open3D
  ``PointCloud.transform``);
- ``voxel_downsample``: voxel-grid averaging of points/colors (Open3D
  ``voxel_down_sample``; ``depth_to_pointcloud.py:357-359``).

Invalid pixels (zero/truncated depth) are masked, keeping shapes static
under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import quaternion as quat

Array = jax.Array


def load_intrinsics(path: str) -> tuple[float, float, float, float]:
    """cam.txt (flat 9 or 3x3) -> (fx, fy, cx, cy)
    (``depth_to_pointcloud.py:126-151``, ``depth_to_pointcloud_dav2.py:35-49``)."""
    vals = np.loadtxt(path).reshape(3, 3)
    return float(vals[0, 0]), float(vals[1, 1]), float(vals[0, 2]), float(vals[1, 2])


def pose_to_matrix(position: Array, quaternion: Array) -> Array:
    """(3,), (4,) [x,y,z,w] -> (4, 4) homogeneous transform."""
    rot = quat.to_rotation_matrix(jnp.asarray(quaternion, jnp.float32))
    mat = jnp.eye(4, dtype=jnp.float32)
    mat = mat.at[:3, :3].set(rot)
    return mat.at[:3, 3].set(jnp.asarray(position, jnp.float32))


def backproject_depth(depth: Array, fx: float, fy: float, cx: float,
                      cy: float, color: Array | None = None,
                      depth_scale: float = 1000.0,
                      depth_trunc: float = 3.0,
                      transform: Array | None = None):
    """Back-project a (H, W) depth image to camera/world-space points.

    Args:
        depth: (H, W) raw depth (e.g. uint16 values; divided by
            ``depth_scale`` like Open3D's RGBD constructor).
        color: optional (H, W, 3) in [0, 255] or [0, 1].
        transform: optional (4, 4) camera-to-world matrix.

    Returns:
        (points (H*W, 3) f32, colors (H*W, 3) f32 or None,
         valid (H*W,) bool) — fixed shape; filter by ``valid`` on host.
    """
    depth = jnp.asarray(depth).astype(jnp.float32) / depth_scale
    h, w = depth.shape
    v = jnp.arange(h, dtype=jnp.float32)[:, None]
    u = jnp.arange(w, dtype=jnp.float32)[None, :]
    z = depth
    valid = (z > 0) & (z < depth_trunc)
    x = (u - cx) * z / fx
    y = (v - cy) * z / fy
    pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    if transform is not None:
        pts = transform_points(pts, transform)
    cols = None
    if color is not None:
        cols = jnp.asarray(color)
        # dtype decides the scaling, like Open3D's unconditional uint8 /
        # 255 (depth_to_pointcloud.py RGBD path) — a value heuristic
        # would misread a near-black uint8 frame as already normalized.
        scale = 255.0 if jnp.issubdtype(cols.dtype, jnp.integer) else 1.0
        cols = cols.astype(jnp.float32).reshape(-1, 3) / scale
    return pts, cols, valid.reshape(-1)


def transform_points(points: Array, transform: Array) -> Array:
    """(N, 3) x (4, 4) homogeneous transform."""
    rot = transform[:3, :3]
    t = transform[:3, 3]
    return points @ rot.T + t


def voxel_downsample(points: np.ndarray, voxel_size: float,
                     colors: np.ndarray | None = None,
                     normals: np.ndarray | None = None):
    """Voxel-grid average downsampling (Open3D ``voxel_down_sample``).

    Host-side numpy: reconstruction post-processing, not a training hot
    path. Points falling in the same voxel are averaged (as are colors
    and normals; normals re-normalized).
    """
    points = np.asarray(points, np.float64)
    if len(points) == 0:
        return (points.astype(np.float32), colors, normals)
    origin = points.min(axis=0)
    keys = np.floor((points - origin) / voxel_size).astype(np.int64)
    # unique voxel ids
    _, inverse, counts = np.unique(keys, axis=0, return_inverse=True,
                                   return_counts=True)
    n_vox = len(counts)

    def avg(values):
        out = np.zeros((n_vox, values.shape[1]), np.float64)
        np.add.at(out, inverse, values)
        return (out / counts[:, None]).astype(np.float32)

    out_pts = avg(points)
    out_cols = avg(np.asarray(colors, np.float64)) if colors is not None else None
    out_nrm = None
    if normals is not None:
        out_nrm = avg(np.asarray(normals, np.float64))
        norm = np.linalg.norm(out_nrm, axis=1, keepdims=True)
        out_nrm = (out_nrm / np.maximum(norm, 1e-12)).astype(np.float32)
    return out_pts, out_cols, out_nrm
