"""Point-cloud + mesh reconstruction CLI — the reference's
``depth_to_pointcloud.py``.

Usage:
    python -m ...cli.pointcloud -i <dataset_root> -ds simcol -o out/ \
        [--voxel-size 0.01] [--mesh-depth 9] [--max-frames N]

Parity with ``/root/reference/depth_to_pointcloud.py``: pairs RGB frames
with predicted depths from ``Frames_*_OP`` dirs (``:53-122``), camera
intrinsics from ``cam.txt`` (``:126-151``), per-frame GT pose from
``SavedPosition_*/SavedRotationQuaternion_*`` (``:154-174``), accumulates a
world-space cloud, voxel-downsamples (0.01), meshes (Poisson depth-9
analog: TPU FFT Poisson + marching tetrahedra + 5% density pruning) and
writes ``combined_point_cloud.ply`` / ``combined_mesh.ply``.
"""

from __future__ import annotations

import argparse
import glob
import os
import re

import numpy as np


def find_frame_pairs(root: str) -> list[tuple[str, str]]:
    """(rgb, predicted_depth) pairs from Frames_* / Frames_*_OP dirs."""
    pairs = []
    for rgb_dir in sorted(glob.glob(os.path.join(
            root, "SyntheticColon_*", "Frames_*"))):
        if rgb_dir.endswith("_OP"):
            continue
        op_dir = rgb_dir + "_OP"
        if not os.path.isdir(op_dir):
            continue
        for rgb in sorted(glob.glob(os.path.join(rgb_dir,
                                                 "FrameBuffer_*.png"))):
            base = os.path.splitext(os.path.basename(rgb))[0]
            for cand in (os.path.join(op_dir, base + ".png"),
                         os.path.join(op_dir,
                                      base.replace("FrameBuffer", "Depth")
                                      + ".png")):
                if os.path.exists(cand):
                    pairs.append((rgb, cand))
                    break
    return pairs


def get_procedure_files(rgb_path: str, root: str):
    """cam.txt + pose files for the procedure containing ``rgb_path``
    (``depth_to_pointcloud.py:284-312``)."""
    frames_dir = os.path.dirname(rgb_path)
    colon_dir = os.path.dirname(frames_dir)
    frame_id = os.path.basename(frames_dir).split("_")[-1]
    cam = os.path.join(root, "UnityCam", "cam.txt")
    if not os.path.exists(cam):
        cam = os.path.join(colon_dir, "cam.txt")
    pos = os.path.join(colon_dir, f"SavedPosition_{frame_id}.txt")
    rot = os.path.join(colon_dir, f"SavedRotationQuaternion_{frame_id}.txt")
    return cam, pos, rot


def frame_index(rgb_path: str) -> int:
    m = re.search(r"_(\d+)\.png$", rgb_path)
    return int(m.group(1)) if m else 0


def main(argv=None) -> None:
    from ..core.debug import enable_compilation_cache

    enable_compilation_cache()
    import cv2
    import jax.numpy as jnp

    from ..recon import (backproject_depth, load_intrinsics, pose_to_matrix,
                         voxel_downsample, write_ply)
    from ..recon.native import estimate_normals
    from ..recon.poisson import poisson_mesh

    p = argparse.ArgumentParser()
    p.add_argument("-i", "--input", required=True,
                   help="dataset root (contains SyntheticColon_*)")
    p.add_argument("-ds", "--ds_type", default="simcol")
    p.add_argument("-o", "--outdir", default=".")
    p.add_argument("--voxel-size", type=float, default=0.01)
    p.add_argument("--mesh-depth", type=int, default=9,
                   help="Poisson grid depth (2^d per axis; reference "
                        "default 9 = 512^3 — 0.34 s solve on a v5e)")
    p.add_argument("--depth-scale", type=float, default=1000.0)
    p.add_argument("--depth-trunc", type=float, default=3.0)
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--skip-mesh", action="store_true")
    args = p.parse_args(argv)

    pairs = find_frame_pairs(args.input)
    if args.max_frames:
        pairs = pairs[:args.max_frames]
    if not pairs:
        raise SystemExit(f"no (rgb, depth) pairs under {args.input} "
                         "(need Frames_*_OP prediction dirs)")
    print(f"[pointcloud] {len(pairs)} frames")

    all_pts, all_cols = [], []
    pose_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    cam_cache: dict[str, tuple[float, float, float, float]] = {}
    for rgb_path, depth_path in pairs:
        cam_f, pos_f, rot_f = get_procedure_files(rgb_path, args.input)
        if cam_f not in cam_cache:
            cam_cache[cam_f] = load_intrinsics(cam_f)
        fx, fy, cx, cy = cam_cache[cam_f]
        if pos_f not in pose_cache:
            pose_cache[pos_f] = (np.loadtxt(pos_f), np.loadtxt(rot_f))
        positions, quats = pose_cache[pos_f]
        idx = frame_index(rgb_path)
        idx = min(idx, len(positions) - 1)

        depth = cv2.imread(depth_path, cv2.IMREAD_UNCHANGED)
        if depth.ndim == 3:
            # run.py-style grayscale predictions are 3 identical channels.
            depth = depth[..., 0]
        color = cv2.imread(rgb_path)
        if depth.shape[:2] != color.shape[:2]:
            depth = cv2.resize(depth, (color.shape[1], color.shape[0]),
                               interpolation=cv2.INTER_NEAREST)
        transform = pose_to_matrix(jnp.asarray(positions[idx], jnp.float32),
                                   jnp.asarray(quats[idx], jnp.float32))
        pts, cols, valid = backproject_depth(
            jnp.asarray(depth.astype(np.float32)), fx, fy, cx, cy,
            color=jnp.asarray(color[..., ::-1]),  # uint8: scaled /255 inside
            depth_scale=args.depth_scale, depth_trunc=args.depth_trunc,
            transform=transform)
        mask = np.asarray(valid)
        all_pts.append(np.asarray(pts)[mask])
        all_cols.append(np.asarray(cols)[mask])

    points = np.concatenate(all_pts)
    colors = np.concatenate(all_cols)
    print(f"[pointcloud] {len(points)} points before downsampling")
    points, colors, _ = voxel_downsample(points, args.voxel_size,
                                         colors=colors)
    print(f"[pointcloud] {len(points)} points after voxel_down_sample"
          f"({args.voxel_size})")

    os.makedirs(args.outdir, exist_ok=True)
    pc_path = os.path.join(args.outdir, "combined_point_cloud.ply")
    write_ply(pc_path, points, colors=colors)
    print(f"[pointcloud] wrote {pc_path}")

    if not args.skip_mesh and len(points) > 100:
        centroid = points.mean(axis=0)
        normals = estimate_normals(points, radius=0.1, max_nn=30,
                                   orient_toward=centroid.astype(np.float32))
        # colon interior: camera looks at the wall from inside; orient
        # toward the centroid then flip (outward-facing surface normals).
        verts, tris = poisson_mesh(points, -normals,
                                   grid_depth=args.mesh_depth,
                                   density_percentile=5.0)
        mesh_path = os.path.join(args.outdir, "combined_mesh.ply")
        write_ply(mesh_path, verts, triangles=tris)
        print(f"[pointcloud] wrote {mesh_path} "
              f"({len(verts)} verts, {len(tris)} tris)")


if __name__ == "__main__":
    main()
