"""Model-driven per-frame point clouds — the reference's
``depth_to_pointcloud_dav2.py``.

Usage:
    python -m ...cli.pointcloud_model --encoder vitl --load-from ckpt \
        --max-depth 20 -i <dataset_root> -o out/ [--max-frames N]

Parity with ``/root/reference/depth_to_pointcloud_dav2.py``: runs the
depth model on each frame, back-projects with the pinhole model
(x=(u-cx)z/fx etc., ``:300-314``), selects the per-SyntheticColon cam.txt
(``:252-266``), writes one PLY per frame (``:317-326``).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def main(argv=None) -> None:
    from ..core.debug import enable_compilation_cache

    enable_compilation_cache()
    import cv2
    import jax.numpy as jnp

    from ..models.convert import load_or_init_depth_params
    from ..models.depth_anything import infer_image
    from ..recon import backproject_depth, load_intrinsics, write_ply

    p = argparse.ArgumentParser()
    p.add_argument("--encoder", default="vitl",
                   choices=["vits", "vitb", "vitl", "vitg", "vitt"])
    p.add_argument("--load-from", default=None)
    p.add_argument("--max-depth", type=float, default=20.0)
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--outdir", required=True)
    p.add_argument("--input-size", type=int, default=518)
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--token-merge", type=float, default=0.0,
                   help="ToMe token-merge fraction (0=off; README)")
    p.add_argument("--int8", action="store_true",
                   help="dynamic-int8 encoder matmuls (README)")
    args = p.parse_args(argv)

    model, params = load_or_init_depth_params(args.encoder, args.max_depth,
                                              args.load_from,
                                              token_merge=args.token_merge,
                                              quant_int8=args.int8)

    frames = sorted(glob.glob(os.path.join(
        args.input, "SyntheticColon_*", "Frames_*", "FrameBuffer_*.png")))
    if not frames:
        frames = sorted(glob.glob(os.path.join(args.input, "*.png")))
    if args.max_frames:
        frames = frames[:args.max_frames]
    if not frames:
        raise SystemExit(f"no frames under {args.input}")

    os.makedirs(args.outdir, exist_ok=True)
    for frame in frames:
        colon_dir = os.path.dirname(os.path.dirname(frame))
        cam = os.path.join(colon_dir, "cam.txt")
        if not os.path.exists(cam):
            cam = os.path.join(args.input, "UnityCam", "cam.txt")
        fx, fy, cx, cy = load_intrinsics(cam)

        raw = cv2.imread(frame)
        depth = infer_image(model, params, raw, args.input_size)

        pts, cols, valid = backproject_depth(
            jnp.asarray(depth), fx, fy, cx, cy,
            color=jnp.asarray(raw[..., ::-1]),  # uint8: scaled /255 inside
            depth_scale=1.0, depth_trunc=float(args.max_depth) + 1.0)
        mask = np.asarray(valid)
        name = os.path.splitext(os.path.basename(frame))[0]
        out_path = os.path.join(args.outdir, f"{name}.ply")
        write_ply(out_path, np.asarray(pts)[mask],
                  colors=np.asarray(cols)[mask])
        print(f"[pointcloud_model] wrote {out_path}")


if __name__ == "__main__":
    main()
