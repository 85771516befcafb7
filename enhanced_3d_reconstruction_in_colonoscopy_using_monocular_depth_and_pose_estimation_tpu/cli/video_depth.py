"""One-shot video -> depth-video CLI.

The reference needs three manual steps for this flow: frame extraction
(``/root/reference/video_to_images.py``), per-frame depth on the frame
dir (``run.py:195-262``, incl. its side-by-side composite), and an
external re-encode. Here the stream goes decoder -> batched serving
engine -> encoder without frames ever touching disk: MJPEG AVI/MP4 input
rides the native C++ demux+JPEG codec (``media/native``), any other
codec falls back to cv2 decode, and the output is always MJPEG written
natively (AVI or MP4 by extension). Decode and encode run on the host
threads while the TPU works the previous batch (the engine keeps one
batch in flight ahead).

Usage:
    python -m ...cli.video_depth -i colon.avi -o colon_depth.mp4 \
        [--encoder vitl --load-from ckpt] [--side-by-side] [--every-n 2]
        [--max-frames N] [--grayscale] [--quality 90] [--int8]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _frames(path: str, every_n: int, max_frames: int | None):
    """Yield (index, RGB uint8 frame, fps). Native MJPEG path when the
    container parses and carries MJPEG; cv2 otherwise."""
    from ..media.video import _native_reader

    r = _native_reader(path)
    if r is not None:
        with r:
            n = r.num_frames
            count = 0
            for i in range(0, n, every_n):
                if max_frames is not None and count >= max_frames:
                    return
                yield i, r.frame_rgb(i), r.fps
                count += 1
        return
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    i = count = 0
    try:
        while True:
            ok, bgr = cap.read()
            if not ok:
                return
            if i % every_n == 0:
                if max_frames is not None and count >= max_frames:
                    return
                yield i, bgr[..., ::-1], fps
                count += 1
            i += 1
    finally:
        cap.release()


def main(argv=None) -> None:
    from ..media.colormap import colorize_depth, side_by_side
    from ..media.native import VideoWriter
    from ..models.convert import load_or_init_depth_params
    from ..serving import DepthServingEngine

    p = argparse.ArgumentParser()
    p.add_argument("--encoder", default="vitl",
                   choices=["vits", "vitb", "vitl", "vitg", "vitt"])
    p.add_argument("--load-from", default=None)
    p.add_argument("--max-depth", type=float, default=20.0)
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output", required=True,
                   help="output video (.avi or .mp4; MJPEG either way)")
    p.add_argument("--input-size", type=int, default=518)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--every-n", type=int, default=1,
                   help="process every Nth frame")
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--side-by-side", action="store_true",
                   help="original | divider | depth composite (run.py "
                        "--pred-only off semantics)")
    p.add_argument("--grayscale", action="store_true")
    p.add_argument("--quality", type=int, default=90,
                   help="output JPEG quality")
    p.add_argument("--fps", type=float, default=None,
                   help="override output fps (default: input fps / every_n)")
    p.add_argument("--token-merge", type=float, default=0.0,
                   help="ToMe token-merge fraction (opt-in speed mode)")
    p.add_argument("--int8", action="store_true",
                   help="dynamic-int8 encoder matmuls (opt-in speed mode)")
    p.add_argument("--int8-calib", type=int, default=0, metavar="K",
                   help="with --int8: freeze static activation scales "
                        "from the first K device batches, then run the "
                        "whole video through the frozen program")
    args = p.parse_args(argv)
    if args.every_n < 1:
        p.error("--every-n must be >= 1")
    if args.int8_calib and not args.int8:
        p.error("--int8-calib requires --int8")

    model, params = load_or_init_depth_params(args.encoder, args.max_depth,
                                              args.load_from,
                                              token_merge=args.token_merge,
                                              quant_int8=args.int8)
    out_dir = os.path.dirname(os.path.abspath(args.output))
    os.makedirs(out_dir, exist_ok=True)

    writer = None
    n_out = 0
    try:
        with DepthServingEngine(model, params, input_size=args.input_size,
                                batch_size=args.batch_size,
                                calib_batches=args.int8_calib) as engine:
            def render(rgb: np.ndarray, depth: np.ndarray) -> np.ndarray:
                vis = colorize_depth(depth, grayscale=args.grayscale,
                                     bgr=False)
                return side_by_side(rgb, vis) if args.side_by_side else vis

            def emit(rgb0: np.ndarray, fut) -> None:
                nonlocal writer, n_out
                frame = render(rgb0, fut.result())
                if writer is None:
                    fps = args.fps or max(
                        (fps_in or 30.0) / args.every_n, 1e-3)
                    writer = VideoWriter(args.output, frame.shape[1],
                                         frame.shape[0], fps=fps)
                writer.write_rgb(frame, quality=args.quality)
                n_out += 1

            # Bounded in-flight window: decode/encode overlap device
            # compute without buffering the whole video in host memory.
            window = max(2 * args.batch_size, 2)
            pending: list[tuple[np.ndarray, object]] = []
            fps_in = None
            for _, rgb, fps_in in _frames(args.input, args.every_n,
                                          args.max_frames):
                # engine.submit expects BGR (the cv2/serve convention)
                pending.append((rgb, engine.submit(rgb[..., ::-1])))
                if len(pending) >= window:
                    emit(*pending.pop(0))
            for rgb0, fut in pending:
                emit(rgb0, fut)
    finally:
        # Finalize the container even on a mid-stream failure (engine
        # error, disk full, Ctrl-C): an unfinalized MP4 loses ALL
        # already-encoded frames; a finalized one is merely truncated.
        if writer is not None:
            writer.close()
    if n_out == 0:
        raise SystemExit(f"[video_depth] no frames decoded from "
                         f"{args.input}")
    print(f"[video_depth] wrote {n_out} frames -> {args.output}")


if __name__ == "__main__":
    main()
