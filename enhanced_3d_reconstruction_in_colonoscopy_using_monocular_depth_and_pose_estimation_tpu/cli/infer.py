"""Single/batch depth inference CLI — the reference's ``run.py``.

Usage:
    python -m ...cli.infer --encoder vitl --load-from ckpt.pth \
        --max-depth 20 -i images_dir -d testing [-o outdir] \
        [--input-size 518] [--save-numpy] [--pred-only] [--grayscale]

Parity with ``/root/reference/run.py``: input enumeration (single file /
txt list / SimCol glob / ``frame_*.jpg``), checkpoint prefix fixups,
``infer_image`` per frame, skip-existing idempotence, min-max colormap
output with optional side-by-side composite, ``_OP`` output-dir convention.
"""

from __future__ import annotations

import argparse
import glob
import os
from pathlib import Path

import numpy as np


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Depth Anything V2 (TPU)")
    p.add_argument("--encoder", default="vitl",
                   choices=["vits", "vitb", "vitl", "vitg", "vitt"])
    p.add_argument("--load-from", required=False, default=None)
    p.add_argument("--max-depth", type=float, default=20.0)
    p.add_argument("-i", "--img-path", required=True)
    p.add_argument("-o", "--outdir", default=None)
    p.add_argument("--input-size", type=int, default=518)
    p.add_argument("-d", "--ds_type", default="testing",
                   choices=["simcol", "testing"])
    p.add_argument("--save-numpy", action="store_true")
    p.add_argument("--pred-only", action="store_true")
    p.add_argument("--grayscale", action="store_true")
    p.add_argument("--token-merge", type=float, default=0.0,
                   help="ToMe token-merge fraction (0=off; opt-in speed "
                        "mode, see README for measured speed/accuracy)")
    p.add_argument("--int8", action="store_true",
                   help="dynamic-int8 encoder matmuls (opt-in speed mode "
                        "riding the MXU 2x int8 rate, see README)")
    p.add_argument("--int8-calib", type=int, default=0, metavar="K",
                   help="with --int8 and --batch-size>1: freeze static "
                        "activation scales from the first K device "
                        "batches instead of quantizing dynamically")
    p.add_argument("--batch-size", type=int, default=1,
                   help=">1 batches same-resolution frames on device "
                        "(TPU-native extension; 1 = reference per-frame)")
    return p.parse_args(argv)


def enumerate_inputs(args) -> list[str]:
    """run.py:151-187 input enumeration."""
    filenames: list[str] = []
    if os.path.isfile(args.img_path):
        if args.img_path.endswith("txt"):
            with open(args.img_path, "r", encoding="utf-8") as f:
                filenames = [line for line in f.read().splitlines() if line]
            if args.outdir is None:
                args.outdir = str(Path(args.img_path).parent)
        else:
            filenames = [args.img_path]
            if args.outdir is None:
                args.outdir = str(Path(args.img_path).parent)
    elif args.ds_type == "simcol":
        base = Path(args.img_path)
        for suffix in ["I", "II", "III"]:
            pattern = f"SyntheticColon_{suffix}/Frames_*/FrameBuffer_*.png"
            filenames.extend(sorted(glob.glob(str(base / pattern))))
        if args.outdir is None:
            args.outdir = str(base)
    else:
        base = Path(args.img_path)
        filenames.extend(sorted(glob.glob(str(base / "frame_*.jpg"))))
        if args.outdir is None:
            args.outdir = str(base)
    return filenames


def output_paths(args, filename: str) -> tuple[Path, str]:
    """run.py:195-230 output layout (incl. the _OP convention)."""
    base_name = Path(filename).stem
    if os.path.isfile(args.img_path):
        return Path(args.outdir), base_name
    if args.ds_type == "simcol":
        rel = Path(filename).relative_to(Path(args.img_path))
        parent = rel.parent
        return (Path(args.img_path) / parent.parent / f"{parent.name}_OP",
                base_name)
    rel = Path(filename).relative_to(Path(args.img_path))
    return Path(args.outdir) / rel.parent, base_name


def _imread_bgr(path: str):
    """Decode an input frame to BGR uint8 via the native C++ decoders
    (PNG: data/native, JPEG: media/native), cv2 fallback; None if
    unreadable (cv2.imread convention, run.py:233)."""
    try:
        from ..data.io import decode_rgb

        return np.ascontiguousarray(decode_rgb(path)[..., ::-1])
    except Exception:
        import cv2

        return cv2.imread(path)


def main(argv=None) -> None:
    from ..core.debug import enable_compilation_cache

    enable_compilation_cache()
    import cv2

    from ..media.colormap import colorize_depth, side_by_side
    from ..models.convert import load_or_init_depth_params
    from ..models.depth_anything import infer_image

    args = parse_args(argv)
    if args.int8_calib and (not args.int8 or args.batch_size < 2):
        raise SystemExit("--int8-calib requires --int8 and --batch-size>1")
    model, params = load_or_init_depth_params(args.encoder, args.max_depth,
                                              args.load_from,
                                              token_merge=args.token_merge,
                                              quant_int8=args.int8)

    filenames = enumerate_inputs(args)
    os.makedirs(args.outdir, exist_ok=True)
    if args.batch_size == 1 and len(filenames) > 8:
        print("Hint: --batch-size 1 is the reference-parity per-frame loop "
              "(~10x slower on TPU than batched inference; "
              "--batch-size 64 measured fastest per frame on v5e).")

    # Skip-existing first (run.py:224-230 idempotence).
    todo = []
    skipped = 0
    for filename in filenames:
        out_folder, base_name = output_paths(args, filename)
        if (out_folder / f"{base_name}.png").exists():
            skipped += 1
        else:
            todo.append((filename, out_folder, base_name))

    def write_outputs(filename, out_folder, base_name, raw, depth):
        out_folder.mkdir(parents=True, exist_ok=True)
        if args.save_numpy:
            np.save(str(out_folder / f"{base_name}.npy"), depth)
        rendered = colorize_depth(depth, grayscale=args.grayscale)
        png_path = out_folder / f"{base_name}.png"
        if args.pred_only:
            cv2.imwrite(str(png_path), rendered)
        else:
            cv2.imwrite(str(png_path), side_by_side(raw, rendered))

    unreadable = 0
    if args.batch_size > 1:
        from ..models.depth_anything import BatchedRunner

        # Stream in resolution-keyed chunks of batch_size: decode lazily,
        # flush each full chunk, never hold the whole input set in memory.
        # ONE compiled runner per resolution, built on the first flush —
        # with --int8-calib K the first K*batch_size frames are held back
        # so the static scales are calibrated ONCE and every later flush
        # reuses the same frozen-scale program (advisor r4 high: the old
        # per-chunk infer_images_batched call re-calibrated and
        # re-compiled on every chunk).
        chunks: dict[tuple, list] = {}
        runners: dict[tuple, BatchedRunner] = {}
        calib_hold = max(1, args.int8_calib) * args.batch_size

        def flush(shape, final=False):
            group = chunks.get(shape, [])
            if not group:
                return
            runner = runners.get(shape)
            if runner is None:
                if args.int8_calib and len(group) < calib_hold and not final:
                    return  # keep accumulating the calibration set
                runner = runners[shape] = BatchedRunner(
                    model, params, shape, args.input_size, args.batch_size,
                    calib_frames=[raw for _, raw in group],
                    calib_batches=args.int8_calib)
            chunks[shape] = []
            depths = runner([raw for _, raw in group])
            for (item, raw), depth in zip(group, depths):
                write_outputs(*item, raw, depth)

        for item in todo:
            raw = _imread_bgr(item[0])
            if raw is None:
                print(f"Warning: unreadable image skipped: {item[0]}")
                unreadable += 1
                continue
            shape = raw.shape[:2]
            chunks.setdefault(shape, []).append((item, raw))
            if len(chunks[shape]) >= args.batch_size:
                flush(shape)
        for shape in list(chunks):
            flush(shape, final=True)
    else:
        for filename, out_folder, base_name in todo:
            raw = _imread_bgr(filename)
            if raw is None:
                print(f"Warning: unreadable image skipped: {filename}")
                unreadable += 1
                continue
            depth = infer_image(model, params, raw, args.input_size)
            write_outputs(filename, out_folder, base_name, raw, depth)

    print("\nProcessing complete:")
    print(f"- Total files: {len(filenames)}")
    print(f"- Skipped existing: {skipped}")
    print(f"- Newly processed: {len(filenames) - skipped - unreadable}")


if __name__ == "__main__":
    main()
