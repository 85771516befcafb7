"""Export the batched depth-inference program as a StableHLO artifact.

Deployment counterpart of ``cli/serve.py`` (no reference equivalent —
the reference re-builds the torch model from source at every use,
``run.py:120-147``): trace the full preprocess+forward+resize-back
program once at a fixed (batch, H, W), serialize it with ``jax.export``,
and serve it later with ``serving.export.load_exported`` — no model
code, no re-trace, weights stay in the Orbax checkpoint.

Usage:
    python -m ...cli.export_model --encoder vitl --load-from ckpt \
        --frame-hw 475 1000 --batch-size 8 -o vitl_475x1000.stablehlo \
        [--check]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> None:
    from ..models.convert import load_or_init_depth_params
    from ..serving.export import export_depth_program, load_exported

    p = argparse.ArgumentParser()
    p.add_argument("--encoder", default="vitl",
                   choices=["vits", "vitb", "vitl", "vitg", "vitt"])
    p.add_argument("--load-from", default=None)
    p.add_argument("--max-depth", type=float, default=20.0)
    p.add_argument("--frame-hw", type=int, nargs=2, metavar=("H", "W"),
                   help="camera resolution the inference program is "
                        "fixed to (SimCol: 475 1000); required unless "
                        "--train")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--input-size", type=int, default=518)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--token-merge", type=float, default=0.0)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--int8-calib", type=int, default=0, metavar="K",
                   help="with --int8 and --calib-frames: bake static "
                        "activation scales from the first K device "
                        "batches into the artifact (frozen-scale "
                        "program; sidecar records the amax vector)")
    p.add_argument("--calib-frames", default=None, metavar="DIR",
                   help="directory of frames at --frame-hw resolution "
                        "used for --int8-calib")
    p.add_argument("--check", action="store_true",
                   help="replay the artifact on random frames and report "
                        "the max deviation vs the live model")
    p.add_argument("--train", action="store_true",
                   help="export the TRAIN step instead of inference "
                        "(a restarted fine-tune skips the compile)")
    p.add_argument("--grad-accum", type=int, default=3,
                   help="train export: grad-accum window (bench layout "
                        "is bs8 x accum3)")
    p.add_argument("--microbatch", type=int, default=8,
                   help="train export: per-microbatch batch size")
    p.add_argument("--total-steps", type=int, default=1000,
                   help="train export: OneCycle horizon baked into the "
                        "schedule (must match the resumed run)")
    args = p.parse_args(argv)

    if args.train:
        _export_train(args)
        return
    if args.frame_hw is None:
        p.error("--frame-hw is required for inference export")

    if args.int8_calib:
        if not args.int8:
            p.error("--int8-calib requires --int8")
        if not args.calib_frames:
            p.error("--int8-calib requires --calib-frames DIR")

    model, params = load_or_init_depth_params(args.encoder, args.max_depth,
                                              args.load_from,
                                              token_merge=args.token_merge,
                                              quant_int8=args.int8)
    calib_frames = None
    if args.int8_calib:
        calib_frames = _load_calib_frames(
            args.calib_frames, args.int8_calib * args.batch_size)
        if not calib_frames:
            raise SystemExit(f"[export] no readable frames in "
                             f"{args.calib_frames}")
    meta = export_depth_program(model, params, args.output,
                                frame_hw=tuple(args.frame_hw),
                                batch_size=args.batch_size,
                                input_size=args.input_size,
                                calib_frames=calib_frames,
                                calib_batches=args.int8_calib)
    calib_note = (f", int8-calib over {len(calib_frames)} frames"
                  if calib_frames else "")
    print(f"[export] {args.output}: {meta['artifact_bytes']} bytes, "
          f"platforms={meta['platforms']}, frame={meta['frame_hw']}, "
          f"net={meta['net_hw']}, batch={meta['batch_size']}{calib_note}")

    if args.check:
        prog = load_exported(args.output)
        rng = np.random.default_rng(0)
        frames = rng.random((args.batch_size, *args.frame_hw, 3),
                            np.float32)
        got = np.asarray(prog(params, frames))
        from ..serving.export import _program

        import jax

        ref_fn = _program(model, tuple(meta["net_hw"]),
                          tuple(meta["frame_hw"]))
        if meta.get("int8_calib_amax"):
            # The artifact runs frozen scales; compare against the same
            # frozen-scale live program, not the dynamic-quant one.
            from ..ops.quant import with_frozen_scales

            ref_fn = with_frozen_scales(
                ref_fn, np.asarray(meta["int8_calib_amax"], np.float32))
        ref = np.asarray(jax.jit(ref_fn)(params, frames))
        dev = float(np.abs(got - ref).max())
        print(f"[export] replay check: max |exported - live| = {dev:.3e}")
        if not np.isfinite(got).all() or dev > 1e-3 * max(
                float(np.abs(ref).max()), 1.0):
            raise SystemExit("[export] replay check FAILED")


def _load_calib_frames(dirpath: str, n: int) -> list:
    """First ``n`` decodable frames from a directory (sorted), BGR
    uint8 — same decode path as the infer CLI."""
    import glob as globlib

    from .infer import _imread_bgr

    frames = []
    for path in sorted(
            f for pat in ("*.png", "*.jpg", "*.jpeg")
            for f in globlib.glob(os.path.join(dirpath, pat))):
        raw = _imread_bgr(path)
        if raw is not None:
            frames.append(raw)
        if len(frames) >= n:
            break
    return frames


def _export_train(args) -> None:
    """Export the depth TRAIN step (state, batch) -> (state, metrics)."""
    import jax

    from ..serving.export import export_train_step
    from ..train.depth_task import DepthTask

    if args.int8 or args.token_merge:
        raise SystemExit("[export] --train does not compose with the "
                         "inference speed dials (--int8/--token-merge)")
    task = DepthTask(encoder=args.encoder, max_depth=args.max_depth,
                     total_steps=args.total_steps,
                     grad_accum=args.grad_accum)
    hw = (args.input_size, args.input_size)
    state = task.init_state(jax.random.PRNGKey(0), hw,
                            fill_value=0.01)
    meta = export_train_step(task, state, args.output,
                             microbatch=args.microbatch, image_hw=hw)
    print(f"[export] {args.output}: {meta['artifact_bytes']} bytes, "
          f"platforms={meta['platforms']}, train step "
          f"accum{meta['grad_accum']} x bs{meta['microbatch']} @ "
          f"{meta['image_hw']}")


if __name__ == "__main__":
    main()
