"""Video -> frames CLI — the reference's ``video_to_images.py``.

Usage:
    python -m ...cli.video_to_images --video_path v.mp4 --output_dir out/ \
        [--config configs/video_to_image_config.yaml] [--start_time S]
        [--end_time S] [--test] [--test_frames N]

YAML config merged with CLI overrides (``video_to_images.py:141-160``).
"""

from __future__ import annotations

import argparse

import yaml

from ..media.video import video_to_frames


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    p.add_argument("--video_path", default=None)
    p.add_argument("--output_dir", default=None)
    p.add_argument("--start_time", type=float, default=None)
    p.add_argument("--end_time", type=float, default=None)
    p.add_argument("--test", action="store_true")
    p.add_argument("--test_frames", type=int, default=10)
    args = p.parse_args(argv)

    cfg: dict = {}
    if args.config:
        with open(args.config, "r", encoding="utf-8") as f:
            cfg = yaml.safe_load(f) or {}
    # CLI overrides win over the YAML (reference merge order).
    for key in ("video_path", "output_dir", "start_time", "end_time"):
        val = getattr(args, key)
        if val is not None:
            cfg[key] = val

    if not cfg.get("video_path") or not cfg.get("output_dir"):
        raise SystemExit("video_path and output_dir are required "
                         "(via --config or flags)")

    n = video_to_frames(
        cfg["video_path"], cfg["output_dir"],
        start_time=float(cfg.get("start_time") or 0.0),
        end_time=cfg.get("end_time"),
        crop=cfg.get("crop"),
        test=args.test, test_frames=args.test_frames)
    print(f"[video_to_images] wrote {n} frames to {cfg['output_dir']}")


if __name__ == "__main__":
    main()
