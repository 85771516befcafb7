"""Batch metric calculation over prediction dirs — the reference's
``calculate_metrics.py``.

Usage:
    python -m ...cli.calc_metrics [--dataset-root ./datasets/SyntheticColon/]

Parity with ``/root/reference/calculate_metrics.py``: walks every
``SyntheticColon_*/Frames_*`` vs its ``Frames_*_OP`` prediction dir, loads
16-bit depths as mm and converts to meters (/1000, ``:9-14``), masks
invalid pixels (zero/inf), computes delta1.25/1.25^2/1.25^3, rmse, mae,
abs_rel (|d|.mean / gt.mean) and sq_rel (``:17-55``), then per-procedure /
per-colon / overall averages (``:128-163``).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

METRICS = ("rmse", "mae", "abs_rel", "sq_rel", "delta1", "delta2", "delta3")


def load_depth_map(path: str) -> np.ndarray:
    import cv2

    depth = cv2.imread(path, cv2.IMREAD_ANYDEPTH)
    if depth is None:
        raise ValueError(f"Could not load depth map: {path}")
    return depth.astype(np.float32) / 1000.0  # mm -> m


def calculate_metrics(gt: np.ndarray, pred: np.ndarray) -> dict[str, float]:
    valid = (gt > 0) & (pred > 0) & np.isfinite(gt) & np.isfinite(pred)
    gt, pred = gt[valid], pred[valid]
    if len(gt) == 0:
        return {k: float("nan") for k in METRICS}
    thresh = np.maximum(gt / pred, pred / gt)
    return {
        "rmse": float(np.sqrt(((gt - pred) ** 2).mean())),
        "mae": float(np.abs(gt - pred).mean()),
        "abs_rel": float(np.abs(gt - pred).mean() / gt.mean()),
        "sq_rel": float(((gt - pred) ** 2).mean() / gt.mean()),
        "delta1": float((thresh < 1.25).mean()),
        "delta2": float((thresh < 1.25 ** 2).mean()),
        "delta3": float((thresh < 1.25 ** 3).mean()),
    }


def process_scene(gt_folder: str, pred_folder: str) -> dict | None:
    rows = []
    for gt_file in sorted(glob.glob(os.path.join(gt_folder, "*.png"))):
        pred_file = os.path.join(pred_folder, os.path.basename(gt_file))
        if not os.path.exists(pred_file):
            print(f"Warning: Missing prediction for "
                  f"{os.path.basename(gt_file)}")
            continue
        rows.append(calculate_metrics(load_depth_map(gt_file),
                                      load_depth_map(pred_file)))
    if not rows:
        return None
    return {k: float(np.mean([r[k] for r in rows])) for k in METRICS}


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset-root", default="./datasets/SyntheticColon/")
    args = p.parse_args(argv)

    all_metrics = []
    for colon_dir in sorted(glob.glob(os.path.join(args.dataset_root,
                                                   "SyntheticColon_*"))):
        colon = os.path.basename(colon_dir)
        results = {}
        for proc_dir in sorted(glob.glob(os.path.join(colon_dir,
                                                      "Frames_*"))):
            if proc_dir.endswith("_OP"):
                continue
            pred_dir = proc_dir + "_OP"
            if not os.path.exists(pred_dir):
                print(f"Warning: Missing predictions directory for "
                      f"{os.path.basename(proc_dir)}")
                continue
            scene = process_scene(proc_dir, pred_dir)
            if scene:
                results[os.path.basename(proc_dir)] = scene

        if not results:
            continue
        print(f"\nResults for {colon}:")
        for proc, metrics in results.items():
            print(f"  {proc}: " + " ".join(
                f"{k}={v:.4f}" for k, v in metrics.items()))
        avg = {k: float(np.mean([m[k] for m in results.values()]))
               for k in METRICS}
        print(f"  [avg {colon}] " + " ".join(
            f"{k}={v:.4f}" for k, v in avg.items()))
        all_metrics.extend(results.values())

    if all_metrics:
        print("\nOverall Average:")
        for k in METRICS:
            print(f"  {k}: {np.mean([m[k] for m in all_metrics]):.4f}")


if __name__ == "__main__":
    main()
