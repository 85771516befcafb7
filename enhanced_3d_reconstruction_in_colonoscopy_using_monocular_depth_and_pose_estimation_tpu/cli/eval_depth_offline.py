"""Offline SimCol challenge-format depth evaluation — the reference's
``eval_for_depth.py``.

Usage:
    python -m ...cli.eval_depth_offline [--input-path ./datasets/SyntheticColon/]
        [--size 475] [--no-strict]

Parity with ``/root/reference/eval_for_depth.py``:
- the 9 fixed ``_OP`` test trajectories must be complete (601 frames for
  SyntheticColon_I, 1201 for II/III; ``:144-154``) unless ``--no-strict``;
- predictions: grayscale PNG /255; GT: 16-bit min-max normalized
  (``:56-98``); prediction shape asserted (default 475x475, ``:14-23``);
- per-trajectory and overall mean L1 / AbsRel / delta<1.1 / RMSE
  (``:117-214``). The reference's "overall" accidentally reports only the
  LAST trajectory's values (``:215-224`` uses the loop variables); here the
  overall is a true mean over all trajectories (divergence documented).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

TEST_FOLDERS = [
    "SyntheticColon_I/Frames_S5_OP",
    "SyntheticColon_I/Frames_S10_OP",
    "SyntheticColon_I/Frames_S15_OP",
    "SyntheticColon_II/Frames_B5_OP",
    "SyntheticColon_II/Frames_B10_OP",
    "SyntheticColon_II/Frames_B15_OP",
    "SyntheticColon_III/Frames_O1_OP",
    "SyntheticColon_III/Frames_O2_OP",
    "SyntheticColon_III/Frames_O3_OP",
]


def load_depth(pred_file: str, gt_file: str, expect_size: int):
    import cv2

    gt = cv2.imread(gt_file.replace("FrameBuffer", "Depth"),
                    cv2.IMREAD_UNCHANGED).astype(np.float32)
    gt = (gt - gt.min()) / max(gt.max() - gt.min(), 1e-12)
    pred = cv2.imread(pred_file, cv2.IMREAD_GRAYSCALE).astype(np.float32)
    pred = pred / 255.0
    valid_mask = ~np.isnan(gt)
    gt[~valid_mask] = 0

    if expect_size and pred.shape != (expect_size, expect_size):
        raise AssertionError(
            f"Wrong size of predicted depth, expected "
            f"[{expect_size},{expect_size}], got {list(pred.shape)}")
    if gt.shape != pred.shape:
        gt = cv2.resize(gt, (pred.shape[1], pred.shape[0]),
                        interpolation=cv2.INTER_LINEAR)
        # The mask must live on the RESIZED grid (--no-strict allows a
        # pred/GT size mismatch; a GT-native mask would mis-index or
        # crash boolean indexing on pred).
        valid_mask = cv2.resize(valid_mask.astype(np.uint8),
                                (pred.shape[1], pred.shape[0]),
                                interpolation=cv2.INTER_NEAREST
                                ).astype(bool)
    return pred, gt, valid_mask


def eval_depth(pred, gt, valid_mask):
    """Reference metric formulas (eval_for_depth.py:117-141)."""
    pred_v = pred[valid_mask]
    gt_v = gt[valid_mask]
    eps = 1e-6
    diff = pred_v - gt_v
    denom_ok = (gt_v >= 1e-6) & (gt_v <= 1.0)
    l1 = np.mean(np.abs(diff))
    abs_rel = np.mean(np.abs(diff)[denom_ok] / (gt_v[denom_ok] + eps))
    rmse = np.sqrt(np.mean(diff ** 2))
    thresh = np.maximum(gt_v / (pred_v + eps), (pred_v + eps) / (gt_v + eps))
    d1 = np.mean(thresh < 1.1)
    return l1, abs_rel, d1, rmse


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input-path", default="./datasets/SyntheticColon/")
    p.add_argument("--size", type=int, default=475)
    p.add_argument("--no-strict", action="store_true",
                   help="skip frame-count completeness asserts")
    args = p.parse_args(argv)

    root = args.input_path
    folders = [t for t in TEST_FOLDERS
               if os.path.isdir(os.path.join(root, t))] \
        if args.no_strict else TEST_FOLDERS

    # Enumerate once: the completeness check and the eval loop must see
    # the SAME file set (drifting duplicate globs could pass the strict
    # count while evaluating different files).
    traj_files: dict[str, list[str]] = {}
    for traj in folders:
        traj_dir = os.path.join(root, traj)
        assert os.path.exists(traj_dir), f"No input folder found: {traj_dir}"
        files = sorted(glob.glob(os.path.join(traj_dir, "Depth*.png"))) or \
            sorted(glob.glob(os.path.join(traj_dir, "FrameBuffer*.png")))
        traj_files[traj] = files
        if not args.no_strict:
            expect = 601 if "SyntheticColon_I/" in traj + "/" else 1201
            assert len(files) == expect, f"Predictions missing in {traj}"

    overall = {k: [] for k in ("l1", "abs_rel", "d1", "rmse")}
    for traj in folders:
        files = traj_files[traj]
        stats = {k: [] for k in ("l1", "abs_rel", "d1", "rmse")}
        gt_dir = os.path.join(root, traj[:-3] if traj.endswith("_OP")
                              else traj)
        for path in files:
            gt_path = os.path.join(gt_dir, os.path.basename(path))
            pred, gt, mask = load_depth(path, gt_path,
                                        0 if args.no_strict else args.size)
            l1, abs_rel, d1, rmse = eval_depth(pred, gt, mask)
            for k, v in zip(("l1", "abs_rel", "d1", "rmse"),
                            (l1, abs_rel, d1, rmse)):
                stats[k].append(v)
        print(f"Results for trajectory {traj}:")
        for k in stats:
            print(f"  Mean {k}: {np.mean(stats[k]):.6f}")
            overall[k].append(float(np.mean(stats[k])))

    print("\nOverall Results (mean over trajectories):")
    for k in overall:
        print(f"  {k}: {np.mean(overall[k]):.6f}")


if __name__ == "__main__":
    main()
