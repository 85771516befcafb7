"""Pose-pair dataset: consecutive RGB-D frames + GT relative pose.

Parity with ``/root/reference/data_processing/pose_estimation.py``:

- per procedure folder: frames + ``SavedPosition_*.txt`` (N, 3) +
  ``SavedRotationQuaternion_*.txt`` (N, 4); missing files warn and skip
  (``:137-141``); frame-count mismatches truncate to the minimum
  (``:111-124``);
- item = consecutive pair, channels [rgb1, d1, rgb2, d2] -> 8 x H x W
  (here HWC: (H, W, 8)) with RGB /255, depth /65535, resized + normalized;
- target = relative pose: unit-norm delta-translation and relative
  quaternion ``q2 * conj(q1)`` (``:256-302``) — computed with
  ``ops.quaternion.relative_pose`` formulas in numpy;
- pairs never straddle procedure boundaries (the reference's flat
  ``len-1`` indexing lets the last frame of one procedure pair with the
  first of the next — a latent cross-procedure artifact we fix; divergence
  documented).

ImageNet normalization is applied host-side here (pose batches are small:
the reference trains this task full-precision with plain transforms).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from . import io as dio
from .loader import PrefetchLoader
from .preprocess import host_resize_depth, host_resize_image
from ..ops.augment import IMAGENET_MEAN, IMAGENET_STD


def relative_pose_np(p1, q1, p2, q2, eps: float = 1e-8) -> np.ndarray:
    """Reference relative-pose computation (pose_estimation.py:256-302)."""
    rel_t = p2 - p1
    rel_t = rel_t / (np.linalg.norm(rel_t) + eps)
    q1_inv = q1 * np.array([-1.0, -1.0, -1.0, 1.0], np.float32)
    x1, y1, z1, w1 = q1_inv
    x2, y2, z2, w2 = q2
    rel_q = np.array([
        x2 * w1 + y2 * z1 - z2 * y1 + w2 * x1,
        -x2 * z1 + y2 * w1 + z2 * x1 + w2 * y1,
        x2 * y1 - y2 * x1 + z2 * w1 + w2 * z1,
        -x2 * x1 - y2 * y1 - z2 * z1 + w2 * w1,
    ], np.float32)
    rel_q = rel_q / max(np.linalg.norm(rel_q), eps)
    return np.concatenate([rel_t, rel_q]).astype(np.float32)


class PoseDataset:
    def __init__(self, data_dir: str, data_list: str, size: int, mode: str,
                 ds_type: str = "simcol"):
        if mode not in ("Train", "Val", "Test"):
            raise ValueError("Mode must be one of: 'Train', 'Val', 'Test'")
        self.data_dir = data_dir
        self.size = size
        self.mode = mode
        self.ds_type = ds_type

        self.rgb_paths: list[str] = []
        self.depth_paths: list[str] = []
        self.poses: list[np.ndarray] = []
        self._pair_indices: list[int] = []

        for folder in dio.read_split_list(data_list):
            folder_path = os.path.join(data_dir, folder)
            depth_frames, rgb_frames = dio.load_frames(folder_path)
            loaded = dio.load_pose_files(data_dir, folder)
            if loaded is None:
                print(f"Warning: Position file not found for {folder}")
                continue
            positions, orientations = loaded
            n = min(len(positions), len(orientations),
                    len(rgb_frames), len(depth_frames))
            positions, orientations = positions[:n], orientations[:n]
            rgb_frames, depth_frames = rgb_frames[:n], depth_frames[:n]
            poses = list(np.concatenate([positions, orientations], axis=1))

            orig_idx = list(range(n))
            if mode == "Val":
                # Filter blacklisted frames PER FOLDER, before pair
                # construction, keeping original frame numbers so pairs
                # never span a removed gap (the reference's post-hoc
                # removal leaves stale indices; divergence documented).
                bad = {os.path.join(data_dir, f)
                       for f in dio.BAD_VAL_FRAMES}
                keep = [i for i, p in enumerate(rgb_frames) if p not in bad]
                rgb_frames = [rgb_frames[i] for i in keep]
                depth_frames = [depth_frames[i] for i in keep]
                poses = [poses[i] for i in keep]
                orig_idx = keep
                n = len(rgb_frames)

            start = len(self.rgb_paths)
            self.rgb_paths.extend(rgb_frames)
            self.depth_paths.extend(depth_frames)
            self.poses.extend(poses)
            # consecutive pairs within this procedure only — and only
            # truly consecutive original frames (no blacklist gaps)
            self._pair_indices.extend(
                start + j for j in range(n - 1)
                if orig_idx[j + 1] == orig_idx[j] + 1)

        assert len(self.rgb_paths) == len(self.depth_paths) == len(self.poses)

    def __len__(self) -> int:
        return len(self._pair_indices)

    def _load_frame(self, idx: int) -> np.ndarray:
        rgb = host_resize_image(dio.decode_rgb(self.rgb_paths[idx]),
                                self.size)
        rgb = (rgb - IMAGENET_MEAN) / IMAGENET_STD
        depth = host_resize_depth(
            dio.decode_depth16_png(self.depth_paths[idx]), self.size)
        return np.concatenate([rgb, depth[..., None]], axis=-1)  # (H, W, 4)

    def __getitem__(self, index: int) -> dict[str, Any]:
        idx = self._pair_indices[index]
        frame1 = self._load_frame(idx)
        frame2 = self._load_frame(idx + 1)
        inp = np.concatenate([frame1, frame2], axis=-1).astype(np.float32)

        pose1, pose2 = self.poses[idx], self.poses[idx + 1]
        target = relative_pose_np(pose1[:3], pose1[3:], pose2[:3], pose2[3:])

        parts = os.path.normpath(self.rgb_paths[idx]).split(os.path.sep)
        return {
            "dataset": "/".join(parts[-3:-1]),
            "id": parts[-1],
            "input": inp,            # (H, W, 8)
            "target": target,        # (7,)
        }


class PoseDataModule:
    def __init__(self, data_dir: str, train_list: str, val_list: str,
                 test_list: str, ds_type: str = "simcol",
                 batch_size: int = 64, num_workers: int = 8, size: int = 518,
                 seed: int = 42, **_unused):
        self.data_dir = data_dir
        self.train_list = train_list
        self.val_list = val_list
        self.test_list = test_list
        self.ds_type = ds_type
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.size = size
        self.seed = seed
        self.train_dataset = None
        self.val_dataset = None
        self.test_dataset = None

    def setup(self, stage: str | None = None) -> None:
        if stage in ("fit", None):
            self.train_dataset = PoseDataset(
                self.data_dir, self.train_list, self.size, "Train",
                self.ds_type)
            self.val_dataset = PoseDataset(
                self.data_dir, self.val_list, self.size, "Val", self.ds_type)
        if stage in ("test", None):
            self.test_dataset = PoseDataset(
                self.data_dir, self.test_list, self.size, "Test",
                self.ds_type)

    def train_loader(self) -> PrefetchLoader:
        return PrefetchLoader(self.train_dataset, self.batch_size,
                              shuffle=True, drop_last=True,
                              num_threads=self.num_workers, seed=self.seed)

    def val_loader(self) -> PrefetchLoader:
        # Every process walks the FULL val/test sequence: trajectory
        # composition (evaluate_trajectory) needs contiguous frame order,
        # which process-interleaved batches would break.
        return PrefetchLoader(self.val_dataset, self.batch_size,
                              shuffle=False, drop_last=False,
                              num_threads=self.num_workers,
                              process_count=1)

    def test_loader(self) -> PrefetchLoader:
        return PrefetchLoader(self.test_dataset, self.batch_size,
                              shuffle=False, drop_last=False,
                              num_threads=self.num_workers,
                              process_count=1)
