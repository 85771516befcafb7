"""Dataset mean/std statistics — the reference's ``calculate_stats.py``.

Usage:
    python -m ...cli.calc_stats --ds simcol --data-dir <root> \
        --train-list <txt> [--size 518] [--batch-size 16]

Parity with ``/root/reference/calculate_stats.py``: running sum /
sum-of-squares over denormalized RGB (per channel) and over valid depth
pixels (``:23-60``).
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None) -> None:
    from ..data.c3vd import C3VDDataset
    from ..data.loader import PrefetchLoader
    from ..data.simcol import SimColDataset

    p = argparse.ArgumentParser()
    p.add_argument("--ds", default="simcol", choices=["simcol", "c3vd"])
    p.add_argument("--data-dir", required=True)
    p.add_argument("--train-list", required=True)
    p.add_argument("--size", type=int, default=518)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--num-workers", type=int, default=8)
    args = p.parse_args(argv)

    # host_resize=True: the reference computes stats over the RESIZED
    # size x size tensors (calculate_stats.py transform pipeline) —
    # native-resolution stats would differ (antialias low-passes
    # variance) and --size would be a silent no-op.
    cls = SimColDataset if args.ds == "simcol" else C3VDDataset
    dataset = cls(args.data_dir, args.train_list, args.size, "Train",
                  args.ds, host_resize=True)

    psum = np.zeros(3)
    psum_sq = np.zeros(3)
    dsum = dsum_sq = 0.0
    n_px = 0
    n_d = 0
    loader = PrefetchLoader(dataset, args.batch_size,
                            num_threads=args.num_workers)
    for batch in loader:
        imgs = batch["image"]
        if imgs.dtype == np.uint8:
            imgs = imgs.astype(np.float32) / 255.0
        deps = batch["depth"]
        if deps.dtype == np.uint16:
            deps = deps.astype(np.float32) / 65535.0
        psum += imgs.sum(axis=(0, 1, 2))
        psum_sq += (imgs ** 2).sum(axis=(0, 1, 2))
        n_px += imgs.shape[0] * imgs.shape[1] * imgs.shape[2]
        valid = (deps > 0) & np.isfinite(deps)
        dsum += float(deps[valid].sum())
        dsum_sq += float((deps[valid] ** 2).sum())
        n_d += int(valid.sum())

    rgb_mean = psum / n_px
    rgb_std = np.sqrt(psum_sq / n_px - rgb_mean ** 2)
    d_mean = dsum / max(n_d, 1)
    d_std = float(np.sqrt(dsum_sq / max(n_d, 1) - d_mean ** 2))
    print(f"[{args.ds}] RGB mean: {rgb_mean}")
    print(f"[{args.ds}] RGB std:  {rgb_std}")
    print(f"[{args.ds}] depth mean: {d_mean:.6f} std: {d_std:.6f} "
          f"(valid px: {n_d})")


if __name__ == "__main__":
    main()
