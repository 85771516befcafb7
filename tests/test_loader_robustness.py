"""Loader edge cases found in review: slow consumer, abandoned iterator,
propagated decode errors; pose bad-frame gap handling; patience=0."""

import time

import numpy as np
import pytest

import e3d_tpu  # noqa: F401
from e3d_tpu.core.checkpoint import EarlyStopping
from e3d_tpu.data.loader import PrefetchLoader


class ToyDataset:
    def __init__(self, n=12, fail_at=None):
        self.n = n
        self.fail_at = fail_at

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.fail_at is not None and i == self.fail_at:
            raise RuntimeError(f"decode failure at {i}")
        return {"x": np.full((4,), i, np.int32)}


def test_slow_consumer_gets_all_batches_and_sentinel():
    loader = PrefetchLoader(ToyDataset(12), batch_size=2, num_threads=2,
                            prefetch=1)
    seen = []
    for batch in loader:
        time.sleep(0.03)  # slower than the producer
        seen.append(batch["x"][0, 0])
    assert len(seen) == 6  # iteration terminates (sentinel delivered)


def test_abandoned_iterator_does_not_leak_blocked_producer():
    loader = PrefetchLoader(ToyDataset(40), batch_size=2, num_threads=2,
                            prefetch=1)
    it = iter(loader)
    next(it)
    it.close()  # abandon mid-epoch
    # a fresh epoch still works
    assert sum(1 for _ in loader) == 20


def test_decode_error_propagates():
    loader = PrefetchLoader(ToyDataset(10, fail_at=5), batch_size=2,
                            num_threads=2, prefetch=1)
    with pytest.raises(RuntimeError, match="decode failure"):
        for _ in loader:
            time.sleep(0.02)


def test_patience_zero_stops_only_on_non_improving():
    stopper = EarlyStopping(patience=0)
    assert stopper.update(1.0) is False   # improving eval never stops
    assert stopper.update(0.9) is False
    assert stopper.update(0.95) is True   # first bad eval stops


def test_pose_pairs_skip_blacklist_gap(tmp_path):
    """Val pairs must not span removed frames (S14 blacklist)."""
    from e3d_tpu.data.pose import PoseDataset
    from e3d_tpu.data.synthetic import make_simcol_fixture

    root = make_simcol_fixture(str(tmp_path), n_procedures=1,
                               frames_per_proc=8, hw=32)
    # rename the single procedure to the blacklisted one (Frames_S14,
    # frames 59-61); rebuild with matching frame numbers
    import os
    import shutil

    base = os.path.join(root, "SyntheticColon_I")
    src = os.path.join(base, "Frames_S1")
    dst = os.path.join(base, "Frames_S14")
    os.rename(src, dst)
    for i in range(8):
        for prefix in ("FrameBuffer", "Depth"):
            os.rename(os.path.join(dst, f"{prefix}_{i:04d}.png"),
                      os.path.join(dst, f"{prefix}_{57 + i:04d}.png"))
    shutil.move(os.path.join(base, "SavedPosition_S1.txt"),
                os.path.join(base, "SavedPosition_S14.txt"))
    shutil.move(os.path.join(base, "SavedRotationQuaternion_S1.txt"),
                os.path.join(base, "SavedRotationQuaternion_S14.txt"))
    with open(os.path.join(root, "val.txt"), "w", encoding="utf-8") as f:
        f.write("SyntheticColon_I/Frames_S14")

    ds = PoseDataset(root, os.path.join(root, "val.txt"), size=32,
                     mode="Val")
    # frames 57..64, blacklist removes 59,60,61 -> kept 57,58,62,63,64
    # consecutive pairs: (57,58), (62,63), (63,64)
    assert len(ds) == 3
    ids = {ds[i]["id"] for i in range(len(ds))}
    assert ids == {"FrameBuffer_0057.png", "FrameBuffer_0062.png",
                   "FrameBuffer_0063.png"}
