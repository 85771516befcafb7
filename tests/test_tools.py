"""Media + offline-eval tool CLIs on synthetic data."""

import glob
import os

import numpy as np
import pytest

import e3d_tpu  # noqa: F401
from e3d_tpu.data.synthetic import make_simcol_fixture


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    import cv2

    path = str(tmp_path_factory.mktemp("video") / "clip.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                             (64, 48))
    rng = np.random.default_rng(0)
    for _ in range(30):
        writer.write(rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8))
    writer.release()
    return path


def test_video_to_images(video_path, tmp_path):
    from e3d_tpu.cli import video_to_images

    out = str(tmp_path / "frames")
    video_to_images.main(["--video_path", video_path, "--output_dir", out,
                          "--start_time", "0.5", "--test",
                          "--test_frames", "5"])
    # test-mode samples land in output_dir/test (reference
    # video_to_images.py:150-156) so they never clobber a real run
    frames = sorted(glob.glob(os.path.join(out, "test", "frame_*.jpg")))
    assert len(frames) == 5
    import cv2
    img = cv2.imread(frames[0])
    assert img.shape == (48, 64, 3)


def test_video_crop(video_path, tmp_path):
    from e3d_tpu.media.video import video_to_frames

    out = str(tmp_path / "cropped")
    n = video_to_frames(video_path, out, crop={"x": 10, "y": 5, "width": 40,
                                               "height": 30},
                        test=True, test_frames=2)
    assert n == 2
    import cv2
    img = cv2.imread(os.path.join(out, "test", "frame_0000.jpg"))
    assert img.shape == (30, 40, 3)


def test_convert_avi_to_mp4(video_path, tmp_path):
    from e3d_tpu.cli import convert_video

    out = str(tmp_path / "out.mp4")
    convert_video.main([video_path, "-o", out])
    assert os.path.getsize(out) > 0
    import cv2
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 30


@pytest.fixture(scope="module")
def simcol_with_preds(tmp_path_factory):
    """Fixture with _OP prediction dirs (8-bit grayscale preds)."""
    import cv2

    root = make_simcol_fixture(str(tmp_path_factory.mktemp("sc")),
                               n_procedures=2, frames_per_proc=4, hw=64)
    for frames in glob.glob(os.path.join(root, "SyntheticColon_I",
                                         "Frames_S*")):
        if frames.endswith("_OP"):
            continue
        op = frames + "_OP"
        os.makedirs(op, exist_ok=True)
        for dpath in glob.glob(os.path.join(frames, "Depth_*.png")):
            gt = cv2.imread(dpath, cv2.IMREAD_UNCHANGED).astype(np.float32)
            norm = (gt - gt.min()) / max(gt.max() - gt.min(), 1e-9)
            pred8 = (norm * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(op, os.path.basename(dpath)), pred8)
            # calculate_metrics expects 16-bit mm depths under the same name
            # pattern in the _OP dir too; 8-bit is fine for it (ANYDEPTH).
    return root


def test_eval_depth_offline(simcol_with_preds, capsys):
    from e3d_tpu.cli import eval_depth_offline

    eval_depth_offline.main(["--input-path", simcol_with_preds,
                             "--no-strict"])
    out = capsys.readouterr().out
    assert "Overall Results" in out
    assert "d1" in out


def test_calc_metrics(simcol_with_preds, capsys):
    from e3d_tpu.cli import calc_metrics

    calc_metrics.main(["--dataset-root", simcol_with_preds])
    out = capsys.readouterr().out
    assert "Overall Average" in out
    assert "delta1" in out


def test_calc_stats(simcol_with_preds, capsys):
    from e3d_tpu.cli import calc_stats

    calc_stats.main(["--ds", "simcol",
                     "--data-dir", simcol_with_preds,
                     "--train-list", os.path.join(simcol_with_preds,
                                                  "train.txt"),
                     "--size", "56", "--batch-size", "4",
                     "--num-workers", "2"])
    out = capsys.readouterr().out
    assert "RGB mean" in out and "depth mean" in out
