"""serve CLI (watch-folder, --once mode) on a synthetic frame folder."""

import glob
import os

import numpy as np
import pytest
from PIL import Image

import e3d_tpu  # noqa: F401


def test_serve_cli_once(tmp_path):
    from e3d_tpu.cli import serve

    rng = np.random.default_rng(0)
    indir = tmp_path / "frames"
    indir.mkdir()
    for i in range(5):
        Image.fromarray(rng.integers(0, 255, size=(64, 64, 3),
                                     dtype=np.uint8)).save(
            indir / f"frame_{i:03d}.png")
    outdir = tmp_path / "depths"
    serve.main(["--encoder", "vitt", "-i", str(indir), "-o", str(outdir),
                "--input-size", "56", "--batch-size", "4", "--once",
                "--save-numpy"])
    pngs = sorted(glob.glob(str(outdir / "*.png")))
    npys = sorted(glob.glob(str(outdir / "*.npy")))
    assert len(pngs) == 5 and len(npys) == 5
    depth = np.load(npys[0])
    assert depth.shape == (64, 64)
    assert np.isfinite(depth).all()

    # second --once run: everything already has outputs -> no reprocessing
    before = {p: os.path.getmtime(p) for p in pngs}
    serve.main(["--encoder", "vitt", "-i", str(indir), "-o", str(outdir),
                "--input-size", "56", "--once"])
    after = {p: os.path.getmtime(p) for p in pngs}
    assert before == after

    # --int8 speed mode produces close (not identical) depths
    out8 = tmp_path / "depths_int8"
    serve.main(["--encoder", "vitt", "-i", str(indir), "-o", str(out8),
                "--input-size", "56", "--batch-size", "4", "--once",
                "--save-numpy", "--int8"])
    d8 = np.load(sorted(glob.glob(str(out8 / "*.npy")))[0])
    d0 = np.load(npys[0])
    assert np.isfinite(d8).all()
    rel = np.abs(d8 - d0).mean() / max(np.abs(d0).mean(), 1e-6)
    assert rel < 0.1, rel


def test_serve_cli_int8_calib_once(tmp_path, monkeypatch):
    """serve --int8 --int8-calib K: calibrates ONCE per resolution (the
    deployment contract — frozen scales, no per-batch recalibration) and
    produces outputs close to the dynamic-int8 path."""
    from e3d_tpu.cli import serve
    from e3d_tpu.ops import quant as quant_mod

    rng = np.random.default_rng(0)
    indir = tmp_path / "frames"
    indir.mkdir()
    for i in range(9):  # 3 device batches at batch-size 4 (last partial)
        Image.fromarray(rng.integers(0, 255, size=(64, 64, 3),
                                     dtype=np.uint8)).save(
            indir / f"frame_{i:03d}.png")

    calls = {"n": 0}
    real_calibrate = quant_mod.calibrate_scales

    def counting(*a, **k):
        calls["n"] += 1
        return real_calibrate(*a, **k)

    monkeypatch.setattr(quant_mod, "calibrate_scales", counting)
    outdir = tmp_path / "depths_calib"
    serve.main(["--encoder", "vitt", "-i", str(indir), "-o", str(outdir),
                "--input-size", "56", "--batch-size", "4", "--once",
                "--save-numpy", "--int8", "--int8-calib", "1"])
    npys = sorted(glob.glob(str(outdir / "*.npy")))
    assert len(npys) == 9
    assert calls["n"] == 1, f"calibrated {calls['n']} times"
    for p in npys:
        d = np.load(p)
        assert d.shape == (64, 64) and np.isfinite(d).all()

    # flag contract: --int8-calib without --int8 / with --from-export
    with pytest.raises(SystemExit):
        serve.main(["--encoder", "vitt", "-i", str(indir), "-o",
                    str(tmp_path / "x"), "--once", "--int8-calib", "1"])


def test_serve_retry_tracker_parks_and_unparks(tmp_path):
    """A slow multi-poll upload must be retried until the file stops
    changing; a STABLE unreadable file is parked (stat-only skip), and a
    parked file whose upload later RESUMES is picked back up (round-3
    review: the old fixed 3-strikes counter permanently dropped any frame
    whose transfer stalled ~3 polls)."""
    from e3d_tpu.cli.serve import _ReadRetryTracker

    path = tmp_path / "partial.png"
    t = _ReadRetryTracker(patience=3)
    # Upload in progress: size keeps growing -> never parks.
    for _ in range(10):
        with open(path, "ab") as f:
            f.write(b"x" * 100)
        assert t.note_failure(str(path)) is False
        assert t.parked(str(path)) is False
    # File stalled and stays unreadable: parked after 3 stable strikes
    # (note_failure fires True exactly once, for the log line).
    os.utime(path, ns=(0, 0))  # freeze mtime so signatures repeat
    assert t.note_failure(str(path)) is False
    assert t.note_failure(str(path)) is False
    assert t.note_failure(str(path)) is True
    assert t.parked(str(path)) is True
    assert t.note_failure(str(path)) is False  # no repeat log
    # Upload resumes: signature changes -> un-parked, decode retried.
    with open(path, "ab") as f:
        f.write(b"y" * 100)
    assert t.parked(str(path)) is False
    # Successful read clears the bookkeeping.
    t.clear(str(path))
    assert not t._fails
    # Deleted mid-poll: transient, not a park.
    os.remove(path)
    assert t.note_failure(str(path)) is False
    # prune drops bookkeeping for files no longer present.
    t.prune(set())
    assert not t._fails


def test_serve_cli_from_export(tmp_path):
    """serve --from-export replays the AOT artifact: depths agree with
    the live engine to bf16 compute tolerance, mismatched-resolution
    frames are skipped without claiming their output stem.

    Tolerance note: the artifact keeps the f32-ingest calling
    convention while the live engine uploads uint8 and converts on
    device (round 5, 4x less H2D). The math is identical, but the two
    programs fuse differently, so the bf16 trunk reassociates within
    ~bf16 eps (~1% — same band as the documented bf16-vs-f32 model
    deviation, perf/quant_int8_dev.log). Exported-vs-frozen-live at the
    SAME convention stays bit-exact (test_export.py / export --check)."""
    from e3d_tpu.cli import export_model, serve

    rng = np.random.default_rng(0)
    indir = tmp_path / "frames"
    indir.mkdir()
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, size=(64, 64, 3),
                                     dtype=np.uint8)).save(
            indir / f"frame_{i:03d}.png")
    Image.fromarray(rng.integers(0, 255, size=(48, 64, 3),
                                 dtype=np.uint8)).save(indir / "odd.png")

    artifact = str(tmp_path / "vitt.stablehlo")
    export_model.main(["--encoder", "vitt", "--frame-hw", "64", "64",
                       "--batch-size", "4", "--input-size", "56",
                       "-o", artifact])

    out_live = tmp_path / "live"
    serve.main(["--encoder", "vitt", "-i", str(indir), "-o",
                str(out_live), "--input-size", "56", "--batch-size", "4",
                "--once", "--save-numpy"])
    out_exp = tmp_path / "exported"
    serve.main(["--encoder", "vitt", "-i", str(indir), "-o",
                str(out_exp), "--input-size", "56", "--batch-size", "4",
                "--once", "--save-numpy", "--from-export", artifact])

    live = sorted(glob.glob(str(out_live / "*.npy")))
    exp = sorted(glob.glob(str(out_exp / "*.npy")))
    assert len(live) == 4  # live path serves the odd resolution too
    assert len(exp) == 3   # exported path skips it
    assert not (out_exp / "odd.npy").exists()
    for a, b in zip([p for p in live if "odd" not in p], exp):
        da, db = np.load(a), np.load(b)
        rel = np.abs(da - db).mean() / max(np.abs(db).mean(), 1e-6)
        assert rel < 0.03, rel  # bf16 reassociation band, see docstring
        np.testing.assert_allclose(da, db, rtol=0.05, atol=0.15)

    # Dials contradicting the artifact's traced-in configuration are a
    # loud error, not a silently ignored flag.
    with pytest.raises(SystemExit):
        serve.main(["--encoder", "vitt", "-i", str(indir), "-o",
                    str(tmp_path / "x"), "--once",
                    "--from-export", artifact, "--int8"])
    with pytest.raises(SystemExit):
        serve.main(["--encoder", "vitt", "-i", str(indir), "-o",
                    str(tmp_path / "x"), "--once", "--input-size", "70",
                    "--from-export", artifact])
