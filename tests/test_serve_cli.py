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
