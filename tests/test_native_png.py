"""Native PNG decoder vs PIL golden values."""

import numpy as np
import pytest
from PIL import Image

import e3d_tpu  # noqa: F401
from e3d_tpu.data.native import decode_png_batch, png_info


@pytest.fixture(scope="module")
def png_files(tmp_path_factory, ):
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("pngs")
    rgb_paths, dep_paths, rgbs, deps = [], [], [], []
    for i in range(5):
        rgb = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
        dep = rng.integers(0, 65535, size=(48, 64), dtype=np.uint16)
        rp = str(root / f"rgb_{i}.png")
        dp = str(root / f"dep_{i}.png")
        Image.fromarray(rgb).save(rp)
        Image.fromarray(dep).save(dp)
        rgb_paths.append(rp)
        dep_paths.append(dp)
        rgbs.append(rgb)
        deps.append(dep)
    return rgb_paths, dep_paths, np.stack(rgbs), np.stack(deps)


def test_png_info(png_files):
    rgb_paths, dep_paths, _, _ = png_files
    assert png_info(rgb_paths[0]) == (48, 64, 3, 8)
    assert png_info(dep_paths[0]) == (48, 64, 1, 16)


def test_decode_rgb_batch_matches_pil(png_files):
    rgb_paths, _, rgbs, _ = png_files
    out = decode_png_batch(rgb_paths, num_threads=2)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, rgbs)


def test_decode_depth16_batch_matches_pil(png_files):
    _, dep_paths, _, deps = png_files
    out = decode_png_batch(dep_paths, num_threads=2)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, deps)


def test_decode_real_reference_frame():
    """The actual SimCol sample frame shipped with the reference."""
    path = "/root/reference/FrameBuffer_0051.png"
    ours = decode_png_batch([path])
    expected = np.asarray(Image.open(path))[..., :3]
    np.testing.assert_array_equal(ours[0, ..., :3], expected)


def test_decode_failure_reported(tmp_path):
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not a png")
    with pytest.raises(ValueError):
        decode_png_batch([str(bad)])
