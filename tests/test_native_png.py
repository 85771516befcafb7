"""Native PNG decoder vs PIL golden values."""

import numpy as np
import pytest
from PIL import Image

import e3d_tpu  # noqa: F401
from e3d_tpu.data.native import decode_png_batch, png_info
from e3d_tpu.data import native


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


# --------------------------- native TIFF decoder ----------------------------


def _tiff_cases(tmp_path):
    import cv2
    from PIL import Image

    rng = np.random.default_rng(7)
    arr16 = rng.integers(0, 65535, size=(37, 53), dtype=np.uint16)
    arr8 = rng.integers(0, 255, size=(37, 53), dtype=np.uint8)
    cases = []
    p = str(tmp_path / "cv2_lzw_pred.tiff")  # cv2 default: LZW + predictor 2
    cv2.imwrite(p, arr16)
    cases.append((p, arr16))
    p = str(tmp_path / "pil_raw.tiff")
    Image.fromarray(arr16).save(p)
    cases.append((p, arr16))
    p = str(tmp_path / "pil_lzw.tiff")
    Image.fromarray(arr16).save(p, compression="tiff_lzw")
    cases.append((p, arr16))
    p = str(tmp_path / "pil_packbits.tiff")
    Image.fromarray(arr16).save(p, compression="packbits")
    cases.append((p, arr16))
    p = str(tmp_path / "pil_raw8.tiff")
    Image.fromarray(arr8).save(p)
    cases.append((p, arr8))
    return cases


def test_native_tiff_matches_writers(tmp_path):
    for path, expect in _tiff_cases(tmp_path):
        got = native.decode_tiff(path)
        assert got.dtype == expect.dtype, path
        np.testing.assert_array_equal(got, expect, err_msg=path)


def test_decode_c3vd_depth_native(tmp_path):
    import cv2

    from e3d_tpu.data.io import decode_c3vd_depth

    arr = np.random.default_rng(3).integers(
        0, 65535, size=(64, 64), dtype=np.uint16)
    path = str(tmp_path / "0001_depth.tiff")
    cv2.imwrite(path, arr)
    np.testing.assert_array_equal(decode_c3vd_depth(path), arr)


def test_native_tiff_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.tiff"
    bad.write_bytes(b"NOTATIFF")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        native.decode_tiff(str(bad))
