"""Native media codecs: baseline JPEG + AVI/MP4 MJPEG containers.

Covers the native replacement for the reference's cv2 video tooling
(/root/reference/video_to_images.py:70-126,
/root/reference/data_processing/convert_avi_to_mp4.py:30-50): JPEG
encode/decode vs cv2 goldens, container demux/remux interop with cv2 in
both directions, the lossless AVI->MP4 remux, and the cv2 fallback for
non-MJPEG codecs.
"""

import os

import numpy as np
import pytest

import e3d_tpu  # noqa: F401
from e3d_tpu.media import native
from e3d_tpu.media.video import (_native_reader, convert_avi_to_mp4,
                                 video_to_frames)

cv2 = pytest.importorskip("cv2")


def _smooth_rgb(h=64, w=96, seed=0):
    rng = np.random.default_rng(seed)
    img = np.cumsum(rng.standard_normal((h, w, 3)), axis=1)
    img = np.cumsum(img, axis=0)
    return ((img - img.min()) / (np.ptp(img) + 1e-9) * 255).astype(np.uint8)


# ----------------------------- JPEG codec -----------------------------------


def test_jpeg_gray_roundtrip_matches_cv2():
    g = _smooth_rgb()[..., 0]
    data = native.encode_jpeg(g, 90)
    back = native.decode_jpeg(data)
    cvd = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_GRAYSCALE)
    # No chroma: decoders agree to IDCT rounding.
    assert np.abs(cvd.astype(int) - back.astype(int)).max() <= 1
    assert np.abs(back.astype(int) - g.astype(int)).max() <= 12  # q90


def test_jpeg_color_decode_matches_cv2_on_cv2_encoded():
    img = _smooth_rgb()
    ok, enc = cv2.imencode(".jpg", img[..., ::-1],
                           [cv2.IMWRITE_JPEG_QUALITY, 90])
    assert ok
    nat = native.decode_jpeg(enc.tobytes())
    cvd = cv2.imdecode(enc, cv2.IMREAD_COLOR)[..., ::-1]
    # Centered-bilinear chroma upsampling matches libjpeg's fancy filter.
    assert np.abs(cvd.astype(int) - nat.astype(int)).max() <= 4
    assert np.mean(np.abs(cvd.astype(int) - nat.astype(int))) < 1.0
    ny = nat.astype(np.float64) @ [0.299, 0.587, 0.114]
    cy = cvd.astype(np.float64) @ [0.299, 0.587, 0.114]
    assert np.abs(ny - cy).max() <= 3.0


def test_jpeg_color_encode_readable_by_cv2():
    img = _smooth_rgb(48, 64, seed=3)
    data = native.encode_jpeg(img, 92)
    cvd = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    assert cvd is not None and cvd.shape == (48, 64, 3)
    native_err = np.mean(np.abs(cvd[..., ::-1].astype(int) - img.astype(int)))
    # Relative quality: native encode must be in the same class as cv2's
    # own q92 roundtrip on the identical image (both 4:2:0-bound).
    ok, ref = cv2.imencode(".jpg", img[..., ::-1],
                           [cv2.IMWRITE_JPEG_QUALITY, 92])
    assert ok
    cv_rt = cv2.imdecode(ref, cv2.IMREAD_COLOR)
    cv_err = np.mean(np.abs(cv_rt[..., ::-1].astype(int) - img.astype(int)))
    assert native_err <= 1.5 * cv_err + 0.5


@pytest.mark.parametrize("flags", [
    [cv2.IMWRITE_JPEG_SAMPLING_FACTOR, cv2.IMWRITE_JPEG_SAMPLING_FACTOR_420],
    [cv2.IMWRITE_JPEG_SAMPLING_FACTOR, cv2.IMWRITE_JPEG_SAMPLING_FACTOR_420,
     cv2.IMWRITE_JPEG_RST_INTERVAL, 4],
    [cv2.IMWRITE_JPEG_SAMPLING_FACTOR, cv2.IMWRITE_JPEG_SAMPLING_FACTOR_422],
    [cv2.IMWRITE_JPEG_SAMPLING_FACTOR, cv2.IMWRITE_JPEG_SAMPLING_FACTOR_444],
], ids=["420", "420-rst", "422", "444"])
def test_jpeg_decode_variants_match_cv2(flags):
    """Sampling factors and restart markers decode within rounding of
    libjpeg — worst case (uniform noise input)."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    ok, enc = cv2.imencode(".jpg", img[..., ::-1],
                           [cv2.IMWRITE_JPEG_QUALITY, 90] + flags)
    assert ok
    nat = native.decode_jpeg(enc.tobytes())
    cvd = cv2.imdecode(enc, cv2.IMREAD_COLOR)[..., ::-1]
    d = np.abs(nat.astype(int) - cvd.astype(int))
    assert d.max() <= 4 and d.mean() < 1.0


def test_jpeg_progressive_rejected_with_fallback():
    from io import BytesIO

    from PIL import Image

    img = _smooth_rgb(48, 64)
    buf = BytesIO()
    Image.fromarray(img).save(buf, "JPEG", progressive=True, quality=90)
    with pytest.raises(ValueError):
        native.decode_jpeg(buf.getvalue())


def test_jpeg_info_and_bad_stream():
    img = _smooth_rgb(32, 40)
    data = native.encode_jpeg(img, 90)
    assert native.jpeg_info(data) == (32, 40, 3)
    with pytest.raises(ValueError):
        native.decode_jpeg(b"\x00" * 64)


# ----------------------------- containers -----------------------------------


@pytest.fixture()
def mjpg_avi(tmp_path):
    path = str(tmp_path / "clip.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                             (64, 48))
    rng = np.random.default_rng(0)
    for _ in range(12):
        writer.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    writer.release()
    return path


def test_native_reader_demuxes_cv2_avi(mjpg_avi):
    with native.VideoReader(mjpg_avi) as r:
        assert (r.width, r.height, r.num_frames) == (64, 48, 12)
        assert r.is_mjpeg and abs(r.fps - 10.0) < 1e-6
        f0 = r.frame_rgb(0)
    with native.VideoReader(mjpg_avi) as r:
        sample = r.frame_bytes(0)
    # Same stored JPEG through libjpeg: agree to IDCT+upsample rounding.
    cvd = cv2.imdecode(np.frombuffer(sample, np.uint8), cv2.IMREAD_COLOR)
    assert np.abs(f0.astype(int) - cvd[..., ::-1].astype(int)).max() <= 4
    # FFmpeg's video path (VideoCapture) uses nearest chroma upsampling,
    # so on noise only the luma plane agrees tightly across decoders.
    cap = cv2.VideoCapture(mjpg_avi)
    ok, cf = cap.read()
    cap.release()
    assert ok
    fy = f0.astype(np.float64) @ [0.299, 0.587, 0.114]
    cy = cf[..., ::-1].astype(np.float64) @ [0.299, 0.587, 0.114]
    assert np.mean(np.abs(fy - cy)) < 1.5


def test_native_writer_avi_and_mp4_readable_by_cv2(tmp_path):
    img = _smooth_rgb(48, 64)
    for ext, fps in (("avi", 30.0), ("mp4", 29.97)):
        path = str(tmp_path / f"out.{ext}")
        with native.VideoWriter(path, 64, 48, fps) as w:
            for _ in range(5):
                w.write_rgb(img)
        cap = cv2.VideoCapture(path)
        assert cap.isOpened()
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5
        assert abs(cap.get(cv2.CAP_PROP_FPS) - fps) < 0.01
        ok, fr = cap.read()
        cap.release()
        assert ok and fr.shape == (48, 64, 3)
        with native.VideoReader(path) as r:
            assert r.num_frames == 5 and r.is_mjpeg
            assert abs(r.fps - fps) < 1e-6


def test_convert_avi_to_mp4_is_lossless_remux(mjpg_avi, tmp_path):
    out = str(tmp_path / "out.mp4")
    convert_avi_to_mp4(mjpg_avi, out)
    with native.VideoReader(mjpg_avi) as src, native.VideoReader(out) as dst:
        assert dst.num_frames == src.num_frames
        assert abs(dst.fps - src.fps) < 1e-6
        for i in (0, 5, 11):
            assert dst.frame_bytes(i) == src.frame_bytes(i)  # bit-exact
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 12
    cap.release()


def test_video_to_frames_native_is_lossless_without_crop(mjpg_avi, tmp_path):
    out = str(tmp_path / "frames")
    n = video_to_frames(mjpg_avi, out, test=True, test_frames=3)
    assert n == 3
    with native.VideoReader(mjpg_avi) as r:
        stored = r.frame_bytes(0)
    with open(os.path.join(out, "test", "frame_0000.jpg"), "rb") as f:
        assert f.read() == stored


def test_video_to_frames_native_crop_and_stride(mjpg_avi, tmp_path):
    out = str(tmp_path / "frames")
    n = video_to_frames(mjpg_avi, out,
                        crop={"x": 10, "y": 5, "width": 40, "height": 30},
                        every_n=3)
    assert n == 4  # 12 frames, every 3rd
    img = cv2.imread(os.path.join(out, "frame_0000.jpg"))
    assert img.shape == (30, 40, 3)


def test_infer_cli_on_native_jpeg_frames(mjpg_avi, tmp_path, monkeypatch):
    """video_to_frames (native) -> infer CLI frame_*.jpg mode decodes the
    JPEGs through the native codec (run.py:151-187 video-frame input)."""
    from e3d_tpu.cli import infer

    frames = str(tmp_path / "frames" / "test")  # test-mode subdir
    assert video_to_frames(mjpg_avi, str(tmp_path / "frames"),
                           test=True, test_frames=2) == 2
    # An unreadable file in the glob must be warned-and-skipped, not fatal.
    with open(os.path.join(frames, "frame_9999.jpg"), "wb") as f:
        f.write(b"not a jpeg")
    monkeypatch.chdir(tmp_path)
    infer.main(["--encoder", "vitt", "-i", frames, "-d", "testing",
                "-o", str(tmp_path / "out"), "--input-size", "56",
                "--save-numpy"])
    for i in range(2):
        d = np.load(tmp_path / "out" / f"frame_{i:04d}.npy")
        assert d.shape == (48, 64) and np.isfinite(d).all()
    assert not (tmp_path / "out" / "frame_9999.npy").exists()


def test_decode_rgb_uses_native_jpeg(tmp_path):
    from e3d_tpu.data.io import decode_rgb

    img = _smooth_rgb(32, 40)
    path = str(tmp_path / "x.jpg")
    with open(path, "wb") as f:
        f.write(native.encode_jpeg(img, 95))
    out = decode_rgb(path)
    assert out.shape == (32, 40, 3) and out.dtype == np.uint8
    # q95 4:2:0 roundtrip on strong chroma: chroma-bound error, luma tight
    assert np.mean(np.abs(out.astype(int) - img.astype(int))) < 6.0
    oy = out.astype(np.float64) @ [0.299, 0.587, 0.114]
    iy = img.astype(np.float64) @ [0.299, 0.587, 0.114]
    assert np.mean(np.abs(oy - iy)) < 1.5


def test_avi_opendml_avix_extension(tmp_path):
    """Frames inside appended RIFF-AVIX chunks (OpenDML large-file
    extension, written by ffmpeg past ~1 GB) are indexed too."""
    import struct

    img = _smooth_rgb(48, 64)
    path = str(tmp_path / "big.avi")
    with native.VideoWriter(path, 64, 48, 30.0) as w:
        for _ in range(2):
            w.write_rgb(img)

    def chunk(tag, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    jpeg = native.encode_jpeg(img, 90)
    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", jpeg) * 2)
    body = b"AVIX" + movi
    with open(path, "ab") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)

    with native.VideoReader(path) as r:
        assert r.num_frames == 4
        assert r.frame_bytes(3) == jpeg
        f3 = r.frame_rgb(3)
        assert f3.shape == (48, 64, 3)


def test_non_mjpeg_falls_back_to_cv2(tmp_path):
    path = str(tmp_path / "x.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                             (64, 48))
    rng = np.random.default_rng(1)
    for _ in range(4):
        writer.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    writer.release()
    assert _native_reader(path) is None
    out = str(tmp_path / "frames")
    assert video_to_frames(path, out) == 4  # cv2 path still works


def test_video_depth_cli_end_to_end(mjpg_avi, tmp_path):
    """video_depth: MJPEG in -> depth MJPEG out without frames touching
    disk (native demux -> serving engine -> native mux), side-by-side
    composite geometry and frame-count/stride preserved."""
    from e3d_tpu.cli import video_depth

    out = str(tmp_path / "depth.mp4")
    video_depth.main([
        "--encoder", "vitt", "-i", mjpg_avi, "-o", out,
        "--input-size", "56", "--batch-size", "4",
        "--every-n", "2", "--side-by-side", "--quality", "92",
    ])
    with native.VideoReader(out) as r:
        assert r.is_mjpeg
        assert r.num_frames == 6  # 12 input frames, every 2nd
        # original (64) | 50px divider | depth (64)
        assert (r.width, r.height) == (64 + 50 + 64, 48)
        assert abs(r.fps - 5.0) < 1e-6  # 10 fps input / every_n 2
        frame = r.frame_rgb(0)
        assert frame.shape == (48, 178, 3)
        # divider column stays white through the JPEG roundtrip
        assert frame[:, 64 + 25, :].min() > 200
