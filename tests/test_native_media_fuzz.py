"""Robustness of the native media parsers on malformed input.

The C++ decoders (media/native) parse untrusted bytes; truncations and
bitflips must surface as Python exceptions (or valid decodes), never
crashes/corruption. Deterministic corpus, ~seconds of runtime.
"""

import os

import numpy as np
import pytest

import e3d_tpu  # noqa: F401
from e3d_tpu.media import native


@pytest.fixture(scope="module")
def jpeg_bytes():
    rng = np.random.default_rng(0)
    img = np.cumsum(rng.standard_normal((48, 64, 3)), 1)
    img = ((img - img.min()) / np.ptp(img) * 255).astype(np.uint8)
    return native.encode_jpeg(img, 90), img


def test_jpeg_truncation_and_bitflips_never_crash(jpeg_bytes):
    data, _ = jpeg_bytes
    outcomes = {"ok": 0, "rejected": 0}
    for cut in range(8, len(data), 37):
        try:
            out = native.decode_jpeg(data[:cut])
            assert out.shape == (48, 64, 3)
            outcomes["ok"] += 1
        except ValueError:
            outcomes["rejected"] += 1
    for i in range(0, len(data), 13):
        mut = bytearray(data)
        mut[i] ^= 0xFF
        try:
            native.decode_jpeg(bytes(mut))
            outcomes["ok"] += 1
        except ValueError:
            outcomes["rejected"] += 1
    # Both outcomes occur; what matters is the process survived.
    assert outcomes["rejected"] > 0 and outcomes["ok"] > 0


@pytest.mark.parametrize("ext", ["avi", "mp4"])
def test_container_truncation_and_bitflips_never_crash(tmp_path, ext,
                                                       jpeg_bytes):
    data, img = jpeg_bytes
    path = str(tmp_path / f"t.{ext}")
    with native.VideoWriter(path, 64, 48, 30.0, container=ext) as w:
        for _ in range(3):
            w.write_jpeg(data)
    blob = open(path, "rb").read()

    def try_open(b: bytes):
        q = str(tmp_path / f"fuzz.{ext}")
        with open(q, "wb") as f:
            f.write(b)
        try:
            r = native.VideoReader(q)
        except (ValueError, OSError):
            return False
        try:
            for i in range(min(r.num_frames, 10)):
                try:
                    r.frame_bytes(i)
                except (ValueError, IndexError):
                    pass
            return True
        finally:
            r.close()

    results = [try_open(blob[:cut])
               for cut in list(range(4, len(blob), 101)) + [len(blob) - 1]]
    for i in range(0, len(blob), 53):
        mut = bytearray(blob)
        mut[i] ^= 0xFF
        results.append(try_open(bytes(mut)))
    assert any(results) and not all(results)


def test_png_tiff_truncation_and_bitflips_never_crash(tmp_path):
    """data/native decoders (PNG, TIFF) on malformed dataset files.

    (The exhaustive every-byte variant runs under AddressSanitizer —
    perf/media_asan_fuzz*.py, ALL CLEAN; this keeps a fast regression
    in-suite.)"""
    cv2 = pytest.importorskip("cv2")
    from e3d_tpu.data.io import decode_depth16_png, decode_rgb
    from e3d_tpu.data.io import decode_c3vd_depth  # native TIFF fast path

    rng = np.random.default_rng(0)
    p8 = str(tmp_path / "a.png")
    cv2.imwrite(p8, rng.integers(0, 255, (24, 32, 3), dtype=np.uint8))
    p16 = str(tmp_path / "b.png")
    cv2.imwrite(p16, rng.integers(0, 65535, (24, 32), dtype=np.uint16))
    t16 = str(tmp_path / "c.tiff")
    cv2.imwrite(t16, rng.integers(0, 65535, (24, 32), dtype=np.uint16))

    cases = [(p8, decode_rgb), (p16, decode_depth16_png),
             (t16, decode_c3vd_depth)]
    for src, fn in cases:
        blob = open(src, "rb").read()
        q = str(tmp_path / ("fuzz" + os.path.splitext(src)[1]))
        corpus = [blob[:cut] for cut in range(0, len(blob), 23)]
        for i in range(0, len(blob), 11):
            mut = bytearray(blob)
            mut[i] ^= 0xFF
            corpus.append(bytes(mut))
        for b in corpus:
            with open(q, "wb") as f:
                f.write(b)
            try:
                fn(q)  # valid decode or Python exception — never a crash
            except Exception:
                pass


def test_jpeg_garbage_inputs():
    noise = bytes(np.random.default_rng(7).integers(0, 256, 512,
                                                    dtype=np.uint8))
    for bad in (b"", b"\xff", b"\xff\xd8", b"\x00" * 1000,
                noise, b"\xff\xd8\xff\xe0" + b"\x00" * 64):
        with pytest.raises(ValueError):
            native.decode_jpeg(bad)
