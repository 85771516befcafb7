"""ctypes bindings for the native PNG batch decoder (pngdec.cpp).

The native fast path for the reference's dataloader hot loop: whole-batch
PNG decode (zlib inflate + unfilter) in C++ threads, one contiguous output
buffer per batch. Falls back gracefully if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from ...utils.cbuild import build_and_load

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pngdec.cpp")
_LIB = None


def _lib():
    global _LIB
    if _LIB is None:
        lib = build_and_load(_SRC, extra_flags=("-lz",))
        lib.e3d_png_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.e3d_png_info.restype = ctypes.c_int
        lib.e3d_png_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int]
        lib.e3d_png_decode_batch.restype = ctypes.c_int
        _LIB = lib
    return _LIB


def png_info(path: str) -> tuple[int, int, int, int]:
    """(height, width, channels, bit_depth) of a PNG."""
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    b = ctypes.c_int()
    rc = _lib().e3d_png_info(path.encode(), ctypes.byref(w), ctypes.byref(h),
                             ctypes.byref(c), ctypes.byref(b))
    if rc != 0:
        raise ValueError(f"unsupported or unreadable PNG: {path}")
    return h.value, w.value, c.value, b.value


def decode_png_batch(paths: list[str], num_threads: int = 4) -> np.ndarray:
    """Decode same-shape PNGs into one contiguous (N, H, W, C) array
    (uint8 or uint16). Raises on any failure."""
    if not paths:
        raise ValueError("empty path list")
    h, w, c, bits = png_info(paths[0])
    dtype = np.uint16 if bits == 16 else np.uint8
    out = np.empty((len(paths), h, w, c), dtype)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    failures = _lib().e3d_png_decode_batch(
        arr, len(paths), h, w, c, bits,
        out.ctypes.data_as(ctypes.c_void_p), num_threads)
    if failures:
        raise ValueError(f"{failures} PNG(s) failed to decode "
                         f"(shape/format mismatch?)")
    return out[..., 0] if c == 1 else out


# --------------------------- TIFF (C3VD depth) ------------------------------

_TIFF_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tiffdec.cpp")
_TIFF_LIB = None


def _tiff_lib():
    global _TIFF_LIB
    if _TIFF_LIB is None:
        lib = build_and_load(_TIFF_SRC)
        lib.e3d_tiff_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.e3d_tiff_info.restype = ctypes.c_int
        lib.e3d_tiff_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_longlong]
        lib.e3d_tiff_decode.restype = ctypes.c_int
        _TIFF_LIB = lib
    return _TIFF_LIB


def tiff_info(path: str) -> tuple[int, int, int, int]:
    """(height, width, channels, bit_depth) of a baseline striped TIFF."""
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    b = ctypes.c_int()
    rc = _tiff_lib().e3d_tiff_info(path.encode(), ctypes.byref(h),
                                   ctypes.byref(w), ctypes.byref(c),
                                   ctypes.byref(b))
    if rc != 0:
        raise ValueError(f"unsupported or unreadable TIFF ({rc}): {path}")
    return h.value, w.value, c.value, b.value


def decode_tiff(path: str) -> np.ndarray:
    """Decode a striped 8/16-bit TIFF (none/LZW/PackBits compression,
    horizontal-differencing predictor) -> (H, W) or (H, W, C) array.

    The C3VD depth format (reference c3vd.py:188-189 reads it via cv2)."""
    h, w, c, bits = tiff_info(path)
    dtype = np.uint16 if bits == 16 else np.uint8
    out = np.empty((h, w, c), dtype)
    rc = _tiff_lib().e3d_tiff_decode(
        path.encode(), out.ctypes.data_as(ctypes.c_void_p), out.nbytes)
    if rc != 0:
        raise ValueError(f"TIFF decode failed ({rc}): {path}")
    return out[..., 0] if c == 1 else out
