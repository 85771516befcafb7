"""Image resizing as separable matrix multiplies.

TPU-first design: instead of gather-based interpolation (VPU-bound, poor
layout), a resize along one axis is a dense ``(out, in)`` weight matrix
applied as a matmul — the MXU eats it, XLA fuses the two axes with the
surrounding ops, and the weights are computed once at trace time (static
shapes).

Two families are provided, matching the two semantics used by the reference:

- ``resize_antialias``: PIL/torchvision ``Resize(..., antialias=True)``
  semantics (half-pixel sampling grid; kernel support scaled by the
  downscale factor). Used by the data pipeline
  (reference ``data_processing/simcol.py:73-135``).
  Cubic kernel uses A=-0.5 (PIL convention; torchvision tensor-mode uses
  A=-0.75 without antialias, but with antialias=True torchvision matches
  PIL). Divergence <=1e-3 in pixel value either way.

- ``resize_align_corners``: ``F.interpolate(..., align_corners=True)``
  semantics (endpoint-aligned grid, no antialias), used inside the DPT
  decoder (reference DPT head uses bilinear align_corners=True).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Pallas 2-tap lerp path for align-corners bilinear (see bottom of file).
# MEASURED SLOWER than the matmul form on v5e (per-output-row unrolled
# slices are iteration-overhead-bound: DPT resizes 10.7 -> 18 ms,
# perf/dpt_ops2.jsonl) — kept for reference behind the env flag, default
# off.
_PALLAS_RESIZE = os.environ.get("E3D_PALLAS_RESIZE", "0") == "1"

# Matmul-pass order for the decoder (bf16) resizes. Measured on v5e at the
# DPT-head shapes (perf/resize_sweep.py, perf/resize_sweep.log):
# the hottest resize (296->518 at 128ch) runs 4.27 ms with the H-then-W
# einsum order, 3.43 with W-then-H, 3.33 with both contractions on minor
# axes of an NCHW transpose; the lower-res fusion resizes are
# order-insensitive (+-1%). Default "wh" (W pass first).
_ORDER = os.environ.get("E3D_RESIZE_ORDER", "wh")

# Block-banded resize matmuls (round 5, measured DEAD END — default off):
# a bilinear align-corners resize matrix has exactly 2 nonzeros per
# output row, so the dense (out, in) einsum wastes ~in/2 x the MACs.
# Chunking output rows into blocks of _BAND_CHUNK and statically slicing
# the input to each block's nonzero band cuts the contraction dim ~4x at
# the hot 296->518 shape with identical numerics (verified exact) — and
# still measured SLOWER in-model: full vitl-518 bs8 forward 104.12 ms
# banded vs 100.45 dense (perf/resize_banded_ab.log). The resizes are
# not MAC-bound in-model; the chunked matmuls + concat fuse worse than
# the one dense einsum. Evidence for perf/dpt_resize_closure.md; knob
# kept for future shapes.
_BANDED = os.environ.get("E3D_RESIZE_BANDED", "0") == "1"
_BAND_CHUNK = int(os.environ.get("E3D_RESIZE_BAND_CHUNK", "128"))


def _band_slices(mat: np.ndarray, chunk: int):
    """Static (row0, row1, in_lo, in_hi) tiles covering ``mat``'s nonzero
    band, or None when banding buys < 2x (then dense is better: one big
    matmul beats several similar-size ones)."""
    out, n_in = mat.shape
    tiles = []
    total_band = 0
    for o0 in range(0, out, chunk):
        sub = mat[o0:min(o0 + chunk, out)]
        nz = np.nonzero(np.abs(sub).sum(axis=0) > 0)[0]
        lo, hi = int(nz[0]), int(nz[-1]) + 1
        tiles.append((o0, min(o0 + chunk, out), lo, hi))
        total_band += (hi - lo) * sub.shape[0]
    if total_band * 2 > out * n_in:
        return None
    return tiles


def _cubic_kernel(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys cubic convolution kernel (PIL uses a=-0.5)."""
    x = np.abs(x)
    x2, x3 = x * x, x * x * x
    w = np.where(
        x <= 1.0,
        (a + 2.0) * x3 - (a + 3.0) * x2 + 1.0,
        np.where(x < 2.0, a * x3 - 5.0 * a * x2 + 8.0 * a * x - 4.0 * a, 0.0),
    )
    return w


def _linear_kernel(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    return np.maximum(1.0 - x, 0.0)


_KERNELS = {
    "bicubic": (_cubic_kernel, 2.0),
    "bilinear": (_linear_kernel, 1.0),
}


@functools.lru_cache(maxsize=128)
def _antialias_matrix(in_size: int, out_size: int, method: str) -> np.ndarray:
    """(out, in) resampling matrix with PIL-style antialias support scaling."""
    kernel_fn, support = _KERNELS[method]
    scale = in_size / out_size
    # Antialias: widen the kernel when downscaling.
    filter_scale = max(scale, 1.0)
    support = support * filter_scale

    out_coords = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    left = np.floor(out_coords - support).astype(np.int64)
    max_taps = int(np.ceil(2.0 * support)) + 2
    taps = left[:, None] + np.arange(max_taps)[None, :]
    dist = (out_coords[:, None] - taps) / filter_scale
    weights = kernel_fn(dist)
    # PIL drops out-of-bounds taps and renormalizes over the valid window.
    valid = (taps >= 0) & (taps < in_size)
    weights = weights * valid
    taps = np.clip(taps, 0, in_size - 1)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    np.add.at(mat, (np.repeat(np.arange(out_size), max_taps), taps.ravel()),
              weights.ravel())
    norm = mat.sum(axis=1, keepdims=True)
    mat = mat / np.where(norm == 0, 1.0, norm)
    return mat.astype(np.float32)


@functools.lru_cache(maxsize=128)
def _align_corners_matrix(in_size: int, out_size: int, method: str) -> np.ndarray:
    """(out, in) matrix for align_corners=True interpolation (no antialias)."""
    kernel_fn, support = _KERNELS[method]
    if out_size == 1:
        out_coords = np.zeros(1, dtype=np.float64)
    elif in_size == 1:
        out_coords = np.zeros(out_size, dtype=np.float64)
    else:
        out_coords = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    left = np.floor(out_coords - support).astype(np.int64)
    max_taps = int(np.ceil(2.0 * support)) + 2
    taps = left[:, None] + np.arange(max_taps)[None, :]
    dist = out_coords[:, None] - taps
    weights = kernel_fn(dist)
    taps = np.clip(taps, 0, in_size - 1)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    np.add.at(mat, (np.repeat(np.arange(out_size), max_taps), taps.ravel()),
              weights.ravel())
    norm = mat.sum(axis=1, keepdims=True)
    mat = mat / np.where(norm == 0, 1.0, norm)
    return mat.astype(np.float32)


def _apply_separable(x: Array, mat_h: np.ndarray, mat_w: np.ndarray,
                     order: str | None = None) -> Array:
    """Apply per-axis resize matrices to NHWC (or HWC / HW) images.

    ``order`` overrides the global ``E3D_RESIZE_ORDER`` for one call site
    (pass orders interact with the producer/consumer layouts, so the best
    order is per-shape — see perf/resize_sweep.log)."""
    squeeze_batch = False
    squeeze_chan = False
    if x.ndim == 2:
        x = x[None, :, :, None]
        squeeze_batch = squeeze_chan = True
    elif x.ndim == 3:
        x = x[None]
        squeeze_batch = True
    if x.ndim != 4:
        raise ValueError(f"expected 2D/3D/4D input, got {x.shape}")

    dtype = x.dtype
    if dtype == jnp.bfloat16:
        # Model-internal path (bf16 activations): bf16 x bf16 matmuls with
        # f32 accumulation — full MXU rate, decoder-precision adequate.
        a_h = jnp.asarray(mat_h, jnp.bfloat16)
        a_w = jnp.asarray(mat_w, jnp.bfloat16)
        eff = order or _ORDER
        if _BANDED and eff == "wh":
            tw = _band_slices(mat_w, _BAND_CHUNK)
            th = _band_slices(mat_h, _BAND_CHUNK)
            if tw is not None or th is not None:
                y = _banded_pass(mat_w, tw, x, axis="w")
                return _finish(_banded_pass(mat_h, th,
                                            y.astype(jnp.bfloat16),
                                            axis="h"),
                               dtype, squeeze_chan, squeeze_batch)
        if eff == "nchw":
            t = jnp.transpose(x, (0, 3, 1, 2))
            y = jnp.einsum("ow,bchw->bcho", a_w, t,
                           preferred_element_type=jnp.float32)
            y = jnp.einsum("ph,bcho->bcpo", a_h, y.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            y = jnp.transpose(y, (0, 2, 3, 1))
        elif eff == "wh":
            y = jnp.einsum("ow,bhwc->bhoc", a_w, x,
                           preferred_element_type=jnp.float32)
            y = jnp.einsum("oh,bhwc->bowc", a_h, y.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        else:
            y = jnp.einsum("oh,bhwc->bowc", a_h, x,
                           preferred_element_type=jnp.float32)
            y = jnp.einsum("ow,bhwc->bhoc", a_w, y.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
    else:
        # Data-pipeline path: resampling weights must not be truncated
        # (bf16 passes would bias preprocessing), so pin full f32.
        xf = x.astype(jnp.float32)
        a_h = jnp.asarray(mat_h)
        a_w = jnp.asarray(mat_w)
        hi = jax.lax.Precision.HIGHEST
        y = jnp.einsum("oh,bhwc->bowc", a_h, xf, precision=hi)
        y = jnp.einsum("ow,bhwc->bhoc", a_w, y, precision=hi)
    return _finish(y, dtype, squeeze_chan, squeeze_batch)


def _finish(y: Array, dtype, squeeze_chan: bool, squeeze_batch: bool
            ) -> Array:
    y = y.astype(dtype)
    if squeeze_chan:
        y = y[..., 0]
    if squeeze_batch:
        y = y[0]
    return y


def _banded_pass(mat: np.ndarray, tiles, x: Array, axis: str) -> Array:
    """One resize pass as per-output-chunk banded matmuls (f32 output,
    like the dense einsums). ``tiles`` None = dense fallback."""
    eq = "ow,bhwc->bhoc" if axis == "w" else "oh,bhwc->bowc"
    if tiles is None:
        return jnp.einsum(eq, jnp.asarray(mat, jnp.bfloat16), x,
                          preferred_element_type=jnp.float32)
    chunks = []
    for o0, o1, lo, hi in tiles:
        sub = jnp.asarray(mat[o0:o1, lo:hi], jnp.bfloat16)
        xs = x[:, :, lo:hi] if axis == "w" else x[:, lo:hi]
        chunks.append(jnp.einsum(eq, sub, xs,
                                 preferred_element_type=jnp.float32))
    if len(chunks) == 1:
        return chunks[0]
    return jnp.concatenate(chunks, axis=2 if axis == "w" else 1)


def resize_antialias(x: Array, out_hw: tuple[int, int],
                     method: str = "bicubic") -> Array:
    """PIL/torchvision-style antialiased resize of NHWC/HWC/HW images."""
    h_out, w_out = out_hw
    h_in = x.shape[-3] if x.ndim >= 3 else x.shape[0]
    w_in = x.shape[-2] if x.ndim >= 3 else x.shape[1]
    return _apply_separable(
        x,
        _antialias_matrix(h_in, h_out, method),
        _antialias_matrix(w_in, w_out, method),
    )


def resize_align_corners(x: Array, out_hw: tuple[int, int],
                         method: str = "bilinear",
                         order: str | None = None) -> Array:
    """torch ``F.interpolate(..., align_corners=True)``-style resize.

    Implementation notes: an XLA gather+lerp 2-tap path was measured
    SLOWER on TPU than the dense per-axis matmuls (XLA gathers don't
    vectorize well on the VPU), but a Pallas 2-tap lerp with static
    per-output-row slices beats both for bilinear on lane-aligned
    channels (the DPT decoder's shapes) — dispatched below. Everything
    else takes the matmul path.
    """
    h_out, w_out = out_hw
    h_in = x.shape[-3] if x.ndim >= 3 else x.shape[0]
    w_in = x.shape[-2] if x.ndim >= 3 else x.shape[1]
    if (_PALLAS_RESIZE and method == "bilinear" and x.ndim == 4
            and x.shape[-1] % 128 == 0 and min(h_in, w_in) >= 2
            and jax.default_backend() == "tpu"):
        return _lerp_resize_pallas(x, (h_out, w_out))
    return _apply_separable(
        x,
        _align_corners_matrix(h_in, h_out, method),
        _align_corners_matrix(w_in, w_out, method),
        order=order,
    )


def resize_nearest(x: Array, out_hw: tuple[int, int]) -> Array:
    """Nearest-neighbor resize (cv2.INTER_NEAREST semantics)."""
    h_out, w_out = out_hw
    if x.ndim == 2:
        h_in, w_in = x.shape
    else:
        h_in, w_in = x.shape[-3], x.shape[-2]
    rows = jnp.clip((jnp.arange(h_out) * h_in) // h_out, 0, h_in - 1)
    cols = jnp.clip((jnp.arange(w_out) * w_in) // w_out, 0, w_in - 1)
    if x.ndim == 2:
        return x[rows][:, cols]
    return jnp.take(jnp.take(x, rows, axis=-3), cols, axis=-2)


# ---------------- Pallas align-corners bilinear (2-tap lerp) -----------------
#
# The DPT decoder only ever bilinearly up/down-samples NHWC tensors whose
# channel count is lane-aligned (128/256). For those, a 2-tap lerp with
# STATIC per-output-index slices (the output size is static, so the whole
# loop unrolls at trace time — no gathers, no dynamic offsets) is
# memory-bound instead of matmul-bound: the dense (out, in) matrix wastes
# in/2 x the FLOPs, and XLA adds layout transposes for the middle-axis
# contraction.


@functools.lru_cache(maxsize=256)
def _lerp_taps_static(n_in: int, n_out: int) -> tuple[tuple[int, ...],
                                                      tuple[float, ...]]:
    if n_out == 1 or n_in == 1:
        return (0,) * n_out, (0.0,) * n_out
    coords = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.clip(np.floor(coords).astype(np.int64), 0, n_in - 2)
    frac = coords - lo
    return tuple(int(v) for v in lo), tuple(float(v) for v in frac)


def _lerp_rows_kernel(x_ref, o_ref, *, lo, frac):
    for g in range(len(lo)):
        a = x_ref[lo[g]]                              # (WB, C)
        if frac[g] == 0.0:
            o_ref[g] = a
        else:
            bb = x_ref[lo[g] + 1]
            o_ref[g] = (a.astype(jnp.float32) * (1.0 - frac[g])
                        + bb.astype(jnp.float32) * frac[g]).astype(o_ref.dtype)


def _lerp_cols_kernel(x_ref, o_ref, *, lo, frac):
    for g in range(len(lo)):
        a = x_ref[:, lo[g]]                           # (HB, C)
        if frac[g] == 0.0:
            o_ref[:, g] = a
        else:
            bb = x_ref[:, lo[g] + 1]
            o_ref[:, g] = (a.astype(jnp.float32) * (1.0 - frac[g])
                           + bb.astype(jnp.float32) * frac[g]
                           ).astype(o_ref.dtype)


def _pick_block(span: int, fixed: int, c: int, itemsize: int,
                budget: int = 6 * 2 ** 20) -> int:
    blk = budget // max(fixed * c * itemsize, 1)
    blk = max(8, (blk // 8) * 8)
    return min(span, blk)


def _lerp_resize_pallas(x: Array, out_hw: tuple[int, int],
                        interpret: bool | None = None) -> Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h2, w2 = out_hw
    b, h, w, c = x.shape

    if h2 != h:
        lo, frac = _lerp_taps_static(h, h2)
        wb = _pick_block(w, h + h2, c, x.dtype.itemsize)
        x = pl.pallas_call(
            functools.partial(_lerp_rows_kernel, lo=lo, frac=frac),
            grid=(b, -(-w // wb)),
            in_specs=[pl.BlockSpec((None, h, wb, c),
                                   lambda i, j: (i, 0, j, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((None, h2, wb, c),
                                   lambda i, j: (i, 0, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, h2, w, c), x.dtype),
            interpret=interpret,
        )(x)
    if w2 != w:
        lo, frac = _lerp_taps_static(w, w2)
        hb = _pick_block(h2, w + w2, c, x.dtype.itemsize)
        x = pl.pallas_call(
            functools.partial(_lerp_cols_kernel, lo=lo, frac=frac),
            grid=(b, -(-h2 // hb)),
            in_specs=[pl.BlockSpec((None, hb, w, c),
                                   lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((None, hb, w2, c),
                                   lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, h2, w2, c), x.dtype),
            interpret=interpret,
        )(x)
    return x
