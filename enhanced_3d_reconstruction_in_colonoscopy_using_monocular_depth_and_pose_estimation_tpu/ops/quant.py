"""Dynamic int8 (W8A8) matmul helpers for the opt-in quantized
inference mode.

The v5e MXU runs int8 x int8 -> int32 at ~2x the bf16 rate (measured
255 vs 143 TF/s on the flagship projection GEMM shape). This module
implements symmetric dynamic quantization: activations are quantized
per token row (max-abs over the contracted features), weights per
output channel, both to int8 at [-127, 127]; the int32 accumulator is
rescaled in f32. No calibration pass and no quantized checkpoints —
weights are quantized on the fly inside the jitted forward (≈0.3 ms of
VPU work per vitl forward, amortized against ~2x faster GEMMs).

Inference-only: rounding has zero gradient, so training paths never
enable it. No reference counterpart (the reference runs fp16 CUDA,
``/root/reference/configs/trainer/default.yaml:4``); this is a
speed/accuracy dial like ``ops/token_merge.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-8


def quantize_axes(x: Array, axes: tuple[int, ...]) -> tuple[Array, Array]:
    """Symmetric int8 with one scale per remaining index (abs-max over
    ``axes``, kept as broadcastable size-1 dims).

    Returns (q int8 same shape, scale f32 with ``axes`` reduced to 1).
    """
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=axes, keepdims=True),
                        _EPS) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_rows(x: Array) -> tuple[Array, Array]:
    """Quantize over the LAST axis: per-row symmetric int8.

    Returns (q int8 same shape, scale f32 shape x.shape[:-1] + (1,)).
    """
    return quantize_axes(x, (x.ndim - 1,))


def quantize_cols(w: Array) -> tuple[Array, Array]:
    """Quantize a (K, ...) kernel over its FIRST (contracted) axis:
    per-output-channel symmetric int8.

    Returns (q int8 same shape, scale f32 shape w.shape[1:]).
    """
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), _EPS) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_dense(x: Array, kernel: Array, bias: Array | None = None,
               out_dtype=None) -> Array:
    """Drop-in ``x @ kernel + bias`` with dynamic W8A8 quantization.

    x: (..., K) any float dtype; kernel: (K, N) f32 param.
    Output: (..., N) in ``out_dtype`` (default x.dtype).
    """
    wq, wscale = quantize_cols(kernel)
    xq, xscale = quantize_rows(x)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * xscale * wscale
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype or x.dtype)


def int8_einsum(spec: str, x: Array, w: Array,
                xscale: Array, wscale: Array, out_dtype=None) -> Array:
    """int8 einsum with pre-computed scales, rescaled to float.

    ``x``/``w`` must already be int8; ``xscale``/``wscale`` must be
    broadcastable against the einsum OUTPUT shape (caller aligns axes).
    """
    acc = jnp.einsum(spec, x, w, preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * xscale * wscale
    return out.astype(out_dtype or jnp.bfloat16)


def int8_conv(x: Array, kernel: Array, bias: Array | None = None,
              strides=(1, 1), padding="SAME", out_dtype=None) -> Array:
    """Dynamic W8A8 NHWC conv: ``conv(x, kernel) + bias`` on the int8 MXU.

    Measured 268 vs 180 TF/s bf16 for 3x3/256-ch at DPT shapes
    (perf/int8 conv microbench; narrow-channel convs LOSE — callers gate
    on channel width). Activations get one symmetric scale per batch
    image (max over H, W, C — convs mix spatial positions, so per-pixel
    scales would not factor out of the accumulator); weights one scale
    per output channel.
    """
    wf = kernel.astype(jnp.float32)
    wscale = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)), _EPS) / 127.0
    wq = jnp.clip(jnp.round(wf / wscale), -127, 127).astype(jnp.int8)
    xf = x.astype(jnp.float32)
    xscale = jnp.maximum(jnp.max(jnp.abs(xf), axis=(1, 2, 3),
                                 keepdims=True), _EPS) / 127.0
    xq = jnp.clip(jnp.round(xf / xscale), -127, 127).astype(jnp.int8)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    acc = jax.lax.conv_general_dilated(
        xq, wq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * xscale * wscale
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype or x.dtype)
