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

Static calibration (one-shot): ``calibrate_scales`` traces a quantized
forward with a calibration tape active — every ACTIVATION quant site
(weights need no calibration, they are static) appends its per-tensor
abs-max — and maxes the tape over K batches. ``with_frozen_scales``
then rebuilds the forward so each site consumes its frozen per-tensor
scale instead of computing dynamic per-row scales, removing the
activation abs-max VPU pass. Site identity is trace order, which is
deterministic for a fixed model config and batch regime — calibrate at
the batch size you serve (the int8 auto scope is batch-dependent);
a site-count mismatch raises at trace time rather than misquantizing.
"""

from __future__ import annotations

import contextlib
import threading

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-8

# Calibration / frozen-scale mode. Thread-local and consulted at TRACE
# time only — enter the context inside the function you jit (see
# with_frozen_scales), never around an already-jitted callable (the
# mode is not part of the jit cache key by design: frozen scales are
# closure constants of a freshly built forward).
_MODE = threading.local()


@contextlib.contextmanager
def calibration(tape: list):
    """Record one f32 abs-max scalar per activation quant site into
    ``tape`` (traced values — stack and return them from the traced fn)."""
    _MODE.kind, _MODE.tape = "calib", tape
    try:
        yield
    finally:
        _MODE.kind = None


@contextlib.contextmanager
def frozen_scales(amax: Array):
    """Consume per-site frozen activation abs-max values (trace order)."""
    _MODE.kind, _MODE.amax, _MODE.idx = "static", amax, 0
    try:
        yield
        if _MODE.idx != amax.shape[0]:
            raise ValueError(
                f"frozen_scales: forward consumed {_MODE.idx} activation "
                f"quant sites but calibration recorded {amax.shape[0]} — "
                "calibrate with the same model config and batch regime")
    finally:
        _MODE.kind = None


def quantize_axes(x: Array, axes: tuple[int, ...]) -> tuple[Array, Array]:
    """Symmetric int8 with one scale per remaining index (abs-max over
    ``axes``, kept as broadcastable size-1 dims).

    Returns (q int8 same shape, scale f32 with ``axes`` reduced to 1).
    This is the ACTIVATION-side quantizer (weights use quantize_cols),
    so it is also where the calibration tape records and where frozen
    per-tensor scales substitute for the dynamic per-row ones.
    """
    xf = x.astype(jnp.float32)
    kind = getattr(_MODE, "kind", None)
    if kind == "static":
        i = _MODE.idx
        if i >= _MODE.amax.shape[0]:
            raise ValueError(
                f"frozen_scales: more activation quant sites than the "
                f"{_MODE.amax.shape[0]} calibrated")
        _MODE.idx = i + 1
        scale = jnp.maximum(_MODE.amax[i].astype(jnp.float32), _EPS) / 127.0
        q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
        return q, scale.reshape((1,) * x.ndim)
    if kind == "calib":
        _MODE.tape.append(jnp.max(jnp.abs(xf)).astype(jnp.float32))
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=axes, keepdims=True),
                        _EPS) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def calibrate_scales(apply_fn, batches, *args) -> jax.Array:
    """One-shot static calibration: per-site activation abs-max, maxed
    over ``batches``. ``apply_fn(batch, *args)`` must be the UNJITTED
    quantized forward; each batch must share the trace regime.

    Pass the PARAMS through ``*args``, never as a closure capture: a
    closed-over param tree becomes jit constants and XLA constant-folds
    the per-channel weight quantization of every layer — measured as a
    20+ minute compile hang at vitl scale on the v5e."""
    def tapped(b, *a):
        tape: list = []
        with calibration(tape):
            apply_fn(b, *a)
        if not tape:
            raise ValueError("calibrate_scales: forward hit no int8 "
                             "activation quant sites — is quant enabled?")
        return jnp.stack(tape)

    tapped_j = jax.jit(tapped)
    amax = None
    for b in batches:
        t = tapped_j(b, *args)
        amax = t if amax is None else jnp.maximum(amax, t)
    if amax is None:
        raise ValueError("calibrate_scales: no calibration batches")
    return jax.device_get(amax)


def with_frozen_scales(apply_fn, amax):
    """Wrap ``apply_fn`` so its traces consume the calibrated per-tensor
    activation scales (jit the RESULT of this, not the input)."""
    amax_arr = jnp.asarray(amax, jnp.float32)

    def fn(*args, **kwargs):
        with frozen_scales(amax_arr):
            return apply_fn(*args, **kwargs)

    return fn


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
    # Activation side routes through quantize_axes so the calibration
    # tape / frozen-scale modes cover conv sites too.
    xq, xscale = quantize_axes(x, (1, 2, 3))
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
