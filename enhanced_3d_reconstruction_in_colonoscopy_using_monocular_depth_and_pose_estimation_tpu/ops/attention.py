"""Multi-head self-attention dispatch: Pallas flash attention on TPU,
plain-XLA reference path everywhere else.

The ViT encoder (1370 tokens at 518 px) is the FLOPs hot spot of the whole
framework (reference hot path: ``lightning_model.py:185`` -> external DINOv2
attention). The Pallas kernel lives in ``ops/flash_attention.py``; this module
picks an implementation per platform and exposes one functional API.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

Array = jax.Array

_FORCE_XLA = False
_FORCE_FUSED = False


def set_force_xla(value: bool) -> None:
    """Test hook: force the XLA path even on TPU."""
    global _FORCE_XLA
    _FORCE_XLA = value


def set_force_fused(value: bool) -> None:
    """Test hook: force the fused-projection Pallas path off-TPU (the
    kernel runs in interpret mode there), so the exact graph executed on
    hardware — including the ``models/dinov2.py`` fused-branch wiring —
    is covered by CPU tests."""
    global _FORCE_FUSED
    _FORCE_FUSED = value


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def mha_xla(q: Array, k: Array, v: Array) -> Array:
    """Reference attention: (B, N, H, D) -> (B, N, H, D), softmax in f32."""
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v)


def multi_head_attention(q: Array, k: Array, v: Array) -> Array:
    """Self-attention over (B, N, H, D) tensors.

    Uses the Pallas TPU flash-attention kernel when running on TPU (forward
    and backward), and the XLA einsum path on CPU/GPU and in tests.
    """
    if not _FORCE_XLA and _on_tpu():
        from .flash_attention import flash_attention
        return flash_attention(q, k, v)
    return mha_xla(q, k, v)


def use_fused_qkv() -> bool:
    """Whether the encoder should take the fused-layout projection path
    (project q/k^T/v straight into the Pallas kernel's layouts)."""
    if _FORCE_FUSED:
        return True
    return not _FORCE_XLA and _on_tpu()


def qkv_self_attention(x: Array, w_qkv: Array, b_qkv: Array,
                       w_proj: Array, b_proj: Array, num_heads: int,
                       interpret: bool | None = None,
                       quant: bool = False,
                       n_valid: int | None = None) -> Array:
    """Self-attention of x (B, N, C) with packed qkv/proj weights, fused
    q/k^T/v projection layouts feeding the Pallas kernel directly.

    ``w_qkv`` (C, 3C) / ``b_qkv`` (3C,) are the standard packed projection
    parameters (column order = reshape(3, H, D), as in the reference's
    single qkv Linear); ``w_proj`` (C, C) / ``b_proj`` (C,). Everything is
    computed in x.dtype (bf16 on the model path) with the same contraction
    order as the Dense-based path, so results match it to rounding.

    ``n_valid``: when the caller keeps a pad-once residual stream
    (``models/dinov2.py``: tokens padded to the kernel block multiple once
    at embedding), x arrives pre-padded to ``padded_len(n_valid)`` — the
    pad and the output slice below become no-ops and the result keeps the
    padded row count. Rows >= n_valid of the output are garbage-but-finite
    and must never feed valid rows (attention masks padded keys; every
    other encoder op is token-wise).

    Design note: the token pad to the kernel's block multiple happens ONCE
    on x, and every layout change (head split, K transpose, head merge)
    rides a matmul epilogue — replacing ~5 standalone XLA transpose/pad
    copies of (B, N, H*D) per encoder layer in the unfused path.
    """
    from .flash_attention import flash_attention_fused, padded_len

    b, n, c = x.shape
    h = num_heads
    hd = c // h
    if n_valid is None:
        n_valid = n
    np_ = padded_len(n_valid)
    assert n in (n_valid, np_), (n, n_valid, np_)
    xp = jnp.pad(x, ((0, 0), (0, np_ - n), (0, 0))) if np_ != n else x
    bias = b_qkv.astype(x.dtype).reshape(3, h, hd)
    if quant:
        from .quant import int8_einsum, quantize_cols, quantize_rows

        # W8A8 projections in the SAME fused layouts: the int8 GEMMs
        # ride the MXU at 2x rate; scales broadcast onto the outputs.
        # (A packed single-GEMM variant with bf16 output transposes
        # measured strictly worse — CLAUDE.md int8 notes.)
        xq, xs = quantize_rows(xp)                      # (b,n,c), (b,n,1)
        wq, wsc = quantize_cols(w_qkv)                  # (c,3c), (3c,)
        wq = wq.reshape(c, 3, h, hd)
        wsc = wsc.reshape(3, h, hd)
        q = int8_einsum("bnc,chd->bhnd", xq, wq[:, 0],
                        xs[:, None, :, :], wsc[0][None, :, None, :],
                        x.dtype) + bias[0][None, :, None, :]
        kt = int8_einsum("bnc,chd->bhdn", xq, wq[:, 1],
                         xs[:, None, :, 0][:, :, None, :],
                         wsc[1][None, :, :, None],
                         x.dtype) + bias[1][None, :, :, None]
        v = int8_einsum("bnc,chd->bhnd", xq, wq[:, 2],
                        xs[:, None, :, :], wsc[2][None, :, None, :],
                        x.dtype) + bias[2][None, :, None, :]
    else:
        w = w_qkv.astype(x.dtype).reshape(c, 3, h, hd)
        q = (jnp.einsum("bnc,chd->bhnd", xp, w[:, 0])
             + bias[0][None, :, None, :])
        kt = (jnp.einsum("bnc,chd->bhdn", xp, w[:, 1])
              + bias[1][None, :, :, None])
        v = (jnp.einsum("bnc,chd->bhnd", xp, w[:, 2])
             + bias[2][None, :, None, :])
    out = flash_attention_fused(q, kt, v, n_valid=n_valid,
                                interpret=interpret)
    out = out[:, :, :n]                                  # (b, h, n, hd)
    if quant:
        from .quant import int8_einsum, quantize_axes, quantize_cols

        # Contraction spans (h, d): one scale per (b, n) token row.
        oq, osc = quantize_axes(out, (1, 3))            # (b,1,n,1) scale
        pq, psc = quantize_cols(w_proj)                 # (c,c),(c,)
        y = int8_einsum("bhnd,hdc->bnc", oq, pq.reshape(h, hd, c),
                        osc[:, 0], psc[None, None, :], x.dtype)
        return y + b_proj.astype(y.dtype)
    y = jnp.einsum("bhnd,hdc->bnc", out,
                   w_proj.astype(x.dtype).reshape(h, hd, c))
    return y + b_proj.astype(y.dtype)
