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


def set_force_xla(value: bool) -> None:
    """Test hook: force the XLA path even on TPU."""
    global _FORCE_XLA
    _FORCE_XLA = value


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
