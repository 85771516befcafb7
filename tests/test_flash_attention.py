"""Pallas flash attention (interpret mode on CPU) vs XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np

import e3d_tpu  # noqa: F401
from e3d_tpu.ops.attention import mha_xla
from e3d_tpu.ops.flash_attention import flash_attention


def make_qkv(rng, b=2, n=200, h=3, d=32):
    q = rng.normal(size=(b, n, h, d)).astype(np.float32)
    k = rng.normal(size=(b, n, h, d)).astype(np.float32)
    v = rng.normal(size=(b, n, h, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_forward_matches_xla(rng):
    q, k, v = make_qkv(rng)
    with jax.default_matmul_precision("highest"):
        expected = mha_xla(q, k, v)
        ours = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(expected),
                               atol=2e-5)


def test_forward_unpadded_seq(rng):
    q, k, v = make_qkv(rng, n=256)
    with jax.default_matmul_precision("highest"):
        expected = mha_xla(q, k, v)
        ours = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(expected),
                               atol=2e-5)


def test_backward_matches_xla(rng):
    q, k, v = make_qkv(rng, b=1, n=150, h=2, d=16)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, interpret=True)))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.sin(mha_xla(q, k, v)))

    with jax.default_matmul_precision("highest"):
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_xla, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4,
                                   err_msg=f"d{name}")
