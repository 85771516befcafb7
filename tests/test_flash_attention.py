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


def test_backward_fused_kernel_matches_xla(rng, monkeypatch):
    """The fused single-kernel backward (E3D_FLASH_BWD_FUSED: dk/dv plus
    dq accumulated across key-block grid steps in one pass) must produce
    the same gradients as the split dq/dkv kernels and the XLA reference,
    on both the padded (150 -> 160) and exact-multiple sequence lengths."""
    from e3d_tpu.ops import flash_attention as fa

    monkeypatch.setattr(fa, "_BWD_FUSED", True)
    for n in (150, 128):
        q, k, v = make_qkv(rng, b=1, n=n, h=2, d=16)

        def loss_flash(q, k, v):
            return jnp.sum(jnp.sin(flash_attention(q, k, v, interpret=True)))

        def loss_xla(q, k, v):
            return jnp.sum(jnp.sin(mha_xla(q, k, v)))

        with jax.default_matmul_precision("highest"):
            g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
            g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_flash, g_xla, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-4, err_msg=f"n{n} d{name}")


def test_fused_qkv_path_gradients_with_fused_bwd(rng, monkeypatch):
    """The kt-layout custom VJP routed through the fused backward kernel
    matches the XLA reference (covers the swapaxes seams around _bwd)."""
    from e3d_tpu.ops import attention as attn_ops
    from e3d_tpu.ops import flash_attention as fa

    monkeypatch.setattr(fa, "_BWD_FUSED", True)
    b, n, c, h = 1, 130, 32, 2
    x = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    w_qkv = jnp.asarray(rng.normal(size=(c, 3 * c)).astype(np.float32)) * 0.2
    b_qkv = jnp.zeros((3 * c,), jnp.float32)
    w_proj = jnp.asarray(rng.normal(size=(c, c)).astype(np.float32)) * 0.2
    b_proj = jnp.zeros((c,), jnp.float32)

    def loss_fused(x, w_qkv, w_proj):
        y = attn_ops.qkv_self_attention(x, w_qkv, b_qkv, w_proj, b_proj,
                                        num_heads=h, interpret=True)
        return jnp.sum(jnp.sin(y))

    def loss_ref(x, w_qkv, w_proj):
        qkv = (x @ w_qkv + b_qkv).reshape(b, n, 3, h, c // h)
        y = mha_xla(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
        y = y.reshape(b, n, c) @ w_proj + b_proj
        return jnp.sum(jnp.sin(y))

    with jax.default_matmul_precision("highest"):
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w_qkv, w_proj)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w_qkv, w_proj)
    for a, e, name in zip(g_fused, g_ref, ("x", "w_qkv", "w_proj")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=5e-4,
                                   err_msg=f"d{name}")


def test_fused_qkv_path_matches_dense_path(rng, monkeypatch):
    """The fused-layout projection path (qkv_self_attention: pad-once,
    transposes fused into the projection einsums, Pallas kernel) must match
    the Dense + mha_xla path on the same packed weights."""
    from e3d_tpu.ops import attention as attn_ops

    b, n, c, h = 2, 150, 48, 3
    x = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    w_qkv = jnp.asarray(rng.normal(size=(c, 3 * c)).astype(np.float32)) * 0.2
    b_qkv = jnp.asarray(rng.normal(size=(3 * c,)).astype(np.float32)) * 0.1
    w_proj = jnp.asarray(rng.normal(size=(c, c)).astype(np.float32)) * 0.2
    b_proj = jnp.asarray(rng.normal(size=(c,)).astype(np.float32)) * 0.1

    with jax.default_matmul_precision("highest"):
        fused = attn_ops.qkv_self_attention(
            x, w_qkv, b_qkv, w_proj, b_proj, num_heads=h, interpret=True)
        qkv = (x @ w_qkv + b_qkv).reshape(b, n, 3, h, c // h)
        ref = mha_xla(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
        ref = ref.reshape(b, n, c) @ w_proj + b_proj
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=3e-5)


def test_fused_qkv_path_gradients(rng):
    """Gradients through the fused path (incl. the kt-layout custom VJP)
    match the XLA reference path."""
    from e3d_tpu.ops import attention as attn_ops

    b, n, c, h = 1, 130, 32, 2
    x = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    w_qkv = jnp.asarray(rng.normal(size=(c, 3 * c)).astype(np.float32)) * 0.2
    b_qkv = jnp.zeros((3 * c,), jnp.float32)
    w_proj = jnp.asarray(rng.normal(size=(c, c)).astype(np.float32)) * 0.2
    b_proj = jnp.zeros((c,), jnp.float32)

    def loss_fused(x, w_qkv, w_proj):
        y = attn_ops.qkv_self_attention(x, w_qkv, b_qkv, w_proj, b_proj,
                                        num_heads=h, interpret=True)
        return jnp.sum(jnp.sin(y))

    def loss_ref(x, w_qkv, w_proj):
        qkv = (x @ w_qkv + b_qkv).reshape(b, n, 3, h, c // h)
        y = mha_xla(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
        y = y.reshape(b, n, c) @ w_proj + b_proj
        return jnp.sum(jnp.sin(y))

    with jax.default_matmul_precision("highest"):
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w_qkv, w_proj)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w_qkv, w_proj)
    for a, e, name in zip(g_fused, g_ref, ("x", "w_qkv", "w_proj")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=5e-4,
                                   err_msg=f"d{name}")


def test_model_level_fused_path_parity(rng):
    """Whole-model coverage of the TPU-executed fused projection wiring
    (models/dinov2.py Attention fused branch): a vitt forward + gradient
    with qkv_self_attention FORCED (Pallas interpret mode) must match the
    XLA branch to <=1e-3 (VERDICT r2 next #6)."""
    from e3d_tpu.models import build_depth_model
    from e3d_tpu.ops import attention as attn_ops

    model = build_depth_model("vitt", max_depth=20.0, dtype=jnp.float32,
                              grad_checkpoint=False)
    image = jnp.asarray(rng.normal(size=(1, 56, 56, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.5, 19.0, size=(1, 56, 56))
                        .astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), image)["params"]

    def loss_fn(p):
        pred = model.apply({"params": p}, image)
        return jnp.mean((pred - depth) ** 2)

    with jax.default_matmul_precision("highest"):
        loss_xla, grads_xla = jax.value_and_grad(loss_fn)(params)
        attn_ops.set_force_fused(True)
        try:
            loss_fused, grads_fused = jax.value_and_grad(loss_fn)(params)
        finally:
            attn_ops.set_force_fused(False)

    np.testing.assert_allclose(float(loss_fused), float(loss_xla),
                               rtol=1e-3)
    flat_x, _ = jax.tree_util.tree_flatten_with_path(grads_xla)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(grads_fused)
    for (path, gx), (_, gf) in zip(flat_x, flat_f):
        scale = max(float(jnp.max(jnp.abs(gx))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), atol=1e-3 * scale,
            err_msg=jax.tree_util.keystr(path))
