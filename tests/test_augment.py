"""Augmentation ops: color conversions, jitter identity, affine, batch
determinism."""

import jax
import jax.numpy as jnp
import numpy as np

import e3d_tpu  # noqa: F401
from e3d_tpu.ops import augment as aug


def test_hsv_roundtrip(rng):
    img = jnp.asarray(rng.uniform(0, 1, size=(16, 16, 3)).astype(np.float32))
    h, s, v = aug._rgb_to_hsv(img)
    back = aug._hsv_to_rgb(h, s, v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-5)


def test_hue_shift_full_circle_identity(rng):
    img = jnp.asarray(rng.uniform(0, 1, size=(8, 8, 3)).astype(np.float32))
    out = aug.adjust_hue(img, jnp.asarray(1.0))  # full wrap
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_brightness_contrast_saturation_identity(rng):
    img = jnp.asarray(rng.uniform(0, 1, size=(8, 8, 3)).astype(np.float32))
    one = jnp.asarray(1.0)
    for fn in (aug.adjust_brightness, aug.adjust_contrast,
               aug.adjust_saturation):
        np.testing.assert_allclose(np.asarray(fn(img, one)),
                                   np.asarray(img), atol=1e-6)


def test_grayscale_saturation_zero(rng):
    img = jnp.asarray(rng.uniform(0, 1, size=(8, 8, 3)).astype(np.float32))
    gray = aug.adjust_saturation(img, jnp.asarray(0.0))
    g = np.asarray(gray)
    np.testing.assert_allclose(g[..., 0], g[..., 1], atol=1e-6)
    np.testing.assert_allclose(g[..., 1], g[..., 2], atol=1e-6)


def test_random_affine_identity_bounds():
    """scale fixed at 1, translate 0 -> identity mapping."""
    img = jnp.asarray(np.arange(64, dtype=np.float32).reshape(8, 8, 1))
    out = aug.random_affine(jax.random.PRNGKey(0), img,
                            translate=(0.0, 0.0), scale_range=(1.0, 1.0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


def test_random_affine_zero_fill():
    """Strong downscale leaves zero-filled borders (torchvision fill=0)."""
    img = jnp.ones((32, 32, 3), jnp.float32)
    out = np.asarray(aug.random_affine(jax.random.PRNGKey(1), img,
                                       translate=(0.0, 0.0),
                                       scale_range=(0.25, 0.25)))
    assert out[0, 0, 0] == 0.0 and out[-1, -1, 0] == 0.0
    assert out[16, 16, 0] == 1.0
    # zoomed-out content occupies ~scale^2 of the area
    frac = (out > 0).mean()
    assert 0.03 < frac < 0.15


def test_augment_batch_deterministic(rng):
    imgs = jnp.asarray(rng.uniform(0, 1, size=(4, 16, 16, 3))
                       .astype(np.float32))
    cfg = aug.AugmentConfig()
    a = aug.augment_batch(jax.random.PRNGKey(7), imgs, cfg)
    b = aug.augment_batch(jax.random.PRNGKey(7), imgs, cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = aug.augment_batch(jax.random.PRNGKey(8), imgs, cfg)
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-3


def test_normalize_imagenet(rng):
    img = jnp.asarray(rng.uniform(0, 1, size=(4, 4, 3)).astype(np.float32))
    out = np.asarray(aug.normalize_imagenet(img))
    expected = (np.asarray(img) - [0.485, 0.456, 0.406]) / \
        [0.229, 0.224, 0.225]
    np.testing.assert_allclose(out, expected, atol=1e-6)
