"""Device-side training augmentations (torchvision-parity), pure JAX.

The reference augments on CPU dataloader workers
(``/root/reference/data_processing/simcol.py:73-102``): after a bicubic
resize to 518, RandomHorizontalFlip, ColorJitter(hue=.2, contrast=.2,
brightness=.2, saturation=.1), RandomAffine(degrees=0, translate=(.1,.1),
scale=(.1,.9)), then ImageNet normalization. Depth targets get the resize
only — the geometric augmentations are applied to the *image only*, a
reference property preserved faithfully here (the depth never sees the
flip/affine, exactly as in ``simcol.py:122-135``).

TPU-native: everything runs vmapped and jitted on device, with an explicit
PRNG key per batch. ColorJitter matches torchvision semantics including the
random order of the four ops (via ``jax.random.permutation`` +
``lax.switch``); RandomAffine uses NEAREST resampling with zero fill, the
torchvision default.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# numpy constants: module-level device arrays would force backend init at
# import time (breaks host-only imports, e.g. fixture generation).
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class AugmentConfig(NamedTuple):
    hflip_prob: float = 0.5
    brightness: float = 0.2
    contrast: float = 0.2
    saturation: float = 0.1
    hue: float = 0.2
    translate: tuple[float, float] = (0.1, 0.1)
    scale_range: tuple[float, float] = (0.1, 0.9)


# --------------------------- color ops (HWC, [0,1]) ---------------------------


def _rgb_to_gray(img: Array) -> Array:
    # torchvision rgb_to_grayscale weights
    w = jnp.asarray([0.2989, 0.587, 0.114], img.dtype)
    return jnp.sum(img * w, axis=-1, keepdims=True)


def adjust_brightness(img: Array, factor: Array) -> Array:
    return jnp.clip(img * factor, 0.0, 1.0)


def adjust_contrast(img: Array, factor: Array) -> Array:
    mean = jnp.mean(_rgb_to_gray(img))
    return jnp.clip(img * factor + (1.0 - factor) * mean, 0.0, 1.0)


def adjust_saturation(img: Array, factor: Array) -> Array:
    gray = _rgb_to_gray(img)
    return jnp.clip(img * factor + (1.0 - factor) * gray, 0.0, 1.0)


def _rgb_to_hsv(img: Array) -> tuple[Array, Array, Array]:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe_delta = jnp.where(delta > 0, delta, 1.0)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta > 0, h, 0.0)
    h = (h / 6.0) % 1.0
    return h, s, v


def _hsv_to_rgb(h: Array, s: Array, v: Array) -> Array:
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(img: Array, shift: Array) -> Array:
    h, s, v = _rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    return _hsv_to_rgb((h + shift) % 1.0, s, v)


def color_jitter(rng: Array, img: Array, brightness: float, contrast: float,
                 saturation: float, hue: float) -> Array:
    """torchvision ColorJitter on one HWC image: random factors, random order."""
    k_order, k_b, k_c, k_s, k_h = jax.random.split(rng, 5)
    fb = jax.random.uniform(k_b, (), minval=1 - brightness,
                            maxval=1 + brightness)
    fc = jax.random.uniform(k_c, (), minval=1 - contrast, maxval=1 + contrast)
    fs = jax.random.uniform(k_s, (), minval=1 - saturation,
                            maxval=1 + saturation)
    fh = jax.random.uniform(k_h, (), minval=-hue, maxval=hue)
    order = jax.random.permutation(k_order, 4)

    branches = [
        lambda x: adjust_brightness(x, fb),
        lambda x: adjust_contrast(x, fc),
        lambda x: adjust_saturation(x, fs),
        lambda x: adjust_hue(x, fh),
    ]

    def body(i, x):
        return jax.lax.switch(order[i], branches, x)

    return jax.lax.fori_loop(0, 4, body, img)


# ------------------------------ geometric ops --------------------------------


def random_affine(rng: Array, img: Array, translate: tuple[float, float],
                  scale_range: tuple[float, float]) -> Array:
    """torchvision RandomAffine(degrees=0, NEAREST, fill=0) on HWC."""
    h, w = img.shape[0], img.shape[1]
    k_tx, k_ty, k_s = jax.random.split(rng, 3)
    # torchvision: max_dx = translate[0] * width (index 0 -> horizontal)
    max_dx = translate[0] * w
    max_dy = translate[1] * h
    tx = jnp.round(jax.random.uniform(k_tx, (), minval=-max_dx, maxval=max_dx))
    ty = jnp.round(jax.random.uniform(k_ty, (), minval=-max_dy, maxval=max_dy))
    s = jax.random.uniform(k_s, (), minval=scale_range[0],
                           maxval=scale_range[1])

    # Inverse map: out pixel -> in pixel around the image center.
    cy, cx = (h - 1) * 0.5, (w - 1) * 0.5
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    in_y = (yy - cy - ty) / s + cy
    in_x = (xx - cx - tx) / s + cx
    iy = jnp.round(in_y).astype(jnp.int32)
    ix = jnp.round(in_x).astype(jnp.int32)
    valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    iy = jnp.clip(iy, 0, h - 1)
    ix = jnp.clip(ix, 0, w - 1)
    out = img[iy, ix]
    return jnp.where(valid[..., None], out, 0.0)


# ------------------------------ batch pipeline -------------------------------


def normalize_imagenet(img: Array) -> Array:
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def _augment_one(rng: Array, img: Array, cfg: AugmentConfig) -> Array:
    k_flip, k_jit, k_aff = jax.random.split(rng, 3)
    flip = jax.random.uniform(k_flip, ()) < cfg.hflip_prob
    img = jnp.where(flip, img[:, ::-1], img)
    img = color_jitter(k_jit, img, cfg.brightness, cfg.contrast,
                       cfg.saturation, cfg.hue)
    img = random_affine(k_aff, img, cfg.translate, cfg.scale_range)
    return normalize_imagenet(img)


@functools.partial(jax.jit, static_argnums=(2,))
def augment_batch(rng: Array, images: Array, cfg: AugmentConfig) -> Array:
    """images: (B, H, W, 3) in [0, 1] (already resized). Returns normalized,
    augmented batch."""
    keys = jax.random.split(rng, images.shape[0])
    return jax.vmap(lambda k, x: _augment_one(k, x, cfg))(keys, images)


@jax.jit
def preprocess_eval(images: Array) -> Array:
    """Eval-path preprocessing: normalize only (resize happens upstream)."""
    return normalize_imagenet(images)
