"""Preprocessing: host-side exact resize + device-side batch preparation.

Two resize paths share identical resampling weights
(``ops.resize._antialias_matrix``), so host and device produce the same
pixels:

- ``host_resize_*``: numpy matmuls in loader threads — used when a batch
  mixes native resolutions (combined SimCol+C3VD) and for eval pipelines;
- ``DevicePreprocessor``: a jitted program that takes raw uint8/uint16
  batches, does /255 and /65535 scaling (reference
  ``simcol.py:161-165``), bicubic resize to the model size, training
  augmentations (``ops.augment``) and ImageNet normalization — the
  reference's CPU-worker transform stack fused into one device program.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import augment as aug
from ..ops.resize import _antialias_matrix, resize_antialias

Array = jax.Array


# ------------------------------- host path -----------------------------------


def _host_resize(x: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """(H, W[, C]) float32 resize via the shared bicubic-antialias weights."""
    mat_h = _antialias_matrix(x.shape[0], out_hw[0], "bicubic")
    mat_w = _antialias_matrix(x.shape[1], out_hw[1], "bicubic")
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    y = np.einsum("oh,hwc->owc", mat_h, x.astype(np.float32), optimize=True)
    y = np.einsum("ow,hwc->hoc", mat_w, y, optimize=True)
    return y[..., 0] if squeeze else y


def host_resize_image(img_uint8: np.ndarray, size: int) -> np.ndarray:
    """uint8 RGB -> [0,1] f32 at (size, size)."""
    return _host_resize(img_uint8.astype(np.float32) / 255.0, (size, size))


def host_resize_depth(depth_uint16: np.ndarray, size: int) -> np.ndarray:
    """uint16 depth -> [0,1] f32 at (size, size)."""
    return _host_resize(depth_uint16.astype(np.float32) / 65535.0,
                        (size, size))


# ------------------------------ device path ----------------------------------


class DevicePreprocessor:
    """Raw (or host-resized) numpy batches -> model-ready device batches."""

    def __init__(self, size: int = 518,
                 augment_cfg: aug.AugmentConfig | None = None):
        self.size = size
        self.augment_cfg = augment_cfg or aug.AugmentConfig()

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _process(self, rng: Array, image: Array, is_raw_uint8: bool,
                 depth: Array) -> tuple[Array, Array]:
        size = self.size
        if is_raw_uint8:
            img01 = image.astype(jnp.float32) / 255.0
            dep01 = depth.astype(jnp.float32) / 65535.0
            img01 = resize_antialias(img01, (size, size))
            dep01 = resize_antialias(dep01[..., None], (size, size))
        else:
            img01 = image
            dep01 = depth[..., None] if depth.ndim == 3 else depth
        img = aug.augment_batch(rng, img01, self.augment_cfg)
        return img, dep01

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def _process_eval(self, image: Array, is_raw_uint8: bool,
                      depth: Array) -> tuple[Array, Array]:
        size = self.size
        if is_raw_uint8:
            img01 = image.astype(jnp.float32) / 255.0
            dep01 = depth.astype(jnp.float32) / 65535.0
            img01 = resize_antialias(img01, (size, size))
            dep01 = resize_antialias(dep01[..., None], (size, size))
        else:
            img01 = image
            dep01 = depth[..., None] if depth.ndim == 3 else depth
        return aug.preprocess_eval(img01), dep01

    def __call__(self, batch: dict[str, Any], train: bool,
                 rng: Array | None = None,
                 max_depths: tuple[float, float] | None = None
                 ) -> dict[str, Array]:
        """batch: loader output. Returns {image, depth[, max_depth]} arrays.

        ``max_depths``: (simcol_max, c3vd_max_in_cm) for combined batches
        carrying a ``source`` field; C3VD depths are additionally scaled
        by 0.1 (mm -> cm convention of
        ``lightning_model_combined.py:239-241``).
        """
        image = jnp.asarray(batch["image"])
        depth = jnp.asarray(batch["depth"])
        is_raw = image.dtype == jnp.uint8
        if train:
            assert rng is not None
            img, dep = self._process(rng, image, bool(is_raw), depth)
        else:
            img, dep = self._process_eval(image, bool(is_raw), depth)

        out = {"image": img, "depth": dep}
        if "source" in batch and max_depths is not None:
            src = batch["source"]
            # No np.asarray on jax arrays: a global (multi-host) batch leaf
            # is not fully addressable and must stay on device.
            source = src if isinstance(src, jax.Array) else \
                jnp.asarray(np.asarray(src))
            scale = jnp.where(source == 1, 0.1, 1.0).astype(jnp.float32)
            out["depth"] = dep * scale[:, None, None, None]
            out["max_depth"] = jnp.where(
                source == 1, max_depths[1], max_depths[0]).astype(jnp.float32)
            out["source"] = source
        return out
