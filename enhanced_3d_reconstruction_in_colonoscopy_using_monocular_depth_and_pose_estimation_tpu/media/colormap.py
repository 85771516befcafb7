"""Depth visualization: Spectral colormaps, grayscale, composites.

Reference: ``depth_to_heatmap`` (``/root/reference/data_processing/
utils.py:17-39``, Spectral_r) and the run.py output path
(``run.py:242-262``: min-max normalize -> uint8 -> grayscale or Spectral
colormap -> optional side-by-side with a white divider).
"""

from __future__ import annotations

import numpy as np


def _minmax_uint8(depth: np.ndarray) -> np.ndarray:
    lo, hi = float(np.min(depth)), float(np.max(depth))
    scale = 255.0 / (hi - lo) if hi > lo else 0.0
    return ((depth - lo) * scale).astype(np.uint8)


def depth_to_heatmap(depth: np.ndarray) -> np.ndarray:
    """Min-max normalized Spectral_r heatmap, RGB uint8."""
    import matplotlib.pyplot as plt

    lo, hi = float(np.min(depth)), float(np.max(depth))
    norm = (depth - lo) / (hi - lo) if hi > lo else np.zeros_like(depth)
    cmap = plt.get_cmap("Spectral_r")
    return (cmap(norm)[:, :, :3] * 255).astype(np.uint8)


def colorize_depth(depth: np.ndarray, grayscale: bool = False,
                   bgr: bool = True) -> np.ndarray:
    """run.py-style rendering: minmax->uint8, gray 3-channel or Spectral.

    Returns BGR by default (cv2.imwrite convention, matching run.py:248).
    """
    import matplotlib

    d8 = _minmax_uint8(depth)
    if grayscale:
        return np.repeat(d8[..., None], 3, axis=-1)
    cmap = matplotlib.colormaps.get_cmap("Spectral")
    rgb = (cmap(d8)[:, :, :3] * 255).astype(np.uint8)
    return rgb[:, :, ::-1] if bgr else rgb


def side_by_side(raw_bgr: np.ndarray, rendered_bgr: np.ndarray,
                 gap: int = 50) -> np.ndarray:
    """Original frame | white divider | rendering (run.py:252-262)."""
    divider = np.full((raw_bgr.shape[0], gap, 3), 255, np.uint8)
    return np.concatenate([raw_bgr, divider, rendered_bgr], axis=1)
