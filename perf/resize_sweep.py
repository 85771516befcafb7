"""Sweep alternative formulations of the DPT align-corners bilinear resizes.

Targets the two hottest resizes (perf/dpt_ops3.jsonl):
  final_296_518: (8, 296, 296, 128) -> (518, 518)   measured 6.11 ms
  r1_148_296:    (8, 148, 148, 256) -> (296, 296)   measured 2.92 ms

Variants (select with RESIZE_IMPL, case with RESIZE_CASE):
  cur       current resize_align_corners (H einsum then W einsum)
  wfirst    W pass then H pass
  hreshape  H pass as (h2,h) @ (b, h, w*c) batched dot, then W einsum
  bothdot   both passes as batched jnp.matmul on reshaped natural layouts
  nchw      transpose to (b,c,h,w); both contractions on minor axes;
            transpose back
  onemm     single einsum "oh,pw,bhwc->bopc" (XLA chooses the order)
  gh_mm_w   H pass via 2-tap take+lerp (contiguous row gathers), W matmul
  f32mid    like cur but keep the intermediate in f32 (skip one cast)
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from perf._timing import time_fn  # noqa: E402

from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.ops.resize import (  # noqa: E501
    _align_corners_matrix,
    resize_align_corners,
)


def _align_corners_taps(n_in: int, n_out: int):
    """2-tap align-corners bilinear taps: (lo indices, fractions).

    Local to the sweep (the gather-based production path this once backed
    was removed from ops/resize.py as a measured dead end; the harness
    keeps the variant reproducible)."""
    if n_out == 1 or n_in == 1:
        coords = np.zeros(n_out, dtype=np.float64)
    else:
        coords = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.clip(np.floor(coords).astype(np.int64), 0, max(n_in - 2, 0))
    return lo, (coords - lo).astype(np.float32)

B = 8


def _mats(h, h2, w, w2, dtype):
    mh = jnp.asarray(_align_corners_matrix(h, h2, "bilinear"), dtype)
    mw = jnp.asarray(_align_corners_matrix(w, w2, "bilinear"), dtype)
    return mh, mw


def impl_cur(x, out_hw):
    return resize_align_corners(x, out_hw)


def impl_wfirst(x, out_hw):
    h2, w2 = out_hw
    b, h, w, c = x.shape
    mh, mw = _mats(h, h2, w, w2, x.dtype)
    y = jnp.einsum("ow,bhwc->bhoc", mw, x,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", mh, y,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return y


def impl_hreshape(x, out_hw):
    h2, w2 = out_hw
    b, h, w, c = x.shape
    mh, mw = _mats(h, h2, w, w2, x.dtype)
    y = jnp.matmul(mh, x.reshape(b, h, w * c),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    y = y.reshape(b, h2, w, c)
    y = jnp.einsum("ow,bhwc->bhoc", mw, y,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return y


def impl_bothdot(x, out_hw):
    h2, w2 = out_hw
    b, h, w, c = x.shape
    mh, mw = _mats(h, h2, w, w2, x.dtype)
    y = jnp.matmul(mh, x.reshape(b, h, w * c),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    y = y.reshape(b * h2, w, c)
    y = jnp.matmul(mw, y, preferred_element_type=jnp.float32).astype(x.dtype)
    return y.reshape(b, h2, w2, c)


def impl_nchw(x, out_hw):
    h2, w2 = out_hw
    b, h, w, c = x.shape
    mh, mw = _mats(h, h2, w, w2, x.dtype)
    t = jnp.transpose(x, (0, 3, 1, 2))  # (b, c, h, w)
    y = jnp.einsum("ow,bchw->bcho", mw, t,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    y = jnp.einsum("ph,bcho->bcpo", mh, y,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.transpose(y, (0, 2, 3, 1))


def impl_onemm(x, out_hw):
    h2, w2 = out_hw
    b, h, w, c = x.shape
    mh, mw = _mats(h, h2, w, w2, x.dtype)
    return jnp.einsum("oh,pw,bhwc->bopc", mh, mw, x,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def impl_gh_mm_w(x, out_hw):
    h2, w2 = out_hw
    b, h, w, c = x.shape
    lo, frac = _align_corners_taps(h, h2)
    lo_j = jnp.asarray(lo)
    fr = jnp.asarray(frac).reshape(1, h2, 1, 1).astype(jnp.float32)
    a = jnp.take(x, lo_j, axis=1).astype(jnp.float32)
    bb = jnp.take(x, lo_j + 1, axis=1).astype(jnp.float32)
    y = (a + (bb - a) * fr).astype(x.dtype)
    _, mw = _mats(h, h2, w, w2, x.dtype)
    y = jnp.einsum("ow,bhwc->bhoc", mw, y,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return y


def impl_lerp2(x, out_hw):
    """Both axes via 2-tap take+lerp in bf16 (no matmuls). Gathers on the
    row axis are contiguous (w*c) blocks; on the col axis, c blocks."""
    h2, w2 = out_hw
    b, h, w, c = x.shape

    def axis_lerp(t, n_in, n_out, axis):
        lo, frac = _align_corners_taps(n_in, n_out)
        lo_j = jnp.asarray(lo)
        shape = [1] * t.ndim
        shape[axis] = n_out
        f = jnp.asarray(frac).reshape(shape).astype(t.dtype)
        a = jnp.take(t, lo_j, axis=axis)
        bb = jnp.take(t, lo_j + 1, axis=axis)
        return a + (bb - a) * f

    y = axis_lerp(x, h, h2, 1)
    return axis_lerp(y, w, w2, 2)


def impl_f32mid(x, out_hw):
    h2, w2 = out_hw
    b, h, w, c = x.shape
    mh, mw = _mats(h, h2, w, w2, x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", mh, x,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("ow,bhwc->bhoc", mw.astype(jnp.float32), y,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


IMPLS = {
    "cur": impl_cur,
    "wfirst": impl_wfirst,
    "hreshape": impl_hreshape,
    "bothdot": impl_bothdot,
    "nchw": impl_nchw,
    "onemm": impl_onemm,
    "gh_mm_w": impl_gh_mm_w,
    "f32mid": impl_f32mid,
    "lerp2": impl_lerp2,
}

CASES = {
    "final": ((B, 296, 296, 128), (518, 518)),
    "r1": ((B, 148, 148, 256), (296, 296)),
    "r2": ((B, 74, 74, 256), (148, 148)),
    "r3": ((B, 37, 37, 256), (74, 74)),
    "r4": ((B, 19, 19, 256), (37, 37)),
}


def main() -> None:
    impl_names = os.environ.get("RESIZE_IMPL", "cur").split(",")
    case = os.environ.get("RESIZE_CASE", "final")
    shape, out_hw = CASES[case]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    results = {}
    for name in impl_names:
        fn = IMPLS[name]

        def step(acc, x, fn=fn):
            xi = x + acc.astype(jnp.bfloat16) * 1e-9
            y = fn(xi, out_hw)
            return jnp.mean(y.astype(jnp.float32))

        results[f"{case}_{name}"] = round(
            time_fn(step, x, iters=20, label=f"{case}_{name}") * 1000, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
