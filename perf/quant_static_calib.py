"""Static-calibration int8 vs dynamic int8: deviation + speed (VERDICT r3 #3).

Dynamic W8A8 quantizes activations per token row inside the forward;
static calibration (ops/quant.py calibrate_scales / with_frozen_scales)
freezes one per-tensor scale per site from K calibration batches,
removing the activation abs-max VPU pass but coarsening the quant grid.
This script answers: does static beat dynamic's ~1.9% output deviation,
and what does dropping the dynamic quantize pass buy in time?

Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/quant_static_calib.py
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from perf._timing import log, time_fn  # noqa: E402

SIZE = 518
BS = 8


def main() -> None:
    from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.models import (  # noqa: E501
        build_depth_model,
    )
    from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.ops.quant import (  # noqa: E501
        calibrate_scales,
        with_frozen_scales,
    )

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)

    # Real frame -> ImageNet-normalized 518 batch (same recipe as the
    # deviation runs behind perf/quant_int8_dev.log).
    import cv2

    img = cv2.imread("/root/reference/FrameBuffer_0051.png")[:, :, ::-1]
    img = cv2.resize(img.astype(np.float32) / 255.0, (SIZE, SIZE))
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    base = (img - mean) / std
    batch = jnp.asarray(np.stack([base] * BS).astype(np.float32))
    # Calibration set: the frame under small photometric jitter.
    calib = [jnp.asarray(np.stack(
        [base * (1 + 0.05 * rng.normal()) + 0.02 * rng.normal()] * BS)
        .astype(np.float32)) for _ in range(4)]

    mf = build_depth_model("vitl", max_depth=20.0, dtype=jnp.float32)
    mq = build_depth_model("vitl", max_depth=20.0, dtype=jnp.bfloat16,
                           quant_int8=True)
    mb = build_depth_model("vitl", max_depth=20.0, dtype=jnp.bfloat16)
    params = jax.jit(lambda r: mf.init(r, batch[:1])["params"])(
        jax.random.PRNGKey(0))

    log("calibrating (4 batches)...")
    # params as jit ARGS everywhere — closure capture constant-folds the
    # weight quantization and hangs the compile for 20+ min at vitl scale.
    amax = calibrate_scales(lambda x, p: mq.apply({"params": p}, x),
                            calib, params)
    log(f"calibrated {amax.shape[0]} activation sites, "
        f"amax range [{float(amax.min()):.3g}, {float(amax.max()):.3g}]")

    def fq(p, x):
        return mq.apply({"params": p}, x)

    d_f32 = np.asarray(jax.jit(
        lambda p, x: mf.apply({"params": p}, x))(params, batch), np.float32)
    d_bf16 = np.asarray(jax.jit(
        lambda p, x: mb.apply({"params": p}, x))(params, batch), np.float32)
    d_dyn = np.asarray(jax.jit(fq)(params, batch), np.float32)
    d_sta = np.asarray(jax.jit(with_frozen_scales(fq, amax))(params, batch),
                       np.float32)

    ref = np.abs(d_f32).mean()
    for name, d in (("bf16", d_bf16), ("int8-dynamic", d_dyn),
                    ("int8-static", d_sta)):
        dev = np.abs(d - d_f32).mean() / ref
        print(f"deviation vs f32 [{name}]: {dev * 100:.2f}% mean",
              flush=True)

    def step_dyn(acc, p, x):
        return jnp.mean(mq.apply({"params": p}, x + acc * 1e-9))

    frozen = with_frozen_scales(fq, amax)

    def step_sta(acc, p, x):
        return jnp.mean(frozen(p, x + acc * 1e-9))

    per_d = time_fn(step_dyn, params, batch, iters=30, label="int8-dyn bs8")
    per_s = time_fn(step_sta, params, batch, iters=30, label="int8-sta bs8")
    print(f"int8 dynamic bs{BS}: {per_d * 1000:.2f} ms/batch | "
          f"static: {per_s * 1000:.2f} ms/batch "
          f"({(per_d - per_s) * 1000:+.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
