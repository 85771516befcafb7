"""Measure the QConv extension to DPT project_{i}/resize_3 convs (int8 mode).

Baseline (committed, int8 without projection-conv quant):
  bs8 87.44 ms/batch, bs64 757.66 ms/batch (perf/quant_int8_dpt.log).
Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/quant_proj_ext.py
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


def main() -> None:
    from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.models import (  # noqa: E501
        build_depth_model,
    )

    log(f"backend={jax.default_backend()}")
    model = build_depth_model("vitl", max_depth=20.0, dtype=jnp.bfloat16,
                              quant_int8=True)
    for bs in (8, 64):
        image = jnp.asarray(np.random.default_rng(0)
                            .normal(size=(bs, SIZE, SIZE, 3))
                            .astype(np.float32))
        shapes = jax.eval_shape(
            lambda r: model.init(r, image[:1])["params"],
            jax.random.PRNGKey(0))
        params = jax.tree.map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)

        def step(acc, p, x):
            d = model.apply({"params": p}, x + acc * 1e-9)
            return jnp.mean(d)

        per = time_fn(step, params, image, iters=10, label=f"int8+proj bs{bs}")
        print(f"int8+projconv bs{bs}: {per * 1000:.2f} ms/batch  "
              f"{per * 1000 / bs:.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
