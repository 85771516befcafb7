"""Component-level timing of the flagship vitl-518 forward at batch 8.

Times (separately jitted): full model, encoder-only, DPT-head-only.
Run on the real TPU:  PYTHONPATH=/root/repo:/root/.axon_site python perf/components_bench.py
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from perf._timing import log, time_fn  # noqa: E402

B, SIZE = int(os.environ.get("BENCH_B", "8")), 518


def fill_params(model, *args):
    shapes = jax.eval_shape(lambda r: model.init(r, *args)["params"],
                            jax.random.PRNGKey(0))
    return jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)


def main() -> None:
    from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.models import (  # noqa: E501
        build_depth_model,
    )
    from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.models.dinov2 import (  # noqa: E501
        DinoViT,
    )
    from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.models.dpt import (  # noqa: E501
        DPTHead,
    )

    log(f"backend={jax.default_backend()}")
    which = os.environ.get("COMPONENT", "full")  # full|encoder|dpt
    image = jnp.asarray(np.random.default_rng(0)
                        .normal(size=(B, SIZE, SIZE, 3)).astype(np.float32))
    results = {}

    if which in ("full", "all"):
        model = build_depth_model("vitl", max_depth=20.0, dtype=jnp.bfloat16)
        params = fill_params(model, image[:1])

        def step(acc, p, x):
            d = model.apply({"params": p}, x + acc * 1e-9)
            return jnp.mean(d)
        results["full_ms"] = time_fn(step, params, image, iters=10,
                                     label="full") * 1000

    if which in ("encoder", "all"):
        enc = DinoViT(encoder="vitl", dtype=jnp.bfloat16)
        params = fill_params(enc, image[:1])

        def estep(acc, p, x):
            taps = enc.apply({"params": p}, x + acc * 1e-9)
            return sum(jnp.mean(t.astype(jnp.float32)) for t, _ in taps)
        results["encoder_ms"] = time_fn(estep, params, image, iters=10,
                                        label="encoder") * 1000

    if which in ("dpt", "all"):
        head = DPTHead(embed_dim=1024, features=256,
                       out_channels=(256, 512, 1024, 1024),
                       dtype=jnp.bfloat16)
        rng = np.random.default_rng(1)
        taps = [(jnp.asarray(rng.normal(size=(B, 37 * 37, 1024)),
                             jnp.bfloat16),
                 jnp.asarray(rng.normal(size=(B, 1024)), jnp.bfloat16))
                for _ in range(4)]
        params = fill_params(head, taps, 37, 37)

        def dstep(acc, p, t0):
            taps2 = [((t + acc * 1e-9).astype(jnp.bfloat16), c)
                     for t, c in t0]
            d = head.apply({"params": p}, taps2, 37, 37)
            return jnp.mean(d.astype(jnp.float32))
        results["dpt_ms"] = time_fn(dstep, params, taps, iters=10,
                                    label="dpt") * 1000

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
