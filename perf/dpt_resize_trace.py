"""In-model attribution of the DPT decoder resizes (VERDICT r4 #2).

Captures a jax.profiler trace of the full flagship forward (vitl 518,
batch 8) and sums device time for the HLO fusions whose metadata points
at ``resize_align_corners`` einsums, vs everything else. Evidence input
for perf/dpt_resize_closure.md.

Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/dpt_resize_trace.py
"""
import glob
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BS = int(os.environ.get("E3D_TRACE_BS", "8"))
SIZE = 518


def main() -> None:
    from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.models import (  # noqa: E501
        build_depth_model,
    )

    print(f"backend={jax.default_backend()}", flush=True)
    model = build_depth_model("vitl", max_depth=20.0, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, SIZE, SIZE, 3)))["params"],
        rng)
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype),
                          shapes)
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(BS, SIZE, SIZE, 3)).astype(np.float32))

    def many(p, img):
        def body(_, acc):
            d = model.apply({"params": p}, img + acc * 1e-9)
            return jnp.mean(d)
        return jax.lax.fori_loop(0, 20, body, jnp.float32(0))

    mj = jax.jit(many)
    t0 = time.time()
    print("warmup:", float(mj(params, x)), f"({time.time()-t0:.1f}s)",
          flush=True)
    t0 = time.time()
    float(mj(params, x))
    print(f"steady: {(time.time()-t0)/20*1000:.2f} ms/fwd", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "trace_dpt_resize")
    with jax.profiler.trace(out):
        float(mj(params, x))
    hits = glob.glob(out + "/**/*.trace.json.gz", recursive=True)
    print("trace:", hits, flush=True)


if __name__ == "__main__":
    main()
