"""jax.profiler trace of the flagship bs8 vitl-518 inference forward.

Purpose: attribute the DPT decoder's resize cost in-model (VERDICT r3
weak #3 — ~11 ms of the 103 ms forward vs a ~3 ms bandwidth roofline)
with real device-op timings instead of standalone microbenches, which
are proven misleading for these ops (CLAUDE.md dead-end list). Output:
perf/trace_infer/; analyze with perf/trace_topops.py.
Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/infer_trace.py
"""
import glob
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.models import (  # noqa: E501
    build_depth_model,
)

model = build_depth_model("vitl", max_depth=20.0, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
batch = jnp.asarray(rng.normal(size=(8, 518, 518, 3)).astype(np.float32))
params = jax.jit(lambda r: model.init(r, batch[:1])["params"])(
    jax.random.PRNGKey(0))

fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
t0 = time.time()
jnp.mean(fwd(params, batch)).block_until_ready()
print(f"compile+first: {time.time() - t0:.1f}s", flush=True)
t0 = time.time()
for _ in range(10):
    out = fwd(params, batch)
float(jnp.mean(out))
print(f"steady: {(time.time() - t0) / 10 * 1000:.1f} ms/batch", flush=True)

outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "trace_infer")
with jax.profiler.trace(outdir):
    for _ in range(5):
        out = fwd(params, batch)
    float(jnp.mean(out))
print("trace files:", glob.glob(outdir + "/**/*.json.gz", recursive=True),
      flush=True)
