"""jax.profiler trace of the pose train step (f32 parity config, bs64x518).

The f32 step measures 116 ms against a ~38 ms FLOP-roofline estimate
(ResNet-18 ~9.7 GFLOP/img fwd x 3 x 64 at the v5e's ~49 TF/s f32 rate), so
something non-matmul dominates. Output: perf/trace_pose/; analyze with
perf/trace_topops.py. Set POSE_PRECISION=bf16 to trace the mixed path.
Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/pose_trace.py
"""
import glob
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.core.dtypes import (  # noqa: E501
    POLICY_BF16, POLICY_F32,
)
from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.train.pose_task import (  # noqa: E501
    PoseTask,
)

prec = os.environ.get("POSE_PRECISION", "f32")
policy = POLICY_BF16 if prec == "bf16" else POLICY_F32
task = PoseTask(total_steps=100, policy=policy)
state = task.init_state(jax.random.PRNGKey(0), (518, 518))
rng = np.random.default_rng(0)
batch = {
    "input": jnp.asarray(rng.normal(size=(64, 518, 518, 8))
                         .astype(np.float32)),
    "target": jnp.asarray(rng.normal(size=(64, 7)).astype(np.float32)),
}

t0 = time.time()
state, metrics = task.train_step(state, batch)
print(f"compile+first: {time.time() - t0:.1f}s loss={float(metrics['loss']):.4f}",
      flush=True)
t0 = time.time()
for _ in range(5):
    state, metrics = task.train_step(state, batch)
float(metrics["loss"])
print(f"steady: {(time.time() - t0) / 5 * 1000:.1f} ms/step", flush=True)

out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   f"trace_pose_{prec}")
with jax.profiler.trace(out):
    for _ in range(3):
        state, metrics = task.train_step(state, batch)
    float(metrics["loss"])
print("trace files:", glob.glob(out + "/**/*.json.gz", recursive=True),
      flush=True)
