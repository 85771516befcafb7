"""Pose train-step: '32-true' (reference parity) vs 'bf16-mixed' on TPU.

Same methodology as bench.measure_pose_train (5-step wall-clock windows,
scalar loss readback, best of 2) so numbers are comparable with
BENCH_POSE.json. Run: PYTHONPATH=/root/.axon_site:. python perf/pose_precision.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

bench.wait_for_backend()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.core.dtypes import (  # noqa: E402,E501
    POLICY_BF16, POLICY_F32,
)
from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.train.pose_task import (  # noqa: E402,E501
    PoseTask,
)


def measure(policy, label: str, bs: int = 64, size: int = 518) -> float:
    task = PoseTask(total_steps=100, policy=policy)
    state = task.init_state(jax.random.PRNGKey(0), (size, size))
    rng = np.random.default_rng(0)
    batch = {
        "input": jnp.asarray(rng.normal(size=(bs, size, size, 8))
                             .astype(np.float32)),
        "target": jnp.asarray(rng.normal(size=(bs, 7)).astype(np.float32)),
    }
    t0 = time.time()
    state, metrics = task.train_step(state, batch)
    loss0 = float(metrics["loss"])
    print(f"[{label}] compile+first-step: {time.time() - t0:.1f}s "
          f"loss={loss0:.4f}", flush=True)
    steps, best = 5, float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(steps):
            state, metrics = task.train_step(state, batch)
        float(metrics["loss"])
        best = min(best, (time.time() - t0) / steps)
    print(f"[{label}] {best * 1000:.1f} ms/step (bs {bs}), "
          f"{bs / best:.1f} pairs/s", flush=True)
    return best


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    f32 = measure(POLICY_F32, "32-true")
    b16 = measure(POLICY_BF16, "bf16-mixed")
    print(f"speedup bf16/f32: {f32 / b16:.3f}x", flush=True)
