"""Measured cost of the distillation step on the v5e (VERDICT r4 #6).

Student vits (the deployment-point target) fine-tuning WITH a frozen
vitl teacher forward in the loss vs the plain vits step — the price of
the distillation recipe at the reference's 518 px, student layout
bs8 x accum3 (the bench train layout).

Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/distill_step.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE = 518
MB = int(os.environ.get("E3D_DISTILL_BS", "8"))
ACCUM = int(os.environ.get("E3D_DISTILL_ACCUM", "3"))


def log(msg):
    print(msg, flush=True)


def fill_params(model, hw):
    shapes = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, *hw, 3)))["params"],
        jax.random.PRNGKey(0))
    return jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)


def run(task, batch, label):
    state = task.init_state(jax.random.PRNGKey(0), (SIZE, SIZE),
                            fill_value=0.01)
    t0 = time.time()
    state, metrics = task.train_step(state, batch)
    float(metrics["loss"])
    log(f"{label}: compile+first {time.time()-t0:.1f}s")
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        for _ in range(3):
            state, metrics = task.train_step(state, batch)
        float(metrics["loss"])
        best = min(best, (time.time() - t0) / 3)
    log(f"{label}: {best*1000:.1f} ms/step "
        f"({ACCUM * MB / best:.2f} frames/s)")
    return best


def main() -> None:
    from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.train.depth_task import (  # noqa: E501
        DepthTask,
    )

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(ACCUM, MB, SIZE, SIZE, 3))
                             .astype(np.float32)),
        "depth": jnp.asarray(rng.uniform(0.5, 19.0,
                                         size=(ACCUM, MB, SIZE, SIZE, 1))
                             .astype(np.float32)),
    }

    plain = DepthTask(encoder="vits", max_depth=20.0, total_steps=100,
                      grad_accum=ACCUM, grad_checkpoint=False)
    t_plain = run(plain, batch, "vits plain")

    dist = DepthTask(encoder="vits", max_depth=20.0, total_steps=100,
                     grad_accum=ACCUM, grad_checkpoint=False,
                     distill_encoder="vitl", distill_weight=1.0)
    teacher = fill_params(dist.teacher_model, (SIZE, SIZE))
    dist.set_teacher(teacher)
    t_dist = run(dist, batch, "vits + vitl-teacher distill")
    log(f"distill overhead: {(t_dist - t_plain)*1000:.1f} ms/step "
        f"({t_dist/t_plain:.2f}x)")


if __name__ == "__main__":
    main()
