"""End-to-end learning sanity: the depth task actually fits a signal, and
the pose task fits relative poses."""

import jax
import jax.numpy as jnp
import numpy as np

import e3d_tpu  # noqa: F401
from e3d_tpu.core.dtypes import POLICY_F32
from e3d_tpu.parallel import MeshSpec, build_mesh
from e3d_tpu.train import DepthTask, PoseTask


def test_depth_task_fits_synthetic_signal(rng):
    """depth = smooth function of the image -> loss must drop sharply."""
    mesh = build_mesh(MeshSpec(data=8, model=1))
    task = DepthTask(encoder="vitt", max_depth=20.0,
                     encoder_lr=3e-4, decoder_lr=3e-4,
                     pct_start=0.1, div_factor=10.0,
                     total_steps=40, grad_accum=1, device_mesh=mesh,
                     policy=POLICY_F32, grad_checkpoint=False)
    state = task.init_state(jax.random.PRNGKey(0), (56, 56))

    def make_batch(seed):
        r = np.random.default_rng(seed)
        img = r.normal(size=(1, 8, 56, 56, 3)).astype(np.float32)
        # smooth target correlated with the image mean
        base = img.mean(axis=-1, keepdims=True)
        depth = 5.0 + 2.0 * np.tanh(base)
        return {"image": jnp.asarray(img), "depth": jnp.asarray(depth)}

    losses = []
    for i in range(30):
        state, metrics = task.train_step(state, make_batch(i % 4))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < 0.65 * losses[0], losses[::6]


def test_pose_task_fits_constant_pose(rng):
    mesh = build_mesh(MeshSpec(data=8, model=1))
    task = PoseTask(lr=3e-4, pct_start=0.1, div_factor=10.0,
                    total_steps=60, device_mesh=mesh)
    state = task.init_state(jax.random.PRNGKey(0), (56, 56))
    target = np.tile(np.array([0.6, 0.8, 0.0, 0.0, 0.0, 0.0, 1.0],
                              np.float32), (8, 1))
    r = np.random.default_rng(0)
    losses = []
    for i in range(40):
        batch = {
            "input": jnp.asarray(r.normal(size=(8, 56, 56, 8))
                                 .astype(np.float32) * 0.1),
            "target": jnp.asarray(target),
        }
        state, metrics = task.train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < 0.6 * losses[0], losses[::8]
