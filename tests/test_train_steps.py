"""Train-step smoke tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

import e3d_tpu  # noqa: F401
from e3d_tpu.train import DepthTask, PoseTask
from e3d_tpu.parallel import build_mesh, MeshSpec


def make_depth_batch(rng, accum=2, mb=8, hw=56):
    image = rng.normal(size=(accum, mb, hw, hw, 3)).astype(np.float32)
    depth = rng.uniform(0.5, 19.0, size=(accum, mb, hw, hw, 1)).astype(
        np.float32)
    return {"image": jnp.asarray(image), "depth": jnp.asarray(depth)}


def test_depth_train_step_runs_and_learns(rng):
    mesh = build_mesh(MeshSpec(data=8, model=1))
    task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                     grad_accum=2, device_mesh=mesh,
                     policy=e3d_tpu.core.POLICY_F32, grad_checkpoint=False)
    state = task.init_state(jax.random.PRNGKey(0), (56, 56))
    batch = make_depth_batch(rng)
    losses = []
    for _ in range(3):
        state, metrics = task.train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 3
    assert all(np.isfinite(losses))
    for key in ("d1", "abs_rel", "rmse", "l1"):
        assert np.isfinite(float(metrics[key]))


def test_depth_eval_step(rng):
    mesh = build_mesh(MeshSpec(data=8, model=1))
    task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                     device_mesh=mesh, policy=e3d_tpu.core.POLICY_F32,
                     grad_checkpoint=False)
    state = task.init_state(jax.random.PRNGKey(0), (56, 56))
    batch = {
        "image": jnp.asarray(rng.normal(size=(8, 56, 56, 3)).astype(np.float32)),
        "depth": jnp.asarray(rng.uniform(0.5, 19.0, size=(8, 56, 56, 1))
                             .astype(np.float32)),
    }
    metrics = task.eval_step(state.params, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_depth_per_sample_max_depth(rng):
    """Combined-dataset path: per-sample max-depth bound for the mask."""
    mesh = build_mesh(MeshSpec(data=8, model=1))
    task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                     grad_accum=1, device_mesh=mesh,
                     policy=e3d_tpu.core.POLICY_F32, grad_checkpoint=False)
    state = task.init_state(jax.random.PRNGKey(0), (56, 56))
    batch = make_depth_batch(rng, accum=1, mb=8)
    batch["max_depth"] = jnp.asarray(
        np.where(np.arange(8) % 2 == 0, 20.0, 10.0)[None].astype(np.float32))
    state, metrics = task.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_pose_train_and_eval_step(rng):
    mesh = build_mesh(MeshSpec(data=8, model=1))
    task = PoseTask(total_steps=10, device_mesh=mesh)
    state = task.init_state(jax.random.PRNGKey(0), (64, 64))
    x = rng.normal(size=(8, 64, 64, 8)).astype(np.float32)
    t = rng.normal(size=(8, 7)).astype(np.float32)
    t[:, 3:] /= np.linalg.norm(t[:, 3:], axis=1, keepdims=True)
    batch = {"input": jnp.asarray(x), "target": jnp.asarray(t)}
    state, metrics = task.train_step(state, batch)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    for k in ("ate", "rte", "rote"):
        assert np.isfinite(float(metrics[k]))
    eval_metrics, pred = task.eval_step(state, batch)
    assert pred.shape == (8, 7)
    assert np.isfinite(float(eval_metrics["loss"]))
    traj = task.trajectory_metrics(jnp.asarray(t), jnp.asarray(t))
    assert float(traj["ate"]) < 1e-4
