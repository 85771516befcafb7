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


def test_pose_val_rte_skips_single_sample_batches():
    """A 1-sample val batch has no consecutive-frame delta, so its RTE is
    NaN by construction; it must not poison the epoch mean. Genuine NaNs
    on batches with >= 2 samples still propagate."""
    from e3d_tpu.train.loop import _accumulate_pose_val

    sums, counts = {}, {}
    _accumulate_pose_val(sums, counts, {"loss": 1.0, "rte": 0.5}, 4)
    _accumulate_pose_val(sums, counts, {"loss": 2.0, "rte": float("nan")}, 1)
    assert sums["rte"] / counts["rte"] == 0.5
    assert sums["loss"] / counts["loss"] == 1.5
    _accumulate_pose_val(sums, counts, {"loss": 1.0, "rte": float("nan")}, 2)
    assert not np.isfinite(sums["rte"] / counts["rte"])


def test_pose_bf16_mixed_precision(rng):
    """trainer.precision=bf16-mixed: bf16 compute, f32 master state.

    Default pose parity stays '32-true'; the opt-in policy must keep
    params/BN stats f32 (master weights), return f32 predictions, and
    track the f32 step loss closely on one step from the same init."""
    mesh = build_mesh(MeshSpec(data=8, model=1))
    x = rng.normal(size=(8, 64, 64, 8)).astype(np.float32)
    t = rng.normal(size=(8, 7)).astype(np.float32)
    t[:, 3:] /= np.linalg.norm(t[:, 3:], axis=1, keepdims=True)
    batch = {"input": jnp.asarray(x), "target": jnp.asarray(t)}

    task16 = PoseTask(total_steps=10, device_mesh=mesh,
                      policy=e3d_tpu.core.POLICY_BF16)
    state16 = task16.init_state(jax.random.PRNGKey(0), (64, 64))
    state16, m16 = task16.train_step(state16, batch)
    assert all(leaf.dtype == jnp.float32
               for leaf in jax.tree.leaves(state16.params))
    assert all(leaf.dtype == jnp.float32
               for leaf in jax.tree.leaves(state16.batch_stats))
    _, pred16 = task16.eval_step(state16, batch)
    assert pred16.dtype == jnp.float32

    task32 = PoseTask(total_steps=10, device_mesh=mesh)
    state32 = task32.init_state(jax.random.PRNGKey(0), (64, 64))
    _, m32 = task32.train_step(state32, batch)
    np.testing.assert_allclose(float(m16["loss"]), float(m32["loss"]),
                               rtol=0.05)


def test_weighted_accum_matches_unweighted(rng):
    """A zero-weighted padded chunk must not affect the update: accum=2
    with weights [1, 0] == accum=1 on the first microbatch alone
    (regression for the trailing-partial-group drop, VERDICT r1 weak #2)."""
    mesh = build_mesh(MeshSpec(data=8, model=1))

    def make_task(accum):
        return DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                         grad_accum=accum, device_mesh=mesh,
                         policy=e3d_tpu.core.POLICY_F32,
                         grad_checkpoint=False)

    batch2 = make_depth_batch(rng, accum=2, mb=8)
    batch2["weight"] = jnp.asarray([1.0, 0.0], jnp.float32)
    batch1 = {"image": batch2["image"][:1], "depth": batch2["depth"][:1]}

    task_a = make_task(2)
    state_a = task_a.init_state(jax.random.PRNGKey(0), (56, 56))
    state_a, metrics_a = task_a.train_step(state_a, batch2)

    task_b = make_task(1)
    state_b = task_b.init_state(jax.random.PRNGKey(0), (56, 56))
    state_b, metrics_b = task_b.train_step(state_b, batch1)

    np.testing.assert_allclose(float(metrics_a["loss"]),
                               float(metrics_b["loss"]), rtol=1e-5)
    leaves_a = jax.tree.leaves(state_a.params)
    leaves_b = jax.tree.leaves(state_b.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_fit_depth_steps_on_trailing_partial_group(tmp_path, rng):
    """5 batches with accum=2 -> 3 optimizer steps/epoch (Lightning steps
    on the epoch remainder; reference trainer/default.yaml:7)."""
    from e3d_tpu.train.loop import fit_depth
    from e3d_tpu.train import DepthTask

    class FakeLoader:
        def __init__(self, batches):
            self.batches = batches

        def __len__(self):
            return len(self.batches)

        def __iter__(self):
            return iter(self.batches)

    def mk_batch(i):
        r = np.random.default_rng(i)
        return {
            "image": r.normal(size=(2, 28, 28, 3)).astype(np.float32),
            "depth": r.uniform(0.5, 19.0, size=(2, 28, 28)).astype(
                np.float32),
        }

    class FakeDM:
        size = 28

        def setup(self, stage):
            pass

        def train_loader(self):
            return FakeLoader([mk_batch(i) for i in range(5)])

        def val_loader(self):
            return FakeLoader([mk_batch(99)])

    mesh = build_mesh(MeshSpec(data=8, model=1))
    task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                     grad_accum=2, device_mesh=mesh,
                     policy=e3d_tpu.core.POLICY_F32, grad_checkpoint=False)
    state = fit_depth(task, FakeDM(), max_epochs=1,
                      log_dir=str(tmp_path / "logs"),
                      ckpt_dir=str(tmp_path / "ckpt"))
    assert int(state.step) == 3


def test_preemption_guard_latches_and_restores():
    """PreemptionGuard: SIGTERM latches the flag (no exception), handlers
    are restored on exit, second SIGINT raises KeyboardInterrupt."""
    import os
    import signal
    import time as _time

    import pytest

    from e3d_tpu.core.preempt import PreemptionGuard

    prev_term = signal.getsignal(signal.SIGTERM)
    prev_int = signal.getsignal(signal.SIGINT)
    with PreemptionGuard() as g:
        assert not g.requested
        os.kill(os.getpid(), signal.SIGTERM)
        _time.sleep(0.01)  # let the handler run at a bytecode boundary
        assert g.requested
        os.kill(os.getpid(), signal.SIGINT)
        _time.sleep(0.01)  # first Ctrl-C: graceful (flag only)
        with pytest.raises(KeyboardInterrupt):
            os.kill(os.getpid(), signal.SIGINT)
            _time.sleep(0.01)  # second Ctrl-C: exit now
    assert signal.getsignal(signal.SIGTERM) is prev_term
    assert signal.getsignal(signal.SIGINT) is prev_int


def test_preemption_saves_and_resumes(tmp_path, rng):
    """SIGTERM mid-epoch -> fit_depth saves a latest/ checkpoint at the
    next step boundary and returns cleanly; resume continues from the
    preempted step. The signal fires deterministically from the loader."""
    import os
    import signal

    from e3d_tpu.core.checkpoint import CheckpointManager
    from e3d_tpu.train import DepthTask
    from e3d_tpu.train.loop import fit_depth

    def mk_batch(i):
        r = np.random.default_rng(i)
        return {
            "image": r.normal(size=(2, 28, 28, 3)).astype(np.float32),
            "depth": r.uniform(0.5, 19.0, size=(2, 28, 28)).astype(
                np.float32),
        }

    class Loader:
        def __init__(self, fire_at=None):
            self.batches = [mk_batch(i) for i in range(6)]
            self.fire_at = fire_at

        def __len__(self):
            return len(self.batches)

        def __iter__(self):
            for i, b in enumerate(self.batches):
                if i == self.fire_at:
                    os.kill(os.getpid(), signal.SIGTERM)
                yield b

    class DM:
        size = 28

        def __init__(self, fire_at=None):
            self.fire_at = fire_at

        def setup(self, stage):
            pass

        def train_loader(self):
            return Loader(self.fire_at)

        def val_loader(self):
            return Loader()

    def mk_task():
        mesh = build_mesh(MeshSpec(data=8, model=1))
        return DepthTask(encoder="vitt", max_depth=20.0, total_steps=20,
                         grad_accum=1, device_mesh=mesh,
                         policy=e3d_tpu.core.POLICY_F32,
                         grad_checkpoint=False)

    ckpt_dir = str(tmp_path / "ckpt")
    # fire while yielding batch 1 -> step 2 trains, then the guard check
    # saves (step 2 is not a val boundary: val_every = 3)
    state = fit_depth(mk_task(), DM(fire_at=1), max_epochs=3,
                      log_dir=str(tmp_path / "logs"), ckpt_dir=ckpt_dir)
    assert int(state.step) == 2
    mgr = CheckpointManager(ckpt_dir)
    assert mgr.latest_step() == 2
    metrics = mgr.latest_metrics()
    assert metrics["preempted"] == 1.0
    mgr.close()

    # restart: resumes from step 2 and finishes the epoch (6 more steps)
    state = fit_depth(mk_task(), DM(), max_epochs=1,
                      log_dir=str(tmp_path / "logs2"), ckpt_dir=ckpt_dir,
                      resume=True)
    assert int(state.step) == 8


def test_depth_train_step_unrolled_accum_matches(rng, monkeypatch):
    """E3D_ACCUM_UNROLL (XLA-visible accumulation steps, a TPU perf knob —
    see perf/train_attrib.py) must not change training numerics."""
    def run(unroll):
        monkeypatch.setenv("E3D_ACCUM_UNROLL", str(unroll))
        mesh = build_mesh(MeshSpec(data=8, model=1))
        task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                         grad_accum=2, device_mesh=mesh,
                         policy=e3d_tpu.core.POLICY_F32,
                         grad_checkpoint=False)
        state = task.init_state(jax.random.PRNGKey(0), (56, 56))
        batch = make_depth_batch(np.random.default_rng(7))
        state, metrics = task.train_step(state, batch)
        return float(metrics["loss"]), state

    loss_scan, state_scan = run(1)
    loss_unr, state_unr = run(2)
    assert np.isclose(loss_scan, loss_unr, rtol=1e-6)
    a = jax.tree_util.tree_leaves(state_scan.params)
    b = jax.tree_util.tree_leaves(state_unr.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-5, atol=2e-6)


def test_depth_train_step_barrier_accum_matches(rng, monkeypatch):
    """E3D_ACCUM_MODE=barrier (unrolled accumulation with an optimization
    barrier between microbatches) must match the scan layout exactly."""
    def run(mode):
        monkeypatch.setenv("E3D_ACCUM_MODE", mode)
        mesh = build_mesh(MeshSpec(data=8, model=1))
        task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                         grad_accum=2, device_mesh=mesh,
                         policy=e3d_tpu.core.POLICY_F32,
                         grad_checkpoint=False)
        state = task.init_state(jax.random.PRNGKey(0), (56, 56))
        batch = make_depth_batch(np.random.default_rng(7))
        state, metrics = task.train_step(state, batch)
        return float(metrics["loss"]), state

    loss_scan, state_scan = run("scan")
    loss_bar, state_bar = run("barrier")
    assert np.isclose(loss_scan, loss_bar, rtol=1e-6)
    for x, y in zip(jax.tree_util.tree_leaves(state_scan.params),
                    jax.tree_util.tree_leaves(state_bar.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-5, atol=2e-6)


def test_depth_train_step_flat_accum_matches(rng, monkeypatch):
    """E3D_ACCUM_FLAT=1 (grad accumulation over ONE raveled vector instead
    of the per-leaf tree carry — a measured-slower sweep knob kept for
    layout experiments, perf/trace_train) must match the tree carry
    exactly: same sum, different memory layout."""
    def run(flat):
        monkeypatch.setenv("E3D_ACCUM_FLAT", flat)
        mesh = build_mesh(MeshSpec(data=8, model=1))
        task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                         grad_accum=2, device_mesh=mesh,
                         policy=e3d_tpu.core.POLICY_F32,
                         grad_checkpoint=False)
        state = task.init_state(jax.random.PRNGKey(0), (56, 56))
        batch = make_depth_batch(np.random.default_rng(7))
        state, metrics = task.train_step(state, batch)
        return float(metrics["loss"]), state

    loss_tree, state_tree = run("0")
    loss_flat, state_flat = run("1")
    assert np.isclose(loss_tree, loss_flat, rtol=1e-6)
    for x, y in zip(jax.tree_util.tree_leaves(state_tree.params),
                    jax.tree_util.tree_leaves(state_flat.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-5, atol=2e-6)
