"""Tensor-parallel equivalence + checkpoint save/restore round trips."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import e3d_tpu  # noqa: F401
from e3d_tpu.core.checkpoint import CheckpointManager, EarlyStopping
from e3d_tpu.core.dtypes import POLICY_F32
from e3d_tpu.parallel import MeshSpec, build_mesh, param_shardings
from e3d_tpu.train import DepthTask


def make_batch(rng, accum=1, mb=8, hw=56):
    return {
        "image": jnp.asarray(rng.normal(size=(accum, mb, hw, hw, 3))
                             .astype(np.float32)),
        "depth": jnp.asarray(rng.uniform(0.5, 19.0,
                                         size=(accum, mb, hw, hw, 1))
                             .astype(np.float32)),
    }


def _run_steps(mesh, tp, batch, n=2, sp=False):
    task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                     grad_accum=1, device_mesh=mesh, policy=POLICY_F32,
                     grad_checkpoint=False, tensor_parallel=tp,
                     seq_parallel=sp)
    hw = batch["image"].shape[2]
    state = task.init_state(jax.random.PRNGKey(0), (hw, hw))
    metrics = None
    for _ in range(n):
        state, metrics = task.train_step(state, batch)
    return state, metrics


def test_tensor_parallel_matches_data_parallel(rng):
    """Same batch, same seed: (data=4, model=2) TP == (data=8) DP."""
    batch = make_batch(rng)
    mesh_dp = build_mesh(MeshSpec(data=8, model=1))
    mesh_tp = build_mesh(MeshSpec(data=4, model=2))
    state_dp, m_dp = _run_steps(mesh_dp, False, batch)
    state_tp, m_tp = _run_steps(mesh_tp, True, batch)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_tp["loss"]),
                               rtol=1e-4)
    # parameters stay numerically equal too
    leaves_dp = jax.tree.leaves(state_dp.params)
    leaves_tp = jax.tree.leaves(state_tp.params)
    for a, b in zip(leaves_dp, leaves_tp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_sequence_parallel_matches_data_parallel(rng):
    """SP is a pure layout constraint: TP+SP training == plain DP.

    42 px -> 1 + 3x3 = 10 tokens, so the token dim REALLY shards over
    model=2 (a non-divisible count, like the batch-1 init trace, trims
    to the divisible subset — covered by the same run). Exercises the
    GSPMD reduce-scatter/all-gather rewrite of the Megatron-SP residual
    stream end to end (fwd+bwd+optimizer)."""
    batch = make_batch(rng, hw=42)
    mesh_dp = build_mesh(MeshSpec(data=8, model=1))
    mesh_sp = build_mesh(MeshSpec(data=4, model=2))
    state_dp, m_dp = _run_steps(mesh_dp, False, batch)
    state_sp, m_sp = _run_steps(mesh_sp, True, batch, sp=True)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_sp["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(state_dp.params),
                    jax.tree.leaves(state_sp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_seq_parallel_composes_with_fused_padded_stream(rng):
    """SP + the fused-attention pad-once residual stream — the combination
    a real multi-chip TPU executes (CPU tests and the dryrun otherwise take
    the XLA branch). 42 px -> 10 tokens padded once to 16, sharded (data,
    model) between blocks; GSPMD must partition around the Pallas call
    (interpret mode here) and the result must still equal plain DP."""
    from e3d_tpu.ops import attention as attn_ops

    batch = make_batch(rng, hw=42)
    mesh_dp = build_mesh(MeshSpec(data=8, model=1))
    mesh_sp = build_mesh(MeshSpec(data=4, model=2))
    state_dp, m_dp = _run_steps(mesh_dp, False, batch)
    attn_ops.set_force_fused(True)
    try:
        state_sp, m_sp = _run_steps(mesh_sp, True, batch, sp=True)
    finally:
        attn_ops.set_force_fused(False)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_sp["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(state_dp.params),
                    jax.tree.leaves(state_sp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_seq_parallel_constraint_is_built_in():
    """The token sharding is a build-time model field (jit-cache-keyed,
    like the int8 knobs) and resolves only when the model axis is >1."""
    mesh_sp = build_mesh(MeshSpec(data=4, model=2))
    task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=4,
                     device_mesh=mesh_sp, policy=POLICY_F32,
                     grad_checkpoint=False, seq_parallel=True)
    sh = task.model.token_sharding
    assert sh is not None and "model" in str(sh.spec), sh
    mesh_dp = build_mesh(MeshSpec(data=8, model=1))
    task_noop = DepthTask(encoder="vitt", max_depth=20.0, total_steps=4,
                          device_mesh=mesh_dp, policy=POLICY_F32,
                          grad_checkpoint=False, seq_parallel=True)
    assert task_noop.model.token_sharding is None


def test_tp_shards_vit_params():
    mesh = build_mesh(MeshSpec(data=4, model=2))
    task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=4,
                     device_mesh=mesh, policy=POLICY_F32,
                     grad_checkpoint=False, tensor_parallel=True)
    state = task.init_state(jax.random.PRNGKey(0), (56, 56))
    qkv = state.params["pretrained"]["blocks_0"]["attn"]["qkv"]["kernel"]
    spec = qkv.sharding.spec
    assert "model" in str(spec), spec


def test_checkpoint_roundtrip(tmp_path, rng):
    mesh = build_mesh(MeshSpec(data=8, model=1))
    task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                     grad_accum=1, device_mesh=mesh, policy=POLICY_F32,
                     grad_checkpoint=False)
    state = task.init_state(jax.random.PRNGKey(0), (56, 56))
    batch = make_batch(rng)
    state, _ = task.train_step(state, batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(int(state.step), state, {"val_loss": 1.0})
    state2, _ = task.train_step(state, batch)
    mgr.save(int(state2.step), state2, {"val_loss": 0.5})

    assert mgr.latest_step() == 2
    assert mgr.best_step() == 2  # lower val_loss

    template = task.init_state(jax.random.PRNGKey(1), (56, 56))
    restored = mgr.restore_best(template)
    assert int(restored.step) == 2
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_resume_gets_true_latest_not_best(tmp_path, rng):
    """max_to_keep=1 + best_fn GC deletes every non-best save from the
    best-k store, so its 'latest' is really the best step — resuming a
    plateaued run from it silently rewinds and retrains the same segment
    after every preemption. The latest/ slot keeps the newest save;
    early-stop patience rides its metrics (round-3 review regression)."""
    mesh = build_mesh(MeshSpec(data=8, model=1))
    task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                     grad_accum=1, device_mesh=mesh, policy=POLICY_F32,
                     grad_checkpoint=False)
    state1 = task.init_state(jax.random.PRNGKey(0), (56, 56))
    batch = make_batch(rng)
    state1, _ = task.train_step(state1, batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=1)
    mgr.save(1, state1, {"val_loss": 0.5, "es_best": 0.5,
                         "es_bad_count": 0})
    state2, _ = task.train_step(state1, batch)  # donates state1 (saved)
    mgr.save(2, state2, {"val_loss": 0.9, "es_best": 0.5,  # worse: GC'd
                         "es_bad_count": 1})               # from best-k
    assert mgr.best_step() == 1
    assert mgr.latest_step() == 2

    template = task.init_state(jax.random.PRNGKey(1), (56, 56))
    restored = mgr.restore_latest(template)
    assert int(restored.step) == 2
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    best = mgr.restore_best(template)
    assert int(best.step) == 1

    m = mgr.latest_metrics()
    assert m["es_bad_count"] == 1 and m["es_best"] == 0.5
    mgr.close()

    # Reopen (fresh process semantics): same answers.
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=1)
    assert mgr2.latest_step() == 2 and mgr2.best_step() == 1
    mgr2.close()


def test_inference_load_serves_best_and_latest_write_is_skipped(tmp_path):
    """Two round-3 review regressions in one sequence:

    - ``restore_best_untyped`` (what infer/serve/pointcloud_model load via
      ``load_or_init_depth_params``) returns the BEST-val save, not the
      possibly-plateaued newest one — matching ``test_depth`` and the
      reference's best-checkpoint flow.
    - an improving save retained by the best-k store skips the duplicate
      ``latest/`` serialization (each save was written twice before), and
      ``latest_step``/``restore_latest`` still track the true newest save
      through improve -> worsen -> improve, including across a reopen."""
    def st(step):
        return {"params": {"w": np.arange(4.0) + step},
                "step": np.asarray(step, np.int32)}

    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=1)
    mgr.save(1, st(1), {"val_loss": 1.0})
    latest_dir = tmp_path / "ckpt" / "latest"
    assert not any(p.name.isdigit() for p in latest_dir.iterdir()
                   if p.is_dir()), "best-retained save also wrote latest/"
    mgr.save(2, st(2), {"val_loss": 2.0})     # worse -> latest/ slot
    mgr.save(3, st(3), {"val_loss": 0.5})     # better -> best store only
    mgr.save(4, st(4), {"val_loss": 5.0})     # plateau -> latest/ slot
    assert mgr.best_step() == 3 and mgr.latest_step() == 4
    assert int(mgr.restore_best_untyped()["step"]) == 3
    assert int(mgr.restore_latest(st(0))["step"]) == 4
    assert mgr.latest_metrics()["val_loss"] == 5.0
    mgr.close()

    mgr2 = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=1)
    assert mgr2.best_step() == 3 and mgr2.latest_step() == 4
    assert int(mgr2.restore_best_untyped()["step"]) == 3
    mgr2.close()


def test_untyped_restore_across_device_topologies(tmp_path):
    """Train on an N-chip mesh, serve on one chip: the untyped restores
    must ignore the SAVED shardings (a bare orbax ``restore(step)``
    replays them and refuses when the device topology changed — the
    exact production flow of ``load_or_init_depth_params``)."""
    import subprocess
    import sys

    mesh = build_mesh(MeshSpec(data=4, model=2))
    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    w = jax.device_put(np.arange(32.0, dtype=np.float32).reshape(8, 4), sh)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=1)
    mgr.save(1, {"params": {"w": w}}, {"val_loss": 1.0})
    mgr.close()

    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import sys, numpy as np\n"
        "import e3d_tpu\n"
        "from e3d_tpu.core.checkpoint import CheckpointManager\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "out = CheckpointManager(sys.argv[1]).restore_best_untyped()\n"
        "w = np.asarray(out['params']['w'])\n"
        "np.testing.assert_array_equal(\n"
        "    w, np.arange(32.0, dtype=np.float32).reshape(8, 4))\n"
        "print('OK')\n"
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # single CPU device
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", code, str(tmp_path / "ckpt")],
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))),
                       env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0 and "OK" in r.stdout, r.stdout + r.stderr


def test_readonly_checkpoint_dir_restores(tmp_path):
    """Inference consumers (infer/serve/pointcloud_model via
    load_or_init_depth_params) open OTHER runs' checkpoint dirs, possibly
    on a read-only mount and possibly written before the latest/ store
    existed — the manager must not mkdir/write anything on the read path
    (round-3 review: the eager latest/ construction did)."""
    d = tmp_path / "ckpt"
    mgr = CheckpointManager(str(d), max_to_keep=1, track_latest=False)
    mgr.save(1, {"params": {"w": np.arange(4.0)}}, {"val_loss": 1.0})
    mgr.close()
    assert not (d / "latest").exists()

    locked = []
    for root, dirs, _ in os.walk(d):
        for name in [os.path.join(root, x) for x in dirs] + [root]:
            os.chmod(name, 0o555)
            locked.append(name)
    try:
        out = CheckpointManager(str(d)).restore_best_untyped()
        np.testing.assert_array_equal(np.asarray(out["params"]["w"]),
                                      np.arange(4.0))
        assert not (d / "latest").exists()
    finally:
        for name in locked:
            os.chmod(name, 0o755)


def test_prefetch_loader_reshuffles_across_epochs():
    """Re-iterating ONE PrefetchLoader gives a different order each epoch
    (fit loops build the loader once; recreating it per epoch would
    train every epoch on the identical permutation)."""
    from e3d_tpu.data.loader import PrefetchLoader

    class _Idx:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return {"i": np.int64(i)}

    loader = PrefetchLoader(_Idx(), 8, shuffle=True, seed=11,
                            num_threads=2)
    e1 = [int(x) for b in loader for x in b["i"]]
    e2 = [int(x) for b in loader for x in b["i"]]
    assert sorted(e1) == sorted(e2) == list(range(32))
    assert e1 != e2  # per-epoch reshuffle


def _run_steps_fsdp(mesh, batch, n=2, accum=1):
    # fsdp_min_size=1024: vitt's largest matmul is 64x192 (12k elements),
    # under the production 32k threshold — lower it so the toy model
    # actually exercises the sharded layouts.
    task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                     grad_accum=accum, device_mesh=mesh, policy=POLICY_F32,
                     grad_checkpoint=False, fsdp=True, fsdp_min_size=1024)
    state = task.init_state(jax.random.PRNGKey(0), (56, 56))
    metrics = None
    for _ in range(n):
        state, metrics = task.train_step(state, batch)
    return state, metrics


def test_fsdp_matches_data_parallel(rng):
    """ZeRO sharding is a pure layout change: same losses/params as DP."""
    batch = make_batch(rng)
    mesh = build_mesh(MeshSpec(data=8, model=1))
    state_dp, m_dp = _run_steps(mesh, False, batch)
    state_fs, m_fs = _run_steps_fsdp(mesh, batch)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_fs["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(state_dp.params),
                    jax.tree.leaves(state_fs.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_fsdp_matches_dp_with_grad_accum(rng):
    """The per-microbatch reduce-scatter constraint (depth_task.micro)
    keeps grad-accum numerics identical to the replicated scan."""
    batch = make_batch(rng, accum=2, mb=8)
    mesh = build_mesh(MeshSpec(data=8, model=1))
    state_dp, m_dp = _run_steps(mesh, False, batch, n=1)
    state_fs, m_fs = _run_steps_fsdp(mesh, batch, n=1, accum=2)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_fs["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(state_dp.params),
                    jax.tree.leaves(state_fs.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_fsdp_shards_params_and_moments(rng):
    """Large params AND their Adam moments land sharded over 'data';
    small leaves (under the min-size threshold) stay replicated."""
    min_size = 1024
    mesh = build_mesh(MeshSpec(data=8, model=1))
    task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=4,
                     grad_accum=1, device_mesh=mesh, policy=POLICY_F32,
                     grad_checkpoint=False, fsdp=True,
                     fsdp_min_size=min_size)
    state = task.init_state(jax.random.PRNGKey(0), (56, 56))
    batch = make_batch(rng)
    state, _ = task.train_step(state, batch)  # out shardings hold too

    qkv = state.params["pretrained"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert "data" in str(qkv.sharding.spec), qkv.sharding.spec
    n_sharded_params = sum(
        1 for leaf in jax.tree.leaves(state.params)
        if "data" in str(leaf.sharding.spec))
    assert n_sharded_params >= 12 * 4  # every block's big matmuls

    small = [leaf for leaf in jax.tree.leaves(state.params)
             if leaf.size < min_size]
    assert small and all(leaf.sharding.spec == jax.sharding.PartitionSpec()
                         for leaf in small)

    n_sharded_moments = sum(
        1 for leaf in jax.tree.leaves(state.opt_state)
        if hasattr(leaf, "sharding") and "data" in str(leaf.sharding.spec))
    assert n_sharded_moments >= 2 * n_sharded_params  # mu and nu


def test_fsdp_composes_with_tp(rng):
    """fsdp=True + tensor_parallel=True: params take BOTH axes and the
    Adam moments take exactly the params' composed layout (a base=P()
    fsdp_spec would pin moments/grads to a conflicting spec — regression
    for the round-3 self-review finding)."""
    import optax

    mesh = build_mesh(MeshSpec(data=4, model=2))
    task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=4,
                     grad_accum=2, device_mesh=mesh, policy=POLICY_F32,
                     grad_checkpoint=False, tensor_parallel=True,
                     fsdp=True, fsdp_min_size=1024)
    state = task.init_state(jax.random.PRNGKey(0), (56, 56))

    qkv = state.params["pretrained"]["blocks_0"]["attn"]["qkv"]["kernel"]
    spec = str(qkv.sharding.spec)
    assert "model" in spec and "data" in spec, spec  # both axes

    # Every param-shaped moment leaf must share its param's sharding.
    param_sh = jax.tree.map(lambda p: p.sharding, state.params)
    checked = []

    def _check(moment, sh):
        if hasattr(moment, "sharding"):
            assert moment.sharding == sh, (moment.sharding, sh)
            checked.append(1)
        return moment

    optax.tree_map_params(task._optimizer, _check, state.opt_state,
                          param_sh,
                          is_leaf=lambda x: isinstance(x, optax.MaskedNode))
    assert len(checked) >= 100  # mu+nu over the whole vitt tree

    # And a grad-accum step still runs (GSPMD accepts the composed
    # layouts, incl. the with_sharding_constraint on the scan carry).
    batch = make_batch(rng, accum=2)
    state2, metrics = task.train_step(state, batch)
    assert jnp.isfinite(metrics["loss"])


def test_fsdp_checkpoint_roundtrip(tmp_path, rng):
    """Orbax saves/restores the data-axis-sharded state losslessly."""
    mesh = build_mesh(MeshSpec(data=8, model=1))
    task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                     grad_accum=1, device_mesh=mesh, policy=POLICY_F32,
                     grad_checkpoint=False, fsdp=True, fsdp_min_size=1024)
    state = task.init_state(jax.random.PRNGKey(0), (56, 56))
    batch = make_batch(rng)
    state, _ = task.train_step(state, batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=1)
    mgr.save(int(state.step), state, {"val_loss": 1.0})
    template = task.init_state(jax.random.PRNGKey(1), (56, 56))
    restored = mgr.restore_best(template)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    qkv = restored.params["pretrained"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert "data" in str(qkv.sharding.spec)
    mgr.close()


def test_early_stopping():
    stopper = EarlyStopping(patience=2)
    values = [1.0, 0.9, 0.95, 0.95, 0.95]
    results = [stopper.update(v) for v in values]
    # Lightning semantics: stop once wait_count >= patience (2 bad evals).
    assert results == [False, False, False, True, True]


@pytest.mark.slow
def test_tp_matches_dp_at_vits(rng):
    """TP==DP at REAL vits widths (384 dim, 6 heads, fc 1536, real DPT
    channel table) so the TP sharding rules are validated against real
    layer names/widths, not just the vitt toy (VERDICT r1 next #10).
    126 px keeps the CPU compile tractable; the sharding rules only see
    layer names and widths, which are image-size independent."""
    batch = {
        "image": jnp.asarray(rng.normal(size=(1, 4, 126, 126, 3))
                             .astype(np.float32)),
        "depth": jnp.asarray(rng.uniform(0.5, 19.0, size=(1, 4, 126, 126, 1))
                             .astype(np.float32)),
    }

    def run(mesh, tp):
        task = DepthTask(encoder="vits", max_depth=20.0, total_steps=10,
                         grad_accum=1, device_mesh=mesh, policy=POLICY_F32,
                         grad_checkpoint=False, tensor_parallel=tp)
        state = task.init_state(jax.random.PRNGKey(0), (126, 126))
        state, metrics = task.train_step(state, batch)
        return state, metrics

    state_dp, m_dp = run(build_mesh(MeshSpec(data=8, model=1)), False)
    state_tp, m_tp = run(build_mesh(MeshSpec(data=4, model=2)), True)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_tp["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(state_dp.params),
                    jax.tree.leaves(state_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_tp_shards_vits_params():
    """Sharding-rule regexes hit the real vits layer names and the sharded
    axes divide evenly by the model axis."""
    mesh = build_mesh(MeshSpec(data=4, model=2))
    task = DepthTask(encoder="vits", max_depth=20.0, total_steps=4,
                     device_mesh=mesh, policy=POLICY_F32,
                     grad_checkpoint=False, tensor_parallel=True)
    state = task.init_state(jax.random.PRNGKey(0), (126, 126))
    blocks = state.params["pretrained"]
    sharded = 0
    for name in blocks:
        if not name.startswith("blocks_"):
            continue
        for path, want_axis in ((("attn", "qkv", "kernel"), 1),
                                (("attn", "proj", "kernel"), 0),
                                (("mlp", "fc1", "kernel"), 1),
                                (("mlp", "fc2", "kernel"), 0)):
            leaf = blocks[name]
            for k in path:
                leaf = leaf[k]
            spec = leaf.sharding.spec
            assert spec[want_axis] == "model", (name, path, spec)
            assert leaf.shape[want_axis] % 2 == 0
            sharded += 1
    assert sharded == 4 * 12  # every block's 4 big matmuls TP-sharded
