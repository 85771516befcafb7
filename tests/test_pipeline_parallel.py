"""GPipe pipeline-parallel mode: numerics vs plain DP, fallbacks, guards.

The pipeline (parallel/pipeline.py) is an explicit shard_map+ppermute
schedule rather than a GSPMD sharding, so these tests pin (a) exact
forward/grad equivalence to the plain block loop, (b) train-step
equivalence to data parallelism, (c) the trace-time fallback for batches
the schedule can't split, and (d) the mode-exclusivity guards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import e3d_tpu  # noqa: F401
from e3d_tpu.core.dtypes import POLICY_F32
from e3d_tpu.models.depth_anything import build_depth_model
from e3d_tpu.parallel import MeshSpec, build_mesh
from e3d_tpu.parallel.pipeline import (build_pp_depth_forward,
                                       stack_block_params,
                                       unstack_block_params)
from e3d_tpu.train import DepthTask


def make_batch(rng, accum=1, mb=8, hw=56):
    return {
        "image": jnp.asarray(rng.normal(size=(accum, mb, hw, hw, 3))
                             .astype(np.float32)),
        "depth": jnp.asarray(rng.uniform(0.5, 19.0,
                                         size=(accum, mb, hw, hw, 1))
                             .astype(np.float32)),
    }


def test_stack_unstack_roundtrip():
    p = {f"blocks_{i}": {"w": jnp.full((2, 3), float(i))} for i in range(4)}
    stacked = stack_block_params(p, 4)
    assert jax.tree.leaves(stacked)[0].shape == (4, 2, 3)
    back = unstack_block_params(stacked, 4)
    for i in range(4):
        np.testing.assert_array_equal(np.asarray(back[f"blocks_{i}"]["w"]),
                                      np.asarray(p[f"blocks_{i}"]["w"]))


def test_pp_forward_and_grads_match_plain(rng):
    """The pipelined forward is numerically the plain forward (taps flow
    through the right stages) and so are its parameter gradients —
    including through the remat (grad_checkpoint) block wrapper."""
    mesh = build_mesh(MeshSpec(data=4, model=2))
    model = build_depth_model("vitt", 20.0, dtype=jnp.float32,
                              grad_checkpoint=True)
    img = jnp.asarray(rng.normal(size=(8, 56, 56, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), img[:1])["params"]

    ref = model.apply({"params": params}, img)
    fwd = build_pp_depth_forward(model, mesh, stages=2, n_micro=2)
    out = jax.jit(fwd)(params, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss_ref(p):
        return jnp.mean(model.apply({"params": p}, img) ** 2)

    def loss_pp(p):
        return jnp.mean(fwd(p, img) ** 2)

    g_ref = jax.jit(jax.grad(loss_ref))(params)
    g_pp = jax.jit(jax.grad(loss_pp))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pp)):
        scale = max(float(jnp.abs(a).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5 * scale)


@pytest.mark.parametrize("pp_mesh", [(4, 2), (2, 4)])
def test_pipeline_parallel_matches_data_parallel(rng, pp_mesh):
    """Same batch, same seed: PP training == (data=8) DP, including the
    grad-accum scan and the optimizer update. (2,4) puts vitt's 4 blocks
    one-per-stage — multi-hop ppermute and a 3-tick bubble."""
    batch = make_batch(rng, accum=2)

    def run(mesh, pp):
        task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                         grad_accum=2, device_mesh=mesh, policy=POLICY_F32,
                         grad_checkpoint=False, pipeline_parallel=pp)
        state = task.init_state(jax.random.PRNGKey(0), (56, 56))
        metrics = None
        for _ in range(2):
            state, metrics = task.train_step(state, batch)
        return state, metrics

    state_dp, m_dp = run(build_mesh(MeshSpec(data=8, model=1)), 0)
    data, stages = pp_mesh
    state_pp, m_pp = run(build_mesh(MeshSpec(data=data, model=stages)),
                         stages)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_pp["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(state_dp.params),
                    jax.tree.leaves(state_pp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_pp_eval_fallback_on_indivisible_batch(rng):
    """A trailing eval batch that doesn't divide data x microbatches falls
    back to the plain forward at trace time and still evaluates."""
    mesh = build_mesh(MeshSpec(data=4, model=2))
    task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                     grad_accum=1, device_mesh=mesh, policy=POLICY_F32,
                     grad_checkpoint=False, pipeline_parallel=2)
    state = task.init_state(jax.random.PRNGKey(0), (56, 56))
    # divisible batch -> pipelined; 5 rows -> fallback; same numerics.
    b8 = make_batch(rng, accum=1, mb=8)
    batch8 = {"image": b8["image"][0], "depth": b8["depth"][0]}
    m8 = task.eval_step(state.params, batch8)
    batch5 = {"image": batch8["image"][:5], "depth": batch8["depth"][:5]}
    m5 = task.eval_step(state.params, batch5)
    assert np.isfinite(float(m8["loss"])) and np.isfinite(float(m5["loss"]))

    # fallback == plain model on the same rows
    plain = task.model.apply({"params": state.params}, batch5["image"])
    pred5 = task.predict(state.params, batch5["image"])
    np.testing.assert_allclose(np.asarray(pred5), np.asarray(plain),
                               rtol=2e-5, atol=2e-5)


def test_pp_train_batch_must_divide_schedule(rng):
    """A train microbatch the schedule can't split is a misconfiguration
    (the whole run would silently train un-pipelined with half the mesh
    idle) — it must raise at trace time, while eval falls back."""
    mesh = build_mesh(MeshSpec(data=4, model=2))
    task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                     grad_accum=1, device_mesh=mesh, policy=POLICY_F32,
                     grad_checkpoint=False, pipeline_parallel=2,
                     pipe_microbatches=2)
    state = task.init_state(jax.random.PRNGKey(0), (56, 56))
    bad = make_batch(rng, accum=1, mb=4)  # 4 % (4 data x 2 micro) != 0
    with pytest.raises(ValueError, match="must divide"):
        task.train_step(state, bad)


def test_int8_auto_scope_uses_replicated_shards_on_indivisible_batch(rng):
    """Eval batches that can't shard run replicated — the int8 auto scope
    must then threshold on data_shards=1, not the data axis (round-3
    review: the static mesh-axis count overcounted for replicated
    layouts, re-enabling attention quant in the bs>32 regime it loses)."""
    mesh = build_mesh(MeshSpec(data=8, model=1))
    task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                     grad_accum=1, device_mesh=mesh, policy=POLICY_F32,
                     grad_checkpoint=False, quant_int8=True)
    assert task.model.data_shards == 8
    state = task.init_state(jax.random.PRNGKey(0), (56, 56))
    b = make_batch(rng, accum=1, mb=5)  # 5 % 8 != 0 -> replicated
    m = task.eval_step(state.params,
                       {"image": b["image"][0], "depth": b["depth"][0]})
    assert np.isfinite(float(m["loss"]))
    assert task._model_repl is not None
    assert task._model_repl.data_shards == 1


def test_pp_mode_guards():
    mesh = build_mesh(MeshSpec(data=4, model=2))
    with pytest.raises(ValueError, match="mutually exclusive"):
        DepthTask(encoder="vitt", device_mesh=mesh, pipeline_parallel=2,
                  tensor_parallel=True)
    with pytest.raises(ValueError, match="does not compose"):
        DepthTask(encoder="vitt", device_mesh=mesh, pipeline_parallel=2,
                  token_merge=0.3)
    with pytest.raises(ValueError, match="mesh_model"):
        DepthTask(encoder="vitt",
                  device_mesh=build_mesh(MeshSpec(data=8, model=1)),
                  pipeline_parallel=2)


def test_pp_forward_and_grads_vits_realistic_geometry(rng):
    """PP parity at REAL vits geometry (384-dim, 12 blocks, taps
    [2,5,8,11] spread 2-per-stage over 4 stages, 126 px -> 82 tokens) —
    the vitt cases can't catch stage-boundary/tap bugs that only appear
    when taps don't align with stage edges."""
    mesh = build_mesh(MeshSpec(data=2, model=4))
    model = build_depth_model("vits", 20.0, dtype=jnp.float32)
    img = jnp.asarray(rng.normal(size=(4, 126, 126, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), img[:1])["params"]

    ref = model.apply({"params": params}, img)
    fwd = build_pp_depth_forward(model, mesh, stages=4, n_micro=2)
    out = jax.jit(fwd)(params, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)

    def loss_ref(p):
        return jnp.mean(model.apply({"params": p}, img) ** 2)

    def loss_pp(p):
        return jnp.mean(fwd(p, img) ** 2)

    g_ref = jax.jit(jax.grad(loss_ref))(params)
    g_pp = jax.jit(jax.grad(loss_pp))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pp)):
        scale = max(float(jnp.abs(a).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5 * scale)


def test_interleaved_schedule_exact_with_linear_blocks():
    """Exact schedule check with transparent linear blocks (block i
    multiplies by a distinct prime): every (chunk, microbatch, lap)
    combination must route and tap-collect correctly for GPipe (V=1)
    and the interleaved schedules (V=2, M in {1, 2})."""
    from e3d_tpu.parallel.pipeline import pipeline_vit_taps

    mesh = build_mesh(MeshSpec(data=4, model=2))
    primes = [2.0, 3.0, 5.0, 7.0]
    stacked = {"w": jnp.asarray(primes)}
    B, T, C = 8, 4, 2
    x = jnp.broadcast_to(jnp.arange(1.0, B + 1)[:, None, None], (B, T, C))

    def block_apply(p, h):
        return h * p["w"]

    taps = [0, 1, 2, 3]
    exp = jnp.stack([x * float(np.prod(primes[:k + 1])) for k in range(4)])
    for v, m in [(1, 2), (2, 1), (2, 2)]:
        out = jax.jit(lambda s, xx, v=v, m=m: pipeline_vit_taps(
            block_apply, s, xx, taps, mesh, 2, m, virtual=v))(stacked, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(exp),
                                   rtol=0, atol=0,
                                   err_msg=f"virtual={v} n_micro={m}")


def test_interleaved_pipeline_matches_data_parallel(rng):
    """Interleaved (V=2) PP training == plain DP, including grad-accum
    and optimizer — vitt's 4 blocks as 4 chunks looped twice around a
    2-device ring."""
    batch = make_batch(rng, accum=2)

    def run(mesh, pp, v):
        task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                         grad_accum=2, device_mesh=mesh, policy=POLICY_F32,
                         grad_checkpoint=False, pipeline_parallel=pp,
                         pipe_virtual=v)
        state = task.init_state(jax.random.PRNGKey(0), (56, 56))
        metrics = None
        for _ in range(2):
            state, metrics = task.train_step(state, batch)
        return state, metrics

    state_dp, m_dp = run(build_mesh(MeshSpec(data=8, model=1)), 0, 1)
    state_pp, m_pp = run(build_mesh(MeshSpec(data=4, model=2)), 2, 2)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_pp["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(state_dp.params),
                    jax.tree.leaves(state_pp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_interleaved_requires_micro_le_stages():
    from e3d_tpu.parallel.pipeline import pipeline_vit_taps

    mesh = build_mesh(MeshSpec(data=4, model=2))
    stacked = {"w": jnp.ones((4,))}
    x = jnp.ones((16, 4, 2))
    with pytest.raises(ValueError, match="n_micro <= stages"):
        pipeline_vit_taps(lambda p, h: h, stacked, x, [3], mesh, 2,
                          n_micro=4, virtual=2)
