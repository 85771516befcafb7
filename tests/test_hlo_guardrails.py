"""Compiled-HLO guardrails for the parallel modes (VERDICT r3 #4).

The numerics tests (TP==DP, SP==DP, FSDP==DP, PP==DP) prove the modes
compute the right answer, but a GSPMD regression that silently
re-replicates parameters (or drops a sharding constraint) would still
pass them — it would only show up as multi-chip slowness nobody in this
environment can measure. These tests ``.lower().compile()`` each mode's
train step on the 8-device CPU mesh and assert the expected collectives
are present in the compiled module text, with the plain-DP step as the
negative control.

The counts are deliberately coarse (presence / relative ordering, not
exact instruction counts): XLA is free to reassociate or combine
collectives between versions, but a mode whose defining collective
vanishes entirely — FSDP without just-in-time param all-gathers,
seq-parallel without token resharding, pipeline without
collective-permute — has lost its sharding semantics, which is exactly
the regression to catch.

Backend caveat (measured 2026-08, jax 0.7/XLA:CPU): the CPU SPMD
partitioner never emits ``reduce-scatter`` — it lowers ZeRO grad
reduction to all-gather + all-reduce(+slice) and expresses SP's
token-dim resharding as ``collective-permute``. The assertions below
target the collectives the CPU partitioner actually emits; the
reduce-scatter form only materializes on TPU, which this environment
cannot compile for ahead-of-time. Measured counts (vitt, 8-dev mesh):
DP {ar:2}, FSDP {ag:103, ar:12}, TP {ag:56, ar:19},
TP+SP {ag:85, ar:17, cp:11}, PP {ar:6, cp:30}.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np

import e3d_tpu  # noqa: F401
from e3d_tpu.core.dtypes import POLICY_F32
from e3d_tpu.parallel import MeshSpec, build_mesh
from e3d_tpu.train import DepthTask


def _make_batch(rng, accum=1, mb=8, hw=56):
    return {
        "image": jnp.asarray(rng.normal(size=(accum, mb, hw, hw, 3))
                             .astype(np.float32)),
        "depth": jnp.asarray(rng.uniform(0.5, 19.0,
                                         size=(accum, mb, hw, hw, 1))
                             .astype(np.float32)),
    }


def _compiled_train_text(task, batch) -> str:
    """Compiled (post-SPMD-partitioning) HLO text of the train step."""
    hw = batch["image"].shape[2]
    state = task.init_state(jax.random.PRNGKey(0), (hw, hw))
    state, _ = task.train_step(state, batch)  # populate the jit cache
    key = (True, "max_depth" in batch, "weight" in batch)
    jitted = task._train_step[key]
    return jitted.lower(state, batch).compile().as_text()


def _count(text: str, op: str) -> int:
    # TPU lowers collectives to async -start/-done pairs; CPU keeps them
    # synchronous. Count the starts either way.
    return len(re.findall(rf"{op}(?:-start)?\(", text))


def test_fsdp_gathers_params_just_in_time(rng):
    """ZeRO expressed as shardings must COMPILE to the ZeRO schedule:
    params all-gathered just-in-time inside the step (many gathers — one
    per sharded layer family), sharded grad reduction (more all-reduces
    than plain DP's single fused one). The plain-DP control emits zero
    all-gathers — so a GSPMD change that silently re-replicates FSDP
    params fails here, not on a future pod. (On TPU the grad reduction
    additionally fuses to reduce-scatter; XLA:CPU never emits it — see
    module docstring.)"""
    batch = _make_batch(rng, accum=2)
    mesh = build_mesh(MeshSpec(data=8, model=1))

    task_fs = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                        grad_accum=2, device_mesh=mesh, policy=POLICY_F32,
                        grad_checkpoint=False, fsdp=True,
                        fsdp_min_size=1024)
    text_fs = _compiled_train_text(task_fs, batch)
    ag_fs = _count(text_fs, "all-gather")
    assert ag_fs >= 10, \
        f"FSDP step compiled with only {ag_fs} all-gathers (params were " \
        "never sharded => ZeRO silently degraded to replicated DP?)"

    task_dp = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                        grad_accum=2, device_mesh=mesh, policy=POLICY_F32,
                        grad_checkpoint=False)
    text_dp = _compiled_train_text(task_dp, batch)
    assert _count(text_dp, "all-gather") == 0
    assert _count(text_fs, "all-reduce") > _count(text_dp, "all-reduce")


def test_fsdp_params_and_moments_stay_sharded_in_executable(rng):
    """The compiled executable's INPUT shardings (not just the requested
    in_shardings) keep the large params/moments on the data axis."""
    batch = _make_batch(rng, accum=1)
    mesh = build_mesh(MeshSpec(data=8, model=1))
    task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                     grad_accum=1, device_mesh=mesh, policy=POLICY_F32,
                     grad_checkpoint=False, fsdp=True, fsdp_min_size=1024)
    state = task.init_state(jax.random.PRNGKey(0), (56, 56))
    state, _ = task.train_step(state, batch)
    jitted = task._train_step[(True, False, False)]
    compiled = jitted.lower(state, batch).compile()
    (state_sh, _), _ = compiled.input_shardings
    n_sharded = sum(
        not s.is_fully_replicated
        for s in jax.tree.leaves(state_sh.params,
                                 is_leaf=lambda x: hasattr(
                                     x, "is_fully_replicated")))
    assert n_sharded >= 4, f"only {n_sharded} param leaves sharded"


def test_seq_parallel_reshards_tokens_between_blocks(rng):
    """Megatron-SP's defining property at the HLO level: activations are
    token-sharded between blocks, so the compiled step contains
    token-dim resharding collectives that plain TP on the same mesh has
    none of (XLA:CPU expresses the reshard as collective-permute; on TPU
    the same boundary becomes reduce-scatter + all-gather pairs). If
    SP's constraint silently stopped applying, SP would compile
    identically to TP and this contrast collapses."""
    batch = _make_batch(rng, accum=1, hw=42)  # 10 tokens: shards over 2
    mesh = build_mesh(MeshSpec(data=4, model=2))

    task_tp = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                        grad_accum=1, device_mesh=mesh, policy=POLICY_F32,
                        grad_checkpoint=False, tensor_parallel=True)
    text_tp = _compiled_train_text(task_tp, batch)

    task_sp = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                        grad_accum=1, device_mesh=mesh, policy=POLICY_F32,
                        grad_checkpoint=False, tensor_parallel=True,
                        seq_parallel=True)
    text_sp = _compiled_train_text(task_sp, batch)

    # Both modes keep the Megatron TP collectives alive.
    assert _count(text_tp, "all-reduce") >= 2
    assert _count(text_sp, "all-reduce") >= 2

    cp_sp = _count(text_sp, "collective-permute")
    rs_sp = _count(text_sp, "reduce-scatter")
    cp_tp = _count(text_tp, "collective-permute")
    rs_tp = _count(text_tp, "reduce-scatter")
    assert cp_tp + rs_tp == 0, (cp_tp, rs_tp)
    assert cp_sp + rs_sp >= 2, \
        "SP step compiled without any token-resharding collectives " \
        "(the between-block token sharding constraint vanished?)"


def test_pipeline_compiles_to_collective_permute(rng):
    """The GPipe schedule's stage-to-stage hop is an explicit ppermute
    inside the tick scan: the compiled train step must contain
    collective-permutes (forward hop + its AD transpose) and the
    stage-merge psum; plain DP has no collective-permute at all."""
    batch = _make_batch(rng, accum=1, mb=8)
    mesh = build_mesh(MeshSpec(data=4, model=2))
    task_pp = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                        grad_accum=1, device_mesh=mesh, policy=POLICY_F32,
                        grad_checkpoint=False, pipeline_parallel=2,
                        pipe_microbatches=2)
    text_pp = _compiled_train_text(task_pp, batch)
    n_cp = _count(text_pp, "collective-permute")
    # ppermutes appear in the tick-scan body (fwd hop), its AD transpose,
    # and the partitioner's halo/reshard around the stage boundary
    # (measured 30 on XLA:CPU). Guard the two real regressions: the hop
    # disappearing (schedule collapsed to replicated compute) and an
    # explosion signalling a fully unrolled schedule.
    assert 2 <= n_cp <= 96, n_cp

    mesh_dp = build_mesh(MeshSpec(data=8, model=1))
    task_dp = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                        grad_accum=1, device_mesh=mesh_dp,
                        policy=POLICY_F32, grad_checkpoint=False)
    text_dp = _compiled_train_text(task_dp, batch)
    assert _count(text_dp, "collective-permute") == 0


def test_pp_head_shards_over_full_mesh(rng):
    """The DPT head after the pipeline is NOT replicated compute: with a
    batch that divides the full mesh, build_pp_depth_forward constrains
    the head's batch to (data, model), so the compiled forward must gather
    the depth output back over the pipeline axis (>=1 all-gather). The
    indivisible-batch fallback keeps the replicated head: no all-gather."""
    from e3d_tpu.models.depth_anything import build_depth_model
    from e3d_tpu.parallel.pipeline import build_pp_depth_forward

    mesh = build_mesh(MeshSpec(data=4, model=2))
    model = build_depth_model("vitt", 20.0, dtype=jnp.float32,
                              grad_checkpoint=False)
    img = jnp.asarray(rng.normal(size=(8, 56, 56, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), img[:1])["params"]
    fwd = build_pp_depth_forward(model, mesh, stages=2, n_micro=2)

    text = jax.jit(fwd).lower(params, img).compile().as_text()
    assert _count(text, "all-gather") >= 1, \
        "PP forward compiled without the head-output all-gather — the " \
        "DPT head is running replicated over the pipeline axis again"

    # Replicated-head fallback control: on a 2x4 mesh, a 4-row batch
    # divides data*micro (2*2=4) so the pipeline schedule runs, but NOT
    # data*model (2*4=8) — so the DPT head can't shard over the full
    # mesh and must fall back to replicated (zero all-gathers).
    mesh_wide = build_mesh(MeshSpec(data=2, model=4))
    fwd_wide = build_pp_depth_forward(model, mesh_wide, stages=4, n_micro=2)
    img4 = img[:4]  # 4 rows: divides data*micro=4, not data*model=8
    text_fb = jax.jit(fwd_wide).lower(params, img4).compile().as_text()
    assert _count(text_fb, "all-gather") == 0, \
        "replicated-head fallback unexpectedly emitted an all-gather"
