"""TPU-platform sharding guardrails via ``jax.export`` (VERDICT r4 #5).

``test_hlo_guardrails.py`` asserts collectives in the *CPU-partitioned*
HLO — but XLA:CPU never emits the TPU-form collectives (reduce-scatter;
SP's RS+AG pairs), so a sharding constraint could vanish from the TPU
program while the CPU tests stay green. Complement: export the train
step with ``platforms=['tpu']`` — cross-platform lowering that needs no
TPU hardware — and assert the *pre-partitioning* sharding facts the TPU
partitioner will consume:

- the exported calling convention (``in_shardings_hlo``) keeps FSDP's
  params/moments sharded (plain DP: only the batch is sharded);
- the module body keeps SP's between-block token-dim constraints
  (this jax serializes them as Shardy ``sdy.sharding_constraint`` ops
  carrying the ``("data", "model")`` axes; plain TP has none on the
  token stream).

A constraint that silently stops applying fails here even though no TPU
mesh exists in this environment. The PP step is an explicit shard_map
schedule (collective-permutes asserted in the CPU guardrails); its
sharding story is the schedule itself, so PP is intentionally not
exported here.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import e3d_tpu  # noqa: F401
from e3d_tpu.core.dtypes import POLICY_F32
from e3d_tpu.parallel import MeshSpec, build_mesh
from e3d_tpu.train import DepthTask


def _make_batch(rng, mb=8, hw=56):
    return {
        "image": jnp.asarray(rng.normal(size=(1, mb, hw, hw, 3))
                             .astype(np.float32)),
        "depth": jnp.asarray(rng.uniform(0.5, 19.0,
                                         size=(1, mb, hw, hw, 1))
                             .astype(np.float32)),
    }


def _export_tpu(task, batch):
    hw = batch["image"].shape[2]
    state = task.init_state(jax.random.PRNGKey(0), (hw, hw))
    jitted = task.jitted_train_step(state, batch)
    exp = jax.export.export(jitted, platforms=["tpu"])(state, batch)
    assert exp.platforms == ("tpu",)
    return exp


def _n_sharded_inputs(exp) -> int:
    return sum("replicated" not in str(s) for s in exp.in_shardings_hlo)


def test_fsdp_export_keeps_params_sharded(rng):
    """The TPU-exported FSDP step's calling convention must carry the
    ZeRO layout: many sharded inputs (params + both Adam moments), vs
    plain DP's batch-only sharding. If fsdp_spec silently stopped
    applying, the export collapses to the DP count and this contrast
    fails — with no TPU in the loop."""
    batch = _make_batch(rng)
    mesh = build_mesh(MeshSpec(data=8, model=1))

    task_fs = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                        grad_accum=1, device_mesh=mesh, policy=POLICY_F32,
                        grad_checkpoint=False, fsdp=True,
                        fsdp_min_size=1024)
    n_fs = _n_sharded_inputs(_export_tpu(task_fs, batch))

    task_dp = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                        grad_accum=1, device_mesh=mesh, policy=POLICY_F32,
                        grad_checkpoint=False)
    n_dp = _n_sharded_inputs(_export_tpu(task_dp, batch))

    # vitt with fsdp_min_size=1024: >=8 param leaves x {param, mu, nu}.
    assert n_fs >= 20, f"only {n_fs} sharded inputs in the FSDP export"
    # DP shards just the batch leaves (image, depth).
    assert n_dp <= 4, f"{n_dp} sharded inputs in the plain-DP export"
    assert n_fs > 3 * n_dp


_SP_CONSTRAINT = re.compile(
    r'sdy\.sharding_constraint[^\n]*\{"data"\},\s*\{"model"\}')


def test_seq_parallel_export_keeps_token_constraints(rng):
    """SP's between-block residual-stream constraint must survive into
    the TPU-exported module as token-dim sharding ops over ("data",
    "model"); plain TP on the same mesh has none. (The serialized form
    is Shardy's sdy.sharding_constraint in this jax; the regex pins the
    axes, not the dialect spelling of replication.)"""
    batch = _make_batch(rng, hw=42)  # 10 tokens: shards over model=2
    mesh = build_mesh(MeshSpec(data=4, model=2))

    task_sp = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                        grad_accum=1, device_mesh=mesh, policy=POLICY_F32,
                        grad_checkpoint=False, tensor_parallel=True,
                        seq_parallel=True)
    text_sp = _export_tpu(task_sp, batch).mlir_module()
    n_sp = len(_SP_CONSTRAINT.findall(text_sp))

    task_tp = DepthTask(encoder="vitt", max_depth=20.0, total_steps=10,
                        grad_accum=1, device_mesh=mesh, policy=POLICY_F32,
                        grad_checkpoint=False, tensor_parallel=True)
    text_tp = _export_tpu(task_tp, batch).mlir_module()
    n_tp = len(_SP_CONSTRAINT.findall(text_tp))

    # One constraint per block boundary (vitt depth 4) on fwd + more on
    # the backward; the exact count is XLA's business — presence vs the
    # TP control is the guardrail.
    assert n_sp >= 4, \
        f"SP export carries only {n_sp} (data, model) token constraints"
    assert n_tp == 0, \
        f"plain TP unexpectedly has {n_tp} (data, model) token constraints"
