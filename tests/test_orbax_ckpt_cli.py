"""test_depth CLI with an Orbax checkpoint dir (our own training output)."""

import json
import os

import numpy as np
import pytest

import e3d_tpu  # noqa: F401
from e3d_tpu.data.synthetic import make_simcol_fixture

CONFIG_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")


def test_train_then_test_with_orbax_ckpt(tmp_path_factory, tmp_path,
                                         monkeypatch):
    from e3d_tpu.cli import test_depth, train_depth

    root = make_simcol_fixture(str(tmp_path_factory.mktemp("sc")),
                               n_procedures=2, frames_per_proc=6, hw=64)
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("E3D_CONFIG_ROOT", CONFIG_ROOT)
    ds_args = [
        f"dataset.data_dir={root}",
        f"dataset.train_list={root}/train.txt",
        f"dataset.val_list={root}/val.txt",
        f"dataset.test_list={root}/test.txt",
        "dataset.batch_size=2", "dataset.num_workers=2", "dataset.size=56",
        "model.encoder=vitt", "model.use_checkpoint=false",
        "trainer.precision=32-true",
    ]
    train_depth.main(ds_args + ["trainer.max_epochs=1",
                                "trainer.accumulate_grad_batches=1",
                                "++trainer.max_steps=2"])

    ckpt_dirs = list((tmp_path / "checkpoints" / "simcol").iterdir())
    assert ckpt_dirs
    monkeypatch.setenv("CHECKPOINT_PATH", str(ckpt_dirs[0]))
    test_depth.main(ds_args)
    out = tmp_path / "test_lightning_results" / "simcol_results.json"
    results = json.loads(out.read_text())
    assert np.isfinite(results["overall_metrics"]["abs_rel"]["mean"])
    assert results["checkpoint"] == str(ckpt_dirs[0])


def test_load_params_restores_best_not_latest(tmp_path):
    """With max_to_keep>1 the test CLI must evaluate the BEST-val
    checkpoint (reference ModelCheckpoint semantics,
    /root/reference/main_lightning.py:109-115), not the latest."""
    import jax
    import jax.numpy as jnp

    from e3d_tpu.cli.test_depth import load_params
    from e3d_tpu.core.checkpoint import CheckpointManager
    from e3d_tpu.train.depth_task import DepthTask

    task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=2,
                     grad_accum=1, grad_checkpoint=False)
    state = task.init_state(jax.random.PRNGKey(0), (56, 56))

    ckpt_dir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
    # Step 1 is the best (val_loss 0.1); step 2 is latest but worse.
    mgr.save(1, state, {"val_loss": 0.1})
    bumped = type(state)(
        jax.tree.map(lambda p: p + 1.0, state.params),
        state.opt_state, state.step + 1)
    mgr.save(2, bumped, {"val_loss": 0.5})
    mgr.close()

    best_leaf = jax.tree.leaves(state.params)[0]
    loaded = load_params(ckpt_dir, "vitt", task, size=56)
    np.testing.assert_allclose(np.asarray(jax.tree.leaves(loaded)[0]),
                               np.asarray(best_leaf))
    assert not np.allclose(np.asarray(jax.tree.leaves(loaded)[0]),
                           np.asarray(jax.tree.leaves(bumped.params)[0]))
