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
