"""Combined SimCol+C3VD training CLI smoke test (per-source metrics)."""

import json
import os

import pytest

import e3d_tpu  # noqa: F401
from e3d_tpu.data.synthetic import make_c3vd_fixture, make_simcol_fixture

CONFIG_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")


def test_train_depth_combined_smoke(tmp_path_factory, tmp_path, monkeypatch):
    from e3d_tpu.cli import train_depth

    simcol = make_simcol_fixture(str(tmp_path_factory.mktemp("sc")),
                                 n_procedures=2, frames_per_proc=4, hw=64)
    c3vd = make_c3vd_fixture(str(tmp_path_factory.mktemp("cv")),
                             n_scenes=1, frames=4, hw=64)
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("E3D_CONFIG_ROOT", CONFIG_ROOT)
    train_depth.main([
        "dataset=combined",
        f"dataset.simcol_data_dir={simcol}",
        f"dataset.simcol_train_list={simcol}/train.txt",
        f"dataset.simcol_val_list={simcol}/val.txt",
        f"dataset.simcol_test_list={simcol}/test.txt",
        f"dataset.c3vd_data_dir={c3vd}",
        f"dataset.c3vd_train_list={c3vd}/train.txt",
        f"dataset.c3vd_val_list={c3vd}/val.txt",
        "dataset.batch_size=4",
        "dataset.num_workers=2",
        "dataset.size=56",
        "model.encoder=vitt",
        "model.use_checkpoint=false",
        "trainer.max_epochs=1",
        "trainer.accumulate_grad_batches=1",
        "trainer.precision=32-true",
        "++trainer.max_steps=2",
    ])
    run_dirs = list((tmp_path / "configs" / "experiments"
                     / "combined").iterdir())
    assert run_dirs
    metrics_file = run_dirs[0] / "metrics.jsonl"
    lines = [json.loads(line) for line in
             metrics_file.read_text().splitlines()]
    val_lines = [rec for rec in lines if "val_loss" in rec]
    assert val_lines, "no validation records"
    keys = set().union(*[set(rec) for rec in val_lines])
    # per-source metrics present
    assert "Val/val_SimCol/l1" in keys
    assert "Val/val_C3VD/rmse" in keys
