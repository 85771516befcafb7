"""Mid-run resume through the training CLI (++trainer.resume=true)."""

import json
import os

import pytest

import e3d_tpu  # noqa: F401
from e3d_tpu.data.synthetic import make_simcol_fixture

CONFIG_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")


def test_train_depth_resume(tmp_path_factory, tmp_path, monkeypatch,
                            capsys):
    from e3d_tpu.cli import train_depth

    root = make_simcol_fixture(str(tmp_path_factory.mktemp("sc")),
                               n_procedures=2, frames_per_proc=6, hw=64)
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("E3D_CONFIG_ROOT", CONFIG_ROOT)
    args = [
        f"dataset.data_dir={root}",
        f"dataset.train_list={root}/train.txt",
        f"dataset.val_list={root}/val.txt",
        f"dataset.test_list={root}/test.txt",
        "dataset.batch_size=2", "dataset.num_workers=2", "dataset.size=56",
        "model.encoder=vitt", "model.use_checkpoint=false",
        "trainer.max_epochs=2", "trainer.accumulate_grad_batches=1",
        "trainer.precision=32-true",
    ]
    train_depth.main(args + ["++trainer.max_steps=2"])
    capsys.readouterr()

    # Second run resumes from step 2 and continues to step 4.
    train_depth.main(args + ["++trainer.max_steps=4",
                             "++trainer.resume=true"])
    out = capsys.readouterr().out
    assert "resumed from step 2" in out

    exp = list((tmp_path / "configs" / "experiments" / "simcol").iterdir())[0]
    records = [json.loads(line) for line in
               (exp / "metrics.jsonl").read_text().splitlines()]
    steps = {r["step"] for r in records if "train_loss" in r}
    assert 4 in steps  # continued past the restored step
