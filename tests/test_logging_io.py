"""MetricLogger JSONL sink + legacy split assembler."""

import json
import os

import jax.numpy as jnp

import e3d_tpu  # noqa: F401
from e3d_tpu.core.logging import MetricLogger
from e3d_tpu.data.io import process_images
from e3d_tpu.data.synthetic import make_simcol_fixture


def test_metric_logger_jsonl(tmp_path):
    logger = MetricLogger(str(tmp_path), project="p", run_name="r",
                          stdout_every=100)
    logger.log({"train_loss": jnp.asarray(0.5), "lr": 1e-4}, step=1)
    logger.log({"val_loss": 0.25}, step=2, force_stdout=True)
    logger.close()
    lines = [json.loads(line) for line in
             (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["train_loss"] == 0.5
    assert lines[0]["step"] == 1
    assert isinstance(lines[0]["train_loss"], float)  # device scalar -> py
    assert lines[1]["val_loss"] == 0.25


def test_process_images_legacy_splitter(tmp_path):
    root = make_simcol_fixture(str(tmp_path), n_procedures=2,
                               frames_per_proc=3, hw=16)
    base = os.path.join(root, "SyntheticColon_I")
    vids = [os.path.join(base, "Frames_S1"), os.path.join(base, "Frames_S2")]
    td, tr, vd, vr, ed, er = process_images([vids[0]], [vids[1]],
                                            [vids[1]], root)
    assert len(td) == len(tr) == 3
    assert len(vd) == len(vr) == 3
    assert len(ed) == len(er) == 3
    assert all("Depth" in p for p in td)
    assert all("FrameBuffer" in p for p in tr)
