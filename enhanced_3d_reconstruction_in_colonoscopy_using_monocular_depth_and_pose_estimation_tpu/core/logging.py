"""Metric logging: stdout + JSONL sink, W&B-compatible schema.

Replaces the reference's WandbLogger (``main_lightning.py:102-107``) with a
host-side sink fed by on-device accumulators. Namespacing matches the
reference (``Train/``, ``Val/``, ``Test/``, ``SimCol/``, ``C3VD/``). If the
``wandb`` package happens to be importable it is used as an additional sink;
otherwise it is silently skipped (it is not available in this image).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Mapping

import numpy as np


def _to_scalar(v: Any) -> Any:
    if hasattr(v, "item"):
        try:
            return v.item()
        except Exception:
            return float(np.asarray(v))
    return v


class MetricLogger:
    def __init__(self, log_dir: str, project: str = "", run_name: str = "",
                 stdout_every: int = 100):
        self.log_dir = log_dir
        self.project = project
        self.run_name = run_name
        self.stdout_every = max(1, stdout_every)
        os.makedirs(log_dir, exist_ok=True)
        self._fh = open(os.path.join(log_dir, "metrics.jsonl"), "a",
                        encoding="utf-8", buffering=1)
        self._wandb = None
        try:  # optional
            import wandb  # type: ignore
            self._wandb = wandb.init(project=project or "e3d-tpu",
                                     name=run_name or None, dir=log_dir)
        except Exception:
            self._wandb = None
        self._t0 = time.time()

    def log(self, metrics: Mapping[str, Any], step: int,
            force_stdout: bool = False) -> None:
        record = {k: _to_scalar(v) for k, v in metrics.items()}
        record["step"] = step
        record["time"] = round(time.time() - self._t0, 3)
        self._fh.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            try:
                self._wandb.log(dict(record), step=step)
            except Exception:
                pass
        if force_stdout or step % self.stdout_every == 0:
            msg = " ".join(
                f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in record.items()
            )
            print(f"[metrics] {msg}", file=sys.stdout, flush=True)

    def close(self) -> None:
        self._fh.close()
        if self._wandb is not None:
            try:
                self._wandb.finish()
            except Exception:
                pass
