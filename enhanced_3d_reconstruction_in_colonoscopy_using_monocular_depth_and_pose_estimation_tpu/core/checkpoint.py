"""Checkpointing: best-k on val_loss + mid-run resume (Orbax).

The reference saves top-1 on val_loss via Lightning ``ModelCheckpoint``
(``/root/reference/main_lightning.py:109-115``) and never wires resume
(SURVEY.md section 5). Here both are first-class:

- ``save(step, state, val_loss)`` keeps the best-k checkpoints by val_loss;
- ``restore_best/restore_latest`` resume full train state (params +
  optimizer + step) — not just weights;
- works with any pytree (Depth/PoseTrainState).
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 1,
                 monitor: str = "val_loss", mode: str = "min"):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=lambda metrics: metrics[monitor],
            best_mode=mode,
            create=True,
        )
        self._monitor = monitor
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, step: int, state: Any, metrics: dict[str, float]) -> None:
        self._mgr.save(
            int(step),
            args=ocp.args.StandardSave(state),
            metrics={k: float(v) for k, v in metrics.items()},
        )
        self._mgr.wait_until_finished()

    def best_step(self) -> int | None:
        return self._mgr.best_step()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, step: int, template: Any) -> Any:
        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(template))

    def restore_best(self, template: Any) -> Any | None:
        step = self.best_step()
        return None if step is None else self.restore(step, template)

    def restore_latest(self, template: Any) -> Any | None:
        step = self.latest_step()
        return None if step is None else self.restore(step, template)

    def restore_latest_untyped(self) -> Any | None:
        """Restore the latest checkpoint without a template (as saved —
        nested dicts of numpy arrays). Lets inference CLIs read training
        output without constructing an optimizer state."""
        step = self.latest_step()
        return None if step is None else self._mgr.restore(step)

    def close(self) -> None:
        self._mgr.close()


class EarlyStopping:
    """Patience-based early stop on a monitored metric (reference:
    ``EarlyStopping(monitor="val_loss", patience=20)``,
    ``main_lightning.py:117-123``)."""

    def __init__(self, patience: int = 20, mode: str = "min",
                 min_delta: float = 0.0):
        self.patience = patience
        self.mode = mode
        self.min_delta = min_delta
        self.best: float | None = None
        self.bad_count = 0

    def update(self, value: float) -> bool:
        """Returns True if training should stop."""
        improved = (
            self.best is None
            or (self.mode == "min" and value < self.best - self.min_delta)
            or (self.mode == "max" and value > self.best + self.min_delta)
        )
        if improved:
            self.best = value
            self.bad_count = 0
            return False
        self.bad_count += 1
        # Lightning semantics: stop when wait_count >= patience, checked
        # only after a non-improving eval (patience=0 never stops an
        # improving one).
        return self.bad_count >= self.patience
