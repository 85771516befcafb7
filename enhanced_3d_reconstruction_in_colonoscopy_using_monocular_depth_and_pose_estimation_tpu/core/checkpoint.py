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

import json
import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    """Best-k by the monitored metric PLUS a single ``latest/`` slot.

    The best-k manager garbage-collects every save that is not among the
    best, so its ``latest_step()`` is really "latest retained BEST" —
    resuming from it would silently rewind a plateaued run to its best
    step (and re-train the same segment after every preemption). The
    ``latest/`` sub-manager keeps exactly the most recent save so
    ``restore_latest`` is true mid-run resume; its metrics carry the
    early-stopping state (``es_best``/``es_bad_count``) so patience
    survives the restart too."""

    def __init__(self, directory: str, max_to_keep: int = 1,
                 monitor: str = "val_loss", mode: str = "min",
                 track_latest: bool = True):
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
        self._track_latest = track_latest
        self._latest_dir = os.path.join(directory, "latest")
        self._latest_mgr = None
        self._latest_metrics_path = os.path.join(self._latest_dir,
                                                 "metrics.json")

    def _get_latest_mgr(self, create: bool):
        """The ``latest/`` sub-manager, built lazily.

        Read-only consumers (infer/serve loading another run's checkpoint
        dir, possibly on a read-only mount) must not mkdir inside it —
        with ``create=False`` a missing ``latest/`` simply means "no
        latest slot" (pre-``latest/`` dirs, or a run that never plateaued).
        Nested non-step dirs are ignored by the parent's step scan
        (verified against the pinned orbax)."""
        if not self._track_latest:
            return None
        if self._latest_mgr is None:
            if not create and not os.path.isdir(self._latest_dir):
                return None
            self._latest_mgr = ocp.CheckpointManager(
                self._latest_dir,
                options=ocp.CheckpointManagerOptions(max_to_keep=1,
                                                     create=True),
            )
        return self._latest_mgr

    def save(self, step: int, state: Any, metrics: dict[str, float]) -> None:
        metrics = {k: float(v) for k, v in metrics.items()}
        self._mgr.save(int(step), args=ocp.args.StandardSave(state),
                       metrics=metrics)
        self._mgr.wait_until_finished()
        latest_mgr = self._get_latest_mgr(create=True)
        if latest_mgr is not None:
            # Skip the latest/ write when the best-k store retained this
            # step (an improving run would otherwise serialize every save
            # twice); ``_latest`` takes the newest step ACROSS both stores,
            # so a stale latest/ slot older than the retained best is
            # never resumed from.
            if int(step) not in set(self._mgr.all_steps()):
                latest_mgr.save(int(step),
                                args=ocp.args.StandardSave(state))
                latest_mgr.wait_until_finished()
            # Orbax only persists per-step metrics under a best_fn (which
            # would turn the latest slot into another best slot) — keep
            # the latest save's metrics in a sidecar JSON instead.
            tmp = self._latest_metrics_path + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump({"step": int(step), **metrics}, f)
            os.replace(tmp, self._latest_metrics_path)

    def best_step(self) -> int | None:
        return self._mgr.best_step()

    def _latest(self) -> tuple[Any, int] | None:
        """(owning manager, step) of the newest save across both stores
        (pre-``latest/`` checkpoint dirs only have the best-k store)."""
        cands = [(self._mgr, self._mgr.latest_step())]
        latest_mgr = self._get_latest_mgr(create=False)
        if latest_mgr is not None:
            cands.append((latest_mgr, latest_mgr.latest_step()))
        cands = [(m, s) for m, s in cands if s is not None]
        return max(cands, key=lambda ms: ms[1]) if cands else None

    def latest_step(self) -> int | None:
        owner = self._latest()
        return None if owner is None else owner[1]

    def latest_metrics(self) -> dict | None:
        """Metrics recorded with the newest save (e.g. early-stop state)."""
        owner = self._latest()
        if owner is None:
            return None
        mgr, step = owner
        try:
            with open(self._latest_metrics_path, encoding="utf-8") as f:
                m = json.load(f)
            if m.get("step") == step:
                return {k: v for k, v in m.items() if k != "step"}
        except (OSError, ValueError):
            pass
        meta = mgr.metadata(step)  # best-k store keeps metrics natively
        return dict(meta.metrics) if meta.metrics else None

    def restore(self, step: int, template: Any) -> Any:
        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(template))

    def restore_best(self, template: Any) -> Any | None:
        step = self.best_step()
        return None if step is None else self.restore(step, template)

    def restore_latest(self, template: Any) -> Any | None:
        owner = self._latest()
        if owner is None:
            return None
        mgr, step = owner
        return mgr.restore(step, args=ocp.args.StandardRestore(template))

    @staticmethod
    def _restore_untyped(mgr: Any, step: int) -> Any:
        """Template-less restore that ignores the SAVED shardings.

        A bare ``mgr.restore(step)`` replays the sharding metadata
        recorded at save time and refuses when the device topology
        changed — but the prime consumer is exactly that case: train on
        an N-chip mesh, then serve/infer on one chip. Reading every leaf
        as a host array through a raw PyTree checkpointer sidesteps the
        topology check (the manager API can't: a fresh process has no
        handler registered for the item, so ``item_metadata`` is empty);
        callers ``device_put`` with their own shardings."""
        import jax
        import numpy as np

        path = os.path.join(str(mgr.directory), str(step), "default")
        ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
        meta = ckptr.metadata(path)
        tree = getattr(meta, "item_metadata", meta)
        tree = getattr(tree, "tree", tree)
        # None leaves (e.g. serialized optax EmptyState) are empty
        # subtrees for tree.map, so the restore_args structure matches.
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
        return ckptr.restore(
            path, args=ocp.args.PyTreeRestore(restore_args=restore_args))

    def restore_latest_untyped(self) -> Any | None:
        """Restore the latest checkpoint without a template (as saved —
        nested dicts of host arrays). Lets inference CLIs read training
        output without constructing an optimizer state, on any device
        topology."""
        owner = self._latest()
        if owner is None:
            return None
        mgr, step = owner
        return self._restore_untyped(mgr, step)

    def restore_best_untyped(self) -> Any | None:
        """Best-val checkpoint without a template, latest fallback.

        Inference CLIs serve the best-val weights — the reference's
        ``ModelCheckpoint(save_top_k=1)`` + load flow
        (``main_lightning.py:109-115``) — not the possibly-plateaued
        final save that true mid-run-resume ``restore_latest`` returns."""
        step = self.best_step()
        if step is not None:
            return self._restore_untyped(self._mgr, step)
        return self.restore_latest_untyped()

    def close(self) -> None:
        self._mgr.close()
        if self._latest_mgr is not None:  # only if actually opened
            self._latest_mgr.close()


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
