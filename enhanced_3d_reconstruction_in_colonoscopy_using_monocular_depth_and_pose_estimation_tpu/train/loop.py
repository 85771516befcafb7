"""Host-side training loops: epochs, half-epoch validation, best-k
checkpoints, early stopping, metric logging.

Replaces PyTorch Lightning's Trainer for this workload
(``/root/reference/main_lightning.py:109-145``): same knobs
(``max_epochs``, ``val_check_interval=0.5``, ``accumulate_grad_batches``,
checkpoint-on-val_loss, EarlyStopping patience 20, per-step LR logging),
but the device never leaves the jitted train/eval steps; the host only
shuttles batches and reads scalars.
"""

from __future__ import annotations

import time
from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import CheckpointManager, EarlyStopping
from ..core.debug import StepTimer
from ..core.logging import MetricLogger
from ..core.metrics import MetricBank
from ..core.preempt import PreemptionGuard
from ..data.preprocess import DevicePreprocessor
from ..parallel import mesh as meshlib
from .depth_task import DepthTask, DepthTrainState


def _make_group_stacker(mesh):
    """Jitted stack of ``accum`` prepped microbatches into one (A, B, ...)
    batch with an explicit output sharding: batch dim over ``data`` when it
    divides the axis, replicated otherwise. One compiled program per
    (shape, sharded) pair — built once per fit."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    stack_sh = jax.jit(
        lambda *xs: jnp.stack(xs),
        out_shardings=NamedSharding(mesh, P(None, meshlib.DATA_AXIS)))
    stack_re = jax.jit(lambda *xs: jnp.stack(xs),
                       out_shardings=meshlib.replicated_sharding(mesh))

    def stack(prepped: list[dict], key: str, sharded: bool):
        fn = stack_sh if sharded else stack_re
        return fn(*[p[key] for p in prepped])

    return stack


def _restore_stopper(stopper: EarlyStopping, ckpt: CheckpointManager) -> None:
    """Rehydrate early-stop patience from the latest checkpoint's metrics
    (saved alongside val_loss) so a resumed plateaued run doesn't reset
    its counter and cycle on the same segment after every preemption."""
    m = ckpt.latest_metrics()
    if m and "es_bad_count" in m:
        stopper.best = float(m["es_best"])
        stopper.bad_count = int(m["es_bad_count"])


def _preempt_agreed(guard: PreemptionGuard, host_sync: bool = True) -> bool:
    """Cross-process agreement on the preemption flag.

    Single-process: just the local flag, every step. Multi-process: the
    checkpoint save below is COLLECTIVE (all hosts coordinate through the
    shared Orbax dir), and a maintenance SIGTERM can land on workers a
    step apart — if only the signalled subset entered the save, the
    cluster would deadlock until the kill grace period. So processes
    agree via a scalar allgather: stop iff ANY process saw the signal.
    The allgather is itself a host-blocking collective, so it piggybacks
    on the loop's existing host-sync boundaries (``host_sync`` is the
    deterministic log/val-boundary predicate, identical on every
    process): between boundaries steps stay fully pipelined, and a
    locally-set flag just waits for the next boundary — SIGTERM grace
    periods are minutes, steps are seconds (advisor r3)."""
    if jax.process_count() == 1:
        return guard.requested
    if not host_sync:
        return False
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        np.asarray(bool(guard.requested)))
    return bool(np.asarray(flags).any())


def _handle_preemption(ckpt: CheckpointManager, step: int, state,
                       stopper: EarlyStopping) -> None:
    """Save a final mid-run checkpoint on SIGTERM/SIGINT.

    val_loss gets a sentinel so the save can never displace a true
    best-k slot (it lands in the ``latest/`` store); the early-stop state
    rides along so a resumed run keeps its patience counter. If the
    signal arrived right after a val-boundary save of the same step,
    there is nothing newer to write."""
    if ckpt.latest_step() == int(step):
        print(f"[preempt] signal received at step {step} "
              f"(already checkpointed); exiting cleanly")
        return
    ckpt.save(step, state, {
        "val_loss": 1e30,
        "es_best": (float(stopper.best) if stopper.best is not None
                    else 1e30),
        "es_bad_count": float(stopper.bad_count),
        "preempted": 1.0,
    })
    print(f"[preempt] signal received — saved latest/ at step {step}; "
          f"restart with trainer.resume=true to continue")


def _group_accum(loader: Iterable[dict], accum: int):
    """Group ``accum`` consecutive loader batches (Lightning grad-accum
    semantics); a trailing partial group is yielded too — Lightning steps
    the optimizer on the epoch remainder (``fit_depth`` pads it to static
    shape and masks the padding via per-chunk weights)."""
    group: list[dict] = []
    for batch in loader:
        group.append(batch)
        if len(group) == accum:
            yield group
            group = []
    if group:
        yield group


def fit_depth(
    task: DepthTask,
    datamodule,
    max_epochs: int,
    log_dir: str,
    ckpt_dir: str,
    val_check_interval: float = 0.5,
    patience: int = 20,
    logger: MetricLogger | None = None,
    max_depths: tuple[float, float] | None = None,
    seed: int = 42,
    pretrained_params: Any | None = None,
    max_steps: int | None = None,
    resume: bool = False,
    log_every: int = 1,
) -> DepthTrainState:
    """Fine-tune depth; returns the final train state.

    ``resume=True`` restores the latest checkpoint (params + optimizer +
    step) from ``ckpt_dir`` — mid-run resume, which the reference never
    wires (SURVEY.md section 5)."""
    if getattr(datamodule, "train_dataset", None) is None:
        datamodule.setup("fit")  # no-op if the CLI already set up
    size = datamodule.size
    pre = DevicePreprocessor(size=size)
    logger = logger or MetricLogger(log_dir)
    ckpt = CheckpointManager(ckpt_dir, max_to_keep=1)
    stopper = EarlyStopping(patience=patience)

    state = task.init_state(jax.random.PRNGKey(seed), (size, size),
                            pretrained_params=pretrained_params)
    if resume:
        restored = ckpt.restore_latest(state)
        if restored is not None:
            state = jax.device_put(restored, task.state_shardings(state))
            _restore_stopper(stopper, ckpt)
            print(f"[fit_depth] resumed from step {int(state.step)}")
    rng = jax.random.PRNGKey(seed + 1)
    lr_table = task.lr_table()
    timer = StepTimer()
    host_step = int(state.step)
    log_every = max(1, log_every)

    train_loader = datamodule.train_loader()
    accum = task.grad_accum
    steps_per_epoch = max(1, -(-len(train_loader) // accum))
    val_every = max(1, int(steps_per_epoch * val_check_interval))
    combined = max_depths is not None
    stacker = _make_group_stacker(task.mesh)

    # Running epoch means of the train metrics (torchmetrics MeanMetric
    # semantics, reference lightning_model.py:145-152) — the bank lives on
    # device; the host reads it once per epoch.
    bank_keys = ("loss", "d1", "abs_rel", "rmse", "l1")
    bank_update = jax.jit(MetricBank.update)

    stop = False
    with PreemptionGuard() as guard:
        for epoch in range(max_epochs):
            if stop:
                break
            bank = MetricBank.zeros(bank_keys)
            t_epoch = time.time()
            for group in _group_accum(iter(train_loader), accum):
                n_real = len(group)
                # Any microbatch the loader could not process-shard (trailing
                # batch not divisible by process_count) forces the whole accum
                # group onto the replicated path.
                replicated = any(bool(b.pop("_replicated", False))
                                 for b in group)
                if n_real < accum:
                    # Trailing partial group: pad to static shape (no
                    # recompile), mask padding with zero weights below.
                    group = group + [group[-1]] * (accum - n_real)
                # Global-array assembly: identical code path for 1 and N
                # processes (each process contributed its local rows; see
                # PrefetchLoader + parallel.mesh.shard_batch).
                group = [meshlib.shard_batch(task.mesh, b,
                                             force_replicated=replicated)
                         for b in group]
                mb_global = group[0]["image"].shape[0]
                sharded = (not replicated
                           and mb_global % task.mesh.shape[meshlib.DATA_AXIS]
                           == 0)
                rng, prep_rng = jax.random.split(rng)
                prepped = [
                    pre(b, train=True,
                        rng=jax.random.fold_in(prep_rng, i),
                        max_depths=max_depths)
                    for i, b in enumerate(group)
                ]
                batch = {
                    k: stacker(prepped, k, sharded)
                    for k in ("image", "depth")
                }
                batch["weight"] = jnp.asarray(
                    [1.0] * n_real + [0.0] * (accum - n_real), jnp.float32)
                if combined:
                    batch["max_depth"] = stacker(prepped, "max_depth", sharded)
                with timer.step():
                    state, metrics = task.train_step(state, batch)
                    bank = bank_update(bank, metrics)  # device-side, no sync
                    step = host_step = host_step + 1
                    boundary = bool(step % log_every == 0
                                    or step % val_every == 0
                                    or (max_steps and step >= max_steps))
                    if boundary:
                        # Host sync only at logging/validation boundaries —
                        # otherwise steps stay fully pipelined on device.
                        lr_idx = min(step - 1, len(lr_table["encoder"]) - 1)
                        logger.log(
                            {"train_loss": metrics["loss"],
                             **{f"Train/train_{k}": metrics[k]
                                for k in ("d1", "abs_rel", "rmse", "l1")},
                             # distillation term, when a teacher is set
                             **{f"Train/train_{k}": metrics[k]
                                for k in ("distill",) if k in metrics},
                             "lr/encoder": float(lr_table["encoder"][lr_idx]),
                             "lr/decoder": float(lr_table["decoder"][lr_idx]),
                             "epoch": epoch}, step=step)

                if step % val_every == 0 or (max_steps and step >= max_steps):
                    val_metrics = evaluate_depth(
                        task, state.params, datamodule.val_loader(), pre,
                        max_depths=max_depths)
                    logger.log({"val_loss": val_metrics["loss"],
                                **{f"Val/val_{k}": v
                                   for k, v in val_metrics.items()
                                   if k != "loss"}},
                               step=step, force_stdout=True)
                    # Stopper first so its post-update state rides the
                    # checkpoint: resume restores the patience counter too.
                    should_stop = stopper.update(float(val_metrics["loss"]))
                    ckpt.save(step, state,
                              {"val_loss": float(val_metrics["loss"]),
                               "es_best": float(stopper.best),
                               "es_bad_count": float(stopper.bad_count)})
                    if should_stop:
                        print(f"[early-stop] val_loss plateaued "
                              f"(best {stopper.best:.5f})")
                        stop = True
                        break
                if _preempt_agreed(guard, host_sync=boundary):
                    _handle_preemption(ckpt, step, state, stopper)
                    stop = True
                    break
                if max_steps and step >= max_steps:
                    stop = True
                    break
            summary = timer.summary()
            print(f"[epoch {epoch}] {time.time() - t_epoch:.1f}s "
                  f"({summary.get('steps_per_s', 0):.2f} steps/s)")
            if float(bank["loss"].count) > 0:
                epoch_means = MetricBank.compute(bank)
                logger.log({f"Train/epoch_{k}": float(v)
                            for k, v in epoch_means.items()},
                           step=int(state.step))
            if summary:
                logger.log({f"perf/{k}": v for k, v in summary.items()},
                           step=int(state.step))
    ckpt.close()
    return state


def evaluate_depth(task: DepthTask, params, loader, pre: DevicePreprocessor,
                   max_depths=None) -> dict[str, float]:
    """Mean metrics over a loader.

    Two weighting conventions coexist here ON PURPOSE, each matching the
    reference path it mirrors:

    - overall metrics weight each BATCH equally — torchmetrics MeanMetric
      updated once per batch (``lightning_model.py:145-152``), so a
      smaller final val batch counts the same as a full one;
    - per-source ``SimCol/``/``C3VD/`` metrics are SAMPLE-weighted (by
      each batch's per-source count) with C3VD l1/rmse rescaled to mm —
      ``lightning_model_combined.py:199-217,372-391`` updates the
      per-source collections only with that source's samples.
    """
    sums: dict[str, float] = {}
    count = 0
    src_sums: dict[str, float] = {}
    src_weight: dict[str, float] = {}
    for batch in loader:
        replicated = bool(batch.pop("_replicated", False))
        batch = meshlib.shard_batch(task.mesh, batch,
                                    force_replicated=replicated)
        prepped = pre(batch, train=False, max_depths=max_depths)
        if "source" in prepped:
            # One forward yields overall + per-source metrics.
            per_src = task.eval_step_combined(params, prepped)
            for k in ("loss", "d1", "abs_rel", "rmse", "l1"):
                sums[k] = sums.get(k, 0.0) + float(per_src[k])
            for name in ("SimCol", "C3VD"):
                n = float(per_src[f"{name}/count"])
                for metric in ("l1", "rmse", "abs_rel", "d1"):
                    key = f"{name}/{metric}"
                    src_sums[key] = src_sums.get(key, 0.0) \
                        + float(per_src[key]) * n
                    src_weight[key] = src_weight.get(key, 0.0) + n
        else:
            metrics = task.eval_step(params, prepped)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        count += 1
    out = {k: v / max(count, 1) for k, v in sums.items()}
    out.update({k: v / max(src_weight[k], 1e-12)
                for k, v in src_sums.items()})
    return out


def _accumulate_pose_val(sums: dict, counts: dict, metrics: dict,
                         batch_size: int) -> None:
    """Batch-mean accumulation for pose validation metrics.

    RTE is a mean over consecutive-frame deltas (``jnp.diff``), so on a
    1-sample batch — e.g. a trailing val batch — it is mean-of-empty =
    NaN by construction, which would poison the epoch mean. That batch
    contributes nothing to ``rte`` (undefined, not zero). Genuine NaNs
    (a diverged model on a batch with >= 2 samples) still propagate.
    """
    for k, v in metrics.items():
        if k == "rte" and batch_size < 2:
            continue
        sums[k] = sums.get(k, 0.0) + float(v)
        counts[k] = counts.get(k, 0) + 1


def fit_pose(
    task,
    datamodule,
    max_epochs: int,
    log_dir: str,
    ckpt_dir: str,
    patience: int = 20,
    logger: MetricLogger | None = None,
    seed: int = 42,
    max_steps: int | None = None,
    resume: bool = False,
    log_every: int = 1,
):
    """Train the pose regressor; returns the final state.

    Validation runs once per epoch (reference pose config has no
    val_check_interval); epoch end also evaluates the buffered full
    trajectory (``pose_estimation_model.py:241-293``).
    """
    from .pose_task import PoseTask

    assert isinstance(task, PoseTask)
    if getattr(datamodule, "train_dataset", None) is None:
        datamodule.setup("fit")  # no-op if the CLI already set up
    logger = logger or MetricLogger(log_dir)
    ckpt = CheckpointManager(ckpt_dir, max_to_keep=1)
    stopper = EarlyStopping(patience=patience)

    size = datamodule.size
    state = task.init_state(jax.random.PRNGKey(seed), (size, size))
    if resume:
        restored = ckpt.restore_latest(state)
        if restored is not None:
            state = jax.device_put(restored)
            _restore_stopper(stopper, ckpt)
            print(f"[fit_pose] resumed from step {int(state.step)}")
    lr_table = task.lr_table()
    host_step = int(state.step)
    log_every = max(1, log_every)

    pose_keys = ("loss", "ate", "rte", "rote")
    bank_update = jax.jit(MetricBank.update)

    # One loader for the whole fit: PrefetchLoader reshuffles per epoch
    # via its internal epoch counter — recreating it each epoch would
    # reset that counter and train every epoch on the SAME permutation
    # (fit_depth builds its loader once for the same reason).
    train_loader = datamodule.train_loader()

    stop = False
    with PreemptionGuard() as guard:
        for epoch in range(max_epochs):
            if stop:
                break
            bank = MetricBank.zeros(pose_keys)
            for batch in train_loader:
                jbatch = meshlib.shard_batch(
                    task.mesh,
                    {"input": batch["input"], "target": batch["target"]},
                    force_replicated=bool(batch.pop("_replicated", False)))
                state, metrics = task.train_step(state, jbatch)
                bank = bank_update(bank, metrics)
                step = host_step = host_step + 1
                boundary = bool(step % log_every == 0
                                or (max_steps and step >= max_steps))
                if boundary:
                    # Host sync only at logging boundaries (pipelined between).
                    logger.log({"train_loss": metrics["loss"],
                                **{f"Train/train_{k}": metrics[k]
                                   for k in ("ate", "rte", "rote")},
                                "lr": float(lr_table[min(step - 1,
                                                         len(lr_table) - 1)]),
                                "epoch": epoch}, step=step)
                if _preempt_agreed(guard, host_sync=boundary):
                    _handle_preemption(ckpt, step, state, stopper)
                    stop = True
                    break
                if max_steps and step >= max_steps:
                    stop = True
                    break
            if _preempt_agreed(guard):
                break  # already checkpointed; skip epoch-end validation

            # epoch-end validation + full-trajectory metrics
            val_sums: dict[str, float] = {}
            val_counts: dict[str, int] = {}
            preds, gts = [], []
            for batch in datamodule.val_loader():
                jbatch = {"input": jnp.asarray(batch["input"]),
                          "target": jnp.asarray(batch["target"])}
                metrics, pred = task.eval_step(state, jbatch)
                preds.append(np.asarray(pred))
                gts.append(np.asarray(batch["target"]))
                _accumulate_pose_val(val_sums, val_counts, metrics,
                                     int(jbatch["target"].shape[0]))
            val = {k: v / max(val_counts.get(k, 0), 1)
                   for k, v in val_sums.items()}
            if preds:
                traj = task.trajectory_metrics(
                    jnp.asarray(np.concatenate(preds)),
                    jnp.asarray(np.concatenate(gts)))
                val.update({f"traj_{k}": float(v) for k, v in traj.items()})
            step = int(state.step)
            logger.log({"val_loss": val.get("loss", float("nan")),
                        **{f"Val/val_{k}": v for k, v in val.items()
                           if k != "loss"}}, step=step, force_stdout=True)
            should_stop = stopper.update(float(val.get("loss", 1e9)))
            ckpt.save(step, state, {"val_loss": float(val.get("loss", 1e9)),
                                    "es_best": float(stopper.best),
                                    "es_bad_count": float(stopper.bad_count)})
            if should_stop:
                print(f"[early-stop] val_loss plateaued (best {stopper.best:.5f})")
                break
    ckpt.close()
    return state
