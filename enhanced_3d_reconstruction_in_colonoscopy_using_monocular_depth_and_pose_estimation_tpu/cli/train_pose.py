"""Pose-estimation training CLI — the reference's
``pose_estimation_lightning.py``.

Usage:
    python -m ...cli.train_pose model.lr=1e-4 trainer.max_epochs=30

Parity with ``/root/reference/pose_estimation_lightning.py:183-339``:
trains PoseEstimationModule on SimCol pairs, then tests with a
per-procedure ATE/RTE/ROTE trajectory collector (procedure parsed like
``:156-174``) and dumps per-procedure + overall stats to JSON.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def main(argv: list[str] | None = None) -> None:
    import jax.numpy as jnp

    from ..core import config as cfglib
    from ..core.dtypes import policy_from_precision
    from ..core.logging import MetricLogger
    from ..data import PoseDataModule
    from ..parallel import mesh as meshlib
    from ..train.loop import fit_pose
    from ..train.pose_task import PoseTask
    from ..utils.experiment import pose_experiment_id
    from .test_depth import parse_procedure

    argv = sys.argv[1:] if argv is None else argv
    config_root = os.environ.get("E3D_CONFIG_ROOT", "configs")
    cfg = cfglib.compose(config_root, "pose_estimation/pose_estimation", argv)

    run_dir = cfglib.run_dir(cfg, cfg.run_dir_template)
    cfglib.snapshot(cfg, os.path.join(run_dir, ".hydra"))
    exp_id = pose_experiment_id(cfg.model.lr, cfg.dataset.batch_size,
                                cfg.trainer.max_epochs)
    print(f"[train_pose] experiment: {exp_id}; run dir: {run_dir}")

    datamodule = PoseDataModule(**dict(cfg.dataset))
    datamodule.setup()

    steps_per_epoch = max(1, len(datamodule.train_loader()))
    total_steps = steps_per_epoch * int(cfg.trainer.max_epochs)

    if (bool(cfg.trainer.get("distributed", False))
            or "JAX_COORDINATOR_ADDRESS" in os.environ):
        meshlib.init_distributed()
    mesh = meshlib.build_mesh(meshlib.MeshSpec(
        data=int(cfg.trainer.get("mesh_data", -1)),
        model=int(cfg.trainer.get("mesh_model", 1))))

    task = PoseTask(
        in_channels=int(cfg.model.in_channels),
        lr=float(cfg.model.lr),
        weight_decay=float(cfg.model.weight_decay),
        pct_start=float(cfg.model.pct_start),
        div_factor=float(cfg.model.div_factor),
        beta=float(cfg.model.beta),
        total_steps=total_steps,
        clip_norm=float(cfg.trainer.gradient_clip_val),
        device_mesh=mesh,
        policy=policy_from_precision(str(cfg.trainer.precision)),
        cycle_momentum=bool(cfg.model.get("cycle_momentum", False)),
    )

    logger = MetricLogger(run_dir, project="pose-estimation",
                          run_name=exp_id,
                          stdout_every=int(cfg.trainer.get(
                              "log_every_n_steps", 100)))
    ckpt_dir = os.path.join("checkpoints", "pose_estimation", exp_id)
    state = fit_pose(
        task, datamodule,
        max_epochs=int(cfg.trainer.max_epochs),
        log_dir=run_dir, ckpt_dir=ckpt_dir,
        patience=int(cfg.trainer.get("early_stop_patience", 20)),
        logger=logger,
        max_steps=(int(cfg.trainer.max_steps)
                   if "max_steps" in cfg.trainer else None),
        log_every=int(cfg.trainer.get("log_every_n_steps", 1)),
        resume=bool(cfg.trainer.get("resume", False)),
    )

    # ---- test with per-procedure trajectory metrics ----
    per_proc: dict[str, dict[str, list[np.ndarray]]] = {}
    for batch in datamodule.test_loader():
        jbatch = {"input": jnp.asarray(batch["input"]),
                  "target": jnp.asarray(batch["target"])}
        _, pred = task.eval_step(state, jbatch)
        pred = np.asarray(pred)
        for i, ds_field in enumerate(batch["dataset"]):
            proc = parse_procedure(str(ds_field))
            bucket = per_proc.setdefault(proc, {"pred": [], "gt": []})
            bucket["pred"].append(pred[i])
            bucket["gt"].append(np.asarray(batch["target"][i]))

    proc_results = {}
    for proc, bucket in sorted(per_proc.items()):
        pred = np.stack(bucket["pred"])
        gt = np.stack(bucket["gt"])
        metrics = task.trajectory_metrics(jnp.asarray(pred), jnp.asarray(gt))
        proc_results[proc] = {k: float(v) for k, v in metrics.items()}
        print(f"  {proc}: " + " ".join(
            f"{k}={float(v):.6f}" for k, v in metrics.items()))

    # Overall = mean over PER-PROCEDURE trajectories (the reference's
    # aggregation convention): composing the concatenated sequences as
    # one continuous trajectory would treat each procedure seam as real
    # motion and compound drift across unrelated recordings.
    overall = {}
    if proc_results:
        keys = next(iter(proc_results.values())).keys()
        overall = {k: float(np.mean([m[k] for m in proc_results.values()]))
                   for k in keys}
    print("== overall trajectory (mean over procedures) ==")
    for k, v in overall.items():
        print(f"  {k}: {v:.6f}")

    out_dir = os.environ.get("E3D_RESULTS_DIR", "test_lightning_results")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, "pose_results.json")
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump({"procedure_metrics": proc_results,
                   "overall_metrics": overall,
                   "experiment": exp_id}, f, indent=2)
    print(f"[train_pose] wrote {out_path}")
    logger.close()


if __name__ == "__main__":
    main()
