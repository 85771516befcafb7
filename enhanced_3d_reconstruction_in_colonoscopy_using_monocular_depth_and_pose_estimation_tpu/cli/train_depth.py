"""Depth fine-tuning CLI — the reference's ``main_lightning.py``.

Usage (same override style):
    python -m ...cli.train_depth dataset=simcol model=large \
        dataset.batch_size=6 trainer.max_epochs=30 model.pct_start=0.05

Flow parity with ``/root/reference/main_lightning.py:51-145``: seed 42,
datamodule by ``dataset.ds_type``, per-dataset max_depth resolution,
experiment-id run dir + config snapshot, checkpoint-on-val_loss +
early-stopping(20) + per-step LR logging, then fit.
"""

from __future__ import annotations

import os
import sys



def build_datamodule(dataset_cfg: dict):
    from ..data import (C3VDDataModule, CombinedDataModule, PoseDataModule,
                        SimColDataModule)

    ds_type = dataset_cfg["ds_type"]
    if ds_type == "simcol":
        return SimColDataModule(**dataset_cfg)
    if ds_type == "c3vd":
        return C3VDDataModule(**dataset_cfg)
    if ds_type == "combined":
        return CombinedDataModule(**dataset_cfg)
    if ds_type == "pose":
        return PoseDataModule(**dataset_cfg)
    raise ValueError(f"unknown ds_type: {ds_type}")


def resolve_max_depth(cfg) -> float:
    """main_lightning.py:68-78: per-dataset max depth."""
    ds = cfg.dataset.ds_type
    if ds == "simcol":
        return float(cfg.model.simcol_max_depth)
    if ds == "c3vd":
        return float(cfg.model.c3vd_max_depth)
    if ds == "combined":
        return float(cfg.model.simcol_max_depth)
    raise ValueError(ds)


def main(argv: list[str] | None = None) -> None:
    import contextlib

    from ..core import config as cfglib
    from ..core.debug import nan_checks, profile_trace
    from ..core.dtypes import policy_from_precision
    from ..core.logging import MetricLogger
    from ..models.convert import convert_dav2, load_torch_state_dict
    from ..parallel import mesh as meshlib
    from ..train.depth_task import DepthTask
    from ..train.loop import fit_depth
    from ..utils.experiment import experiment_id

    argv = sys.argv[1:] if argv is None else argv
    config_root = os.environ.get("E3D_CONFIG_ROOT", "configs")
    cfg = cfglib.compose(config_root, "default", argv)

    # Multi-host bring-up (no-op single process; reference exposes only
    # trainer.devices, main_lightning.py:134-139).
    if (bool(cfg.trainer.get("distributed", False))
            or "JAX_COORDINATOR_ADDRESS" in os.environ):
        meshlib.init_distributed()

    # Mesh shape / tensor parallelism are config knobs (the reference's
    # only device knob is trainer.devices, configs/trainer/default.yaml:1;
    # here the ('data','model') mesh is first-class).
    mesh = meshlib.build_mesh(meshlib.MeshSpec(
        data=int(cfg.trainer.get("mesh_data", -1)),
        model=int(cfg.trainer.get("mesh_model", 1))))
    tensor_parallel = bool(cfg.trainer.get("tensor_parallel", False))
    seq_parallel = bool(cfg.trainer.get("seq_parallel", False))
    fsdp = bool(cfg.trainer.get("fsdp", False))

    run_dir = cfglib.run_dir(cfg, cfg.run_dir_template)
    cfglib.snapshot(cfg, os.path.join(run_dir, ".hydra"))

    exp_id = experiment_id(
        cfg.model.encoder, cfg.model.encoder_lr, cfg.model.decoder_lr,
        cfg.dataset.batch_size, cfg.trainer.max_epochs, cfg.dataset.ds_type,
        cfg.model.pct_start)
    print(f"[train_depth] experiment: {exp_id}")
    print(f"[train_depth] run dir: {run_dir}")

    datamodule = build_datamodule(dict(cfg.dataset))
    datamodule.setup("fit")

    accum = int(cfg.trainer.get("accumulate_grad_batches", 1))
    steps_per_epoch = max(1, -(-len(datamodule.train_loader()) // accum))
    total_steps = steps_per_epoch * int(cfg.trainer.max_epochs)

    max_depth = resolve_max_depth(cfg)
    combined = cfg.dataset.ds_type == "combined"
    max_depths = ((float(cfg.model.simcol_max_depth),
                   float(cfg.model.c3vd_max_depth) / 10.0)
                  if combined else None)

    task = DepthTask(
        encoder=cfg.model.encoder,
        min_depth=float(cfg.model.min_depth),
        max_depth=max_depth,
        encoder_lr=float(cfg.model.encoder_lr),
        decoder_lr=float(cfg.model.decoder_lr),
        pct_start=float(cfg.model.pct_start),
        div_factor=float(cfg.model.div_factor),
        total_steps=total_steps,
        grad_accum=accum,
        clip_norm=float(cfg.trainer.gradient_clip_val),
        policy=policy_from_precision(str(cfg.trainer.precision)),
        grad_checkpoint=bool(cfg.model.get("use_checkpoint", True)),
        device_mesh=mesh,
        tensor_parallel=tensor_parallel,
        seq_parallel=seq_parallel,
        fsdp=fsdp,
        fsdp_min_size=(int(cfg.trainer.get("fsdp_min_size"))
                       if cfg.trainer.get("fsdp_min_size") is not None
                       else None),
        pipeline_parallel=int(cfg.trainer.get("pipeline_parallel", 0)),
        pipe_microbatches=int(cfg.trainer.get("pipe_microbatches", 0)),
        pipe_virtual=int(cfg.trainer.get("pipe_virtual", 1)),
        distill_encoder=(str(cfg.trainer.get("distill_encoder", "vitl"))
                         if cfg.trainer.get("distill_from") else None),
        distill_weight=float(cfg.trainer.get("distill_weight", 1.0)),
    )

    # Knowledge distillation (TPU-native extension): freeze a trained
    # teacher (its own checkpoint, usually a vitl fine-tune) and add a
    # SiLog term toward its predictions to the student's step.
    distill_from = cfg.trainer.get("distill_from")
    if distill_from:
        from ..models.convert import load_or_init_depth_params

        enc_t = str(cfg.trainer.get("distill_encoder", "vitl"))
        print(f"[train_depth] distilling from {enc_t} teacher "
              f"({distill_from}, weight "
              f"{float(cfg.trainer.get('distill_weight', 1.0))})")
        _, teacher_params = load_or_init_depth_params(
            enc_t, max_depth, str(distill_from))
        task.set_teacher(teacher_params)

    # Encoder bootstrap from the DAv2 metric checkpoint, when present
    # (lightning_model.py:113-140).
    pretrained = None
    ckpt_path = cfg.model.get(
        "pretrained_from",
        f"./base_checkpoints/depth_anything_v2_metric_hypersim_"
        f"{cfg.model.encoder}.pth")
    if os.path.exists(ckpt_path):
        print(f"[train_depth] loading encoder weights from {ckpt_path}")
        pretrained = convert_dav2(load_torch_state_dict(ckpt_path),
                                  cfg.model.encoder, encoder_only=True)
    else:
        print(f"[train_depth] no pretrained checkpoint at {ckpt_path}; "
              f"training from random init")

    logger = MetricLogger(
        run_dir, project=f"depth-any-endoscopy-{cfg.dataset.ds_type}",
        run_name=exp_id,
        stdout_every=int(cfg.trainer.get("log_every_n_steps", 100)))

    ckpt_dir = os.path.join("checkpoints", cfg.dataset.ds_type, exp_id)
    stack = contextlib.ExitStack()
    if bool(cfg.trainer.get("profile", False)):
        trace_dir = os.path.join(run_dir, "trace")
        print(f"[train_depth] profiling to {trace_dir}")
        stack.enter_context(profile_trace(trace_dir))
    if bool(cfg.trainer.get("debug_nans", False)):
        stack.enter_context(nan_checks(True))
    with stack:
        _run_fit(task, datamodule, cfg, run_dir, ckpt_dir, logger,
                 max_depths, pretrained)
    logger.close()


def _run_fit(task, datamodule, cfg, run_dir, ckpt_dir, logger, max_depths,
             pretrained) -> None:
    from ..train.loop import fit_depth

    fit_depth(
        task, datamodule,
        max_epochs=int(cfg.trainer.max_epochs),
        log_dir=run_dir,
        ckpt_dir=ckpt_dir,
        val_check_interval=float(cfg.trainer.get("val_check_interval", 0.5)),
        patience=int(cfg.trainer.get("early_stop_patience", 20)),
        logger=logger,
        max_depths=max_depths,
        pretrained_params=pretrained,
        max_steps=(int(cfg.trainer.max_steps)
                   if "max_steps" in cfg.trainer else None),
        log_every=int(cfg.trainer.get("log_every_n_steps", 1)),
        resume=bool(cfg.trainer.get("resume", False)),
    )


if __name__ == "__main__":
    main()
