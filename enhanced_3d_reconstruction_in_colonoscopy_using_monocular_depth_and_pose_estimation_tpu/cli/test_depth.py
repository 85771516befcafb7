"""Depth evaluation CLI — the reference's ``test_lightning.py``.

Usage:
    CHECKPOINT_PATH=<ckpt> python -m ...cli.test_depth dataset=simcol model=large

Parity with ``/root/reference/test_lightning.py:136-303``:
- checkpoint from the ``CHECKPOINT_PATH`` env var (torch ``.ckpt``/``.pth``
  via the weight converter, or an Orbax checkpoint directory);
- per-procedure metric collection for SimCol (procedure parsed from the
  ``SyntheticColon_*/Frames_*`` path, ``test_lightning.py:47-111``) with
  mean/std aggregation, plus overall metrics;
- JSON results written to ``test_lightning_results/``.

Divergence (documented): per-sample metrics are true per-sample values, not
the reference's batch-mean-appended-per-sample artifact.
"""

from __future__ import annotations

import json
import os
import re
import sys

import numpy as np

METRIC_KEYS = ("d1", "abs_rel", "rmse", "l1")


def parse_procedure(dataset_field: str) -> str:
    """SyntheticColon_I/Frames_S1 -> 'SyntheticColon_I/S1' style key
    (test_lightning.py:156-174 semantics)."""
    m = re.search(r"(SyntheticColon_(?:I{1,3}))", dataset_field)
    colon = m.group(1) if m else dataset_field.split("/")[0]
    m2 = re.search(r"Frames_([SBO]\d+)", dataset_field)
    frame = m2.group(1) if m2 else dataset_field.split("/")[-1]
    return f"{colon}/{frame}"


def load_params(checkpoint_path: str, encoder: str, task, size: int = 518):
    """torch .ckpt/.pth (converted) or an Orbax checkpoint dir."""
    from ..models.convert import convert_dav2, load_torch_state_dict

    if os.path.isdir(checkpoint_path):
        import jax

        from ..core.checkpoint import CheckpointManager

        mgr = CheckpointManager(checkpoint_path)
        template = task.init_state(jax.random.PRNGKey(0), (size, size))
        # Reference test semantics evaluate the BEST-val checkpoint
        # (ModelCheckpoint(save_top_k=1) + test flow,
        # /root/reference/main_lightning.py:109-115); fall back to latest
        # for checkpoints saved without metrics.
        state = mgr.restore_best(template)
        if state is None:
            state = mgr.restore_latest(template)
        if state is None:
            raise FileNotFoundError(f"no checkpoints in {checkpoint_path}")
        return state.params
    state_dict = load_torch_state_dict(checkpoint_path)
    return convert_dav2(state_dict, encoder)


def main(argv: list[str] | None = None) -> None:
    import jax

    from ..core import config as cfglib
    from ..core.dtypes import policy_from_precision
    from ..data.preprocess import DevicePreprocessor
    from ..parallel import mesh as meshlib
    from ..train.depth_task import DepthTask
    from .train_depth import build_datamodule, resolve_max_depth

    argv = sys.argv[1:] if argv is None else argv
    config_root = os.environ.get("E3D_CONFIG_ROOT", "configs")
    cfg = cfglib.compose(config_root, "test_config", argv)

    checkpoint_path = os.environ.get("CHECKPOINT_PATH")
    if not checkpoint_path:
        raise SystemExit("CHECKPOINT_PATH env var is required "
                         "(test_lightning.py:150-152)")

    datamodule = build_datamodule(dict(cfg.dataset))
    datamodule.setup("test")

    max_depth = resolve_max_depth(cfg)
    combined = cfg.dataset.ds_type == "combined"
    max_depths = ((float(cfg.model.simcol_max_depth),
                   float(cfg.model.c3vd_max_depth) / 10.0)
                  if combined else None)

    # Evaluation scales over the data axis like training: batches are
    # assembled as global arrays sharded over the mesh (reference runs
    # Trainer.test on the trainer's devices, test_lightning.py:227-238).
    if (bool(cfg.trainer.get("distributed", False))
            or "JAX_COORDINATOR_ADDRESS" in os.environ):
        meshlib.init_distributed()
    mesh = meshlib.build_mesh(meshlib.MeshSpec(
        data=int(cfg.trainer.get("mesh_data", -1)),
        model=int(cfg.trainer.get("mesh_model", 1))))
    tensor_parallel = bool(cfg.trainer.get("tensor_parallel", False))
    seq_parallel = bool(cfg.trainer.get("seq_parallel", False))

    task = DepthTask(
        encoder=cfg.model.encoder,
        min_depth=float(cfg.model.min_depth),
        max_depth=max_depth,
        policy=policy_from_precision(str(cfg.trainer.precision)),
        grad_checkpoint=False,
        device_mesh=mesh,
        tensor_parallel=tensor_parallel,
        seq_parallel=seq_parallel,
        token_merge=float(cfg.model.get("token_merge", 0.0)),
        quant_int8=bool(cfg.model.get("quant_int8", False)),
        pipeline_parallel=int(cfg.trainer.get("pipeline_parallel", 0)),
        pipe_microbatches=int(cfg.trainer.get("pipe_microbatches", 0)),
        pipe_virtual=int(cfg.trainer.get("pipe_virtual", 1)),
    )
    params = load_params(checkpoint_path, cfg.model.encoder, task,
                         size=int(cfg.dataset.size))
    params = jax.device_put(
        params, meshlib.param_shardings(mesh, params, tensor_parallel))

    pre = DevicePreprocessor(size=datamodule.size)
    per_proc: dict[str, dict[str, list[float]]] = {}
    overall: dict[str, list[float]] = {k: [] for k in METRIC_KEYS}
    src_names = {0: "SimCol", 1: "C3VD"}
    per_source: dict[str, dict[str, list[float]]] = {
        name: {k: [] for k in METRIC_KEYS} for name in src_names.values()
    } if combined else {}

    for batch in datamodule.test_loader():
        replicated = bool(batch.pop("_replicated", False))
        jbatch = meshlib.shard_batch(mesh, batch,
                                     force_replicated=replicated)
        prepped = pre(jbatch, train=False, max_depths=max_depths)
        sample_metrics = task.eval_step_per_sample(params, prepped)
        # Exactly-once row coverage across processes: gather the tiny
        # (B,) metric vectors to every host (sharding-agnostic), then
        # slice this process's deterministic global row range — the
        # loader's contiguous partition for loader-sharded batches, an
        # even contiguous split for a replicated trailing batch (where
        # every process decoded ALL rows and holds full metadata).
        sample_metrics = {k: meshlib.gather_rows(v)
                          for k, v in sample_metrics.items()}
        nb = len(next(iter(sample_metrics.values())))
        pid, pc = jax.process_index(), jax.process_count()
        meta = list(batch["dataset"])
        sources = (np.asarray(batch["source"]).astype(int)
                   if combined and "source" in batch else None)
        if pc > 1:
            if replicated:
                lo, hi = pid * nb // pc, (pid + 1) * nb // pc
                meta = meta[lo:hi]
                if sources is not None:
                    sources = sources[lo:hi]
            else:  # loader gave this process rows [lo, hi) of the batch
                lo = pid * (nb // pc)
                hi = lo + len(meta)
            sample_metrics = {k: v[lo:hi]
                              for k, v in sample_metrics.items()}
        for i, ds_field in enumerate(meta):
            proc = parse_procedure(str(ds_field))
            bucket = per_proc.setdefault(
                proc, {k: [] for k in METRIC_KEYS})
            # C3VD trains in the /10 cm convention; report l1/rmse back
            # in mm (lightning_model_combined.py:372-391).
            mm = 10.0 if sources is not None and sources[i] == 1 else 1.0
            for k in METRIC_KEYS:
                val = float(sample_metrics[k][i])
                if k in ("l1", "rmse"):
                    val *= mm
                bucket[k].append(val)
                overall[k].append(val)
                if sources is not None:
                    per_source[src_names[sources[i]]][k].append(val)

    # Reference aggregation (test_lightning.py:240-283): per-procedure
    # means first, then overall = mean/std ACROSS PROCEDURES — this is how
    # the recorded simcol_results_{bs,ft}.json numbers are defined.
    proc_means = {
        proc: {k: float(np.mean(v)) for k, v in buckets.items()}
        for proc, buckets in sorted(per_proc.items())
    }
    results = {
        "procedure_metrics": {
            proc: {k: {"mean": float(np.mean(v)), "std": float(np.std(v))}
                   for k, v in buckets.items()}
            for proc, buckets in sorted(per_proc.items())
        },
        "overall_metrics": {
            k: {"mean": float(np.mean([m[k] for m in proc_means.values()])),
                "std": float(np.std([m[k] for m in proc_means.values()]))}
            for k in METRIC_KEYS
        },
        "overall_metrics_per_sample": {
            k: {"mean": float(np.mean(v)), "std": float(np.std(v))}
            for k, v in overall.items()
        },
        "checkpoint": checkpoint_path,
        "encoder": cfg.model.encoder,
        "ds_type": cfg.dataset.ds_type,
    }
    if combined:
        results["source_metrics"] = {
            name: {
                "count": len(next(iter(buckets.values()))),
                **{k: {"mean": float(np.mean(v)) if v else float("nan"),
                       "std": float(np.std(v)) if v else float("nan")}
                   for k, v in buckets.items()},
            }
            for name, buckets in per_source.items()
        }

    print("\n== per-procedure metrics ==")
    for proc, means in proc_means.items():
        line = " ".join(f"{k}={v:.6f}" for k, v in means.items())
        print(f"  {proc}: {line}")
    print("== overall (across procedures, reference convention) ==")
    for k, v in results["overall_metrics"].items():
        print(f"  {k}: {v['mean']:.6f} +- {v['std']:.6f}")

    out_dir = os.environ.get("E3D_RESULTS_DIR", "test_lightning_results")
    os.makedirs(out_dir, exist_ok=True)
    # Multi-process runs: each process covered its own rows; write
    # per-process shards (merge offline) instead of overwriting.
    suffix = (f"_p{jax.process_index()}" if jax.process_count() > 1
              else "")
    out_path = os.path.join(out_dir,
                            f"{cfg.dataset.ds_type}_results{suffix}.json")
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(results, f, indent=2)
    print(f"[test_depth] wrote {out_path}")


if __name__ == "__main__":
    main()
