"""Worker for the real 2-process multi-host training test.

Run as: python -m tests._mp_worker <pid> <nprocs> <port> <fixture> <out.json>
        [mode]

Each process gets 4 virtual CPU devices (8 global at nprocs=2; 8 local at
nprocs=1), joins a jax.distributed gloo cluster, and runs 2 real
``fit_depth`` steps on the shared SimCol fixture — the SAME code path as
production (process-sharded PrefetchLoader -> shard_batch global arrays
-> jitted train_step). Writes its final eval loss to out.json; the parent
asserts 1-process and 2-process runs agree.

``mode=preempt``: rank 0 SIGTERMs ITSELF from a timer thread mid-fit; the
cross-process preemption agreement (train/loop._preempt_agreed) must stop
BOTH ranks at the same step and complete one coordinated latest/ save
without deadlocking the collective.
"""

import json
import os
import sys


def main() -> None:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    fixture, out_path = sys.argv[4], sys.argv[5]
    mode = sys.argv[6] if len(sys.argv) > 6 else "train"
    per_proc = 8 // nprocs
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={per_proc}")

    import jax

    jax.config.update("jax_platforms", "cpu")
    if nprocs > 1:
        # shutdown_timeout matches the parent's per-worker budget: the
        # final per-process eval compiles can skew the two workers by
        # minutes on a loaded machine, and the default 300 s shutdown
        # barrier then kills the fast one (observed under a concurrent
        # bench + full-suite run).
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs, process_id=pid,
            shutdown_timeout_seconds=900)
    assert len(jax.devices()) == 8, jax.devices()

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import e3d_tpu  # noqa: F401
    from e3d_tpu.core.dtypes import POLICY_F32
    from e3d_tpu.data import SimColDataModule
    from e3d_tpu.data.preprocess import DevicePreprocessor
    from e3d_tpu.parallel import MeshSpec, build_mesh
    from e3d_tpu.parallel.mesh import shard_batch
    from e3d_tpu.train import DepthTask
    from e3d_tpu.train.loop import fit_depth

    dm = SimColDataModule(
        data_dir=fixture, train_list=f"{fixture}/train.txt",
        val_list=f"{fixture}/val.txt", test_list=f"{fixture}/test.txt",
        batch_size=4, num_workers=2, size=56, seed=7)
    task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=4,
                     grad_accum=2, policy=POLICY_F32,
                     grad_checkpoint=False,
                     device_mesh=build_mesh(MeshSpec(data=8, model=1)))
    scratch = os.path.join(os.path.dirname(out_path), f"p{pid}")

    if mode == "preempt":
        import signal

        from e3d_tpu.core.checkpoint import CheckpointManager

        class FiringDM:
            """Delegating datamodule whose train loader SIGTERMs this
            process (rank 0 only) while yielding batch 2 — so step 2
            trains, then the step-boundary agreement must stop BOTH
            ranks and run one coordinated latest/ save."""

            def __init__(self, inner, fire):
                self._inner = inner
                self._fire = fire

            def __getattr__(self, k):
                return getattr(self._inner, k)

            def train_loader(self):
                inner = self._inner.train_loader()
                fire = self._fire

                class L:
                    def __len__(self):
                        return len(inner)

                    def __iter__(self):
                        for i, b in enumerate(inner):
                            if fire and i == 2:
                                os.kill(os.getpid(), signal.SIGTERM)
                            yield b

                return L()

        ckpt_dir = os.path.join(os.path.dirname(out_path),
                                f"ckpt_pre_n{nprocs}")
        state = fit_depth(
            task, FiringDM(dm, fire=(pid == 0)), max_epochs=3,
            log_dir=os.path.join(scratch, "logs"),
            ckpt_dir=ckpt_dir, val_check_interval=100.0,
            max_steps=6, seed=7)
        mgr = CheckpointManager(ckpt_dir)
        metrics = mgr.latest_metrics() or {}
        out = {"pid": pid, "nprocs": nprocs,
               "step": int(np.asarray(state.step)),
               "latest_step": mgr.latest_step(),
               "preempted": float(metrics.get("preempted", 0.0))}
        mgr.close()
        with open(out_path, "w", encoding="utf-8") as f:
            json.dump(out, f)
        print(f"[mp_worker {pid}/{nprocs} preempt] {out}", flush=True)
        return

    state = fit_depth(
        task, dm, max_epochs=1,
        log_dir=os.path.join(scratch, "logs"),
        # Checkpoint dir is SHARED across processes (multi-process Orbax
        # save coordinates through it; per-process dirs deadlock).
        ckpt_dir=os.path.join(os.path.dirname(out_path),
                              f"ckpt_n{nprocs}"),
        val_check_interval=100.0,
        max_steps=2, seed=7)

    # Deterministic probe: eval loss on the first val batch, replicated
    # (process_count=1 so every process reads the FULL batch).
    from e3d_tpu.data.loader import PrefetchLoader

    pre = DevicePreprocessor(size=56)
    dm.setup("fit")
    batch = next(iter(PrefetchLoader(dm.val_dataset, 4, num_threads=2,
                                     process_count=1)))
    jbatch = shard_batch(task.mesh, batch, force_replicated=True)
    metrics = task.eval_step(state.params, pre(jbatch, train=False))
    out = {"pid": pid, "nprocs": nprocs,
           "eval_loss": float(metrics["loss"]),
           "step": int(np.asarray(state.step))}

    # gather_rows in the REAL multi-process regime (test_depth's
    # per-sample collector path): the tiny (B,) metric vectors gather to
    # every host regardless of GSPMD's output sharding (round-3
    # self-review regression: local_rows on a replicated output raised /
    # duplicated coverage), and the consumer slices its own global row
    # range — validated here by checking the gathered values line up
    # with THIS process's locally-loaded sample rows.
    from e3d_tpu.parallel.mesh import gather_rows

    b2 = next(iter(PrefetchLoader(dm.val_dataset, 4, num_threads=2,
                                  process_index=pid,
                                  process_count=nprocs)))
    sm = task.eval_step_per_sample(
        state.params, pre(shard_batch(task.mesh, b2), train=False))
    l1 = gather_rows(sm["l1"])
    out["gathered_n"] = int(l1.shape[0])
    n_local = int(b2["image"].shape[0])
    lo = pid * (l1.shape[0] // nprocs)
    out["local_slice"] = [float(x) for x in l1[lo:lo + n_local]]
    sm_rep = task.eval_step_per_sample(
        state.params, pre(jbatch, train=False))
    out["replicated_gathered_n"] = int(gather_rows(sm_rep["l1"]).shape[0])
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(out, f)
    print(f"[mp_worker {pid}/{nprocs}] {out}", flush=True)


if __name__ == "__main__":
    main()
