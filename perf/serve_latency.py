"""Serving-engine end-to-end latency quantiles on the real v5e.

The engine records submit->result latency (the SLO number) in a
reservoir (serving/engine.py _Stats). This drives the vitl-518 engine
with a paced open-loop arrival stream just under single-chip capacity
(~78 fps at batch 8) and prints the measured quantiles — the
"production serving" evidence the latency stats feature exists for.

Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/serve_latency.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RATE_FPS = float(os.environ.get("E3D_SERVE_RATE", "60"))
N_FRAMES = int(os.environ.get("E3D_SERVE_FRAMES", "240"))
BS = int(os.environ.get("E3D_SERVE_BS", "8"))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.core.debug import (  # noqa: E501
        enable_compilation_cache,
    )

    enable_compilation_cache()
    from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.models import (  # noqa: E501
        build_depth_model,
    )
    from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.serving import (  # noqa: E501
        DepthServingEngine,
    )

    print(f"backend={jax.default_backend()}", flush=True)
    model = build_depth_model("vitl", max_depth=20.0, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, 518, 518, 3)))["params"],
        jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype),
                          shapes)
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (518, 518, 3), dtype=np.uint8)
              for _ in range(16)]

    with DepthServingEngine(model, params, input_size=518,
                            batch_size=BS, max_delay_s=0.05) as engine:
        # warm the compiled program (excluded from the measured stream)
        warm = engine.submit_many(frames[:BS])
        t0 = time.time()
        [f.result(timeout=1800) for f in warm]
        print(f"warmup batch: {time.time()-t0:.1f}s", flush=True)
        engine.reset_stats()  # exclude the compile from the SLO window

        period = 1.0 / RATE_FPS
        futs = []
        t_start = time.time()
        for i in range(N_FRAMES):
            target = t_start + i * period
            now = time.time()
            if target > now:
                time.sleep(target - now)
            futs.append(engine.submit(frames[i % len(frames)]))
        [f.result(timeout=1800) for f in futs]
        wall = time.time() - t_start
        stats = engine.stats()
    done = N_FRAMES
    print(f"stream: {done} frames at {RATE_FPS:.0f} fps arrival, "
          f"served in {wall:.1f}s ({done/wall:.1f} fps)", flush=True)
    print("RESULT "
          f"p50={stats.get('latency_p50_ms', 0):.0f}ms "
          f"p95={stats.get('latency_p95_ms', 0):.0f}ms "
          f"p99={stats.get('latency_p99_ms', 0):.0f}ms "
          f"max={stats.get('latency_max_ms', 0):.0f}ms "
          f"mean_fill={stats['mean_batch_fill']:.1f}", flush=True)


if __name__ == "__main__":
    main()
