"""Quantify the fixed per-invocation (tunnel sync) bias in fori_loop
microbenchmarks: same flash-attention forward at iters=30 vs 300.

If ms/iter drops at higher iters, the difference is dispatch/sync overhead
amortized differently — NOT kernel time. Motivated by the profiler trace
(perf/trace_attn): closed_call (the pallas kernel) averages 0.95 ms vs the
2.13 ms host-measured number."""
import os, sys, time, json
import jax, jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.ops.flash_attention import flash_attention

B, N, H, D = 8, 1370, 16, 64
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.bfloat16)

results = {}
for iters in (30, 300):
    def many(q, k, v, iters=iters):
        def body(_, acc):
            o = flash_attention(q + (acc * 1e-9).astype(q.dtype), k, v)
            return jnp.mean(o.astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    mj = jax.jit(many)
    t0 = time.time(); float(mj(q, k, v))
    print(f"iters={iters} compile+first: {time.time()-t0:.1f}s", flush=True)
    best = min(
        (lambda: (lambda t0: (float(mj(q, k, v)), time.time() - t0)[1])(time.time()))()
        for _ in range(4))
    print(f"iters={iters}: {best/iters*1000:.3f} ms/iter (best wall {best:.3f}s)", flush=True)
    results[iters] = best / iters * 1000
overhead = (results[30] - results[300]) * 30 / (1 - 30/300)
print(json.dumps({"ms_per_iter_30": round(results[30], 3),
                  "ms_per_iter_300": round(results[300], 3)}))
