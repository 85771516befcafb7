"""Capture a jax.profiler trace of the flagship-shape flash attention.

Evidence artifact for the ~2.13 ms attention wall (VERDICT r2 next #5):
the trace shows whether the MXU idles between the score/PV matmuls due to
MXU<->VPU serialization. Output: perf/trace_attn/ (perfetto trace.json.gz
under plugins/profile/<run>/).
"""
import os, sys, time, glob
import jax, jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.ops.flash_attention import flash_attention

B, N, H, D = 8, 1370, 16, 64
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.bfloat16)

def many(q, k, v):
    def body(_, acc):
        o = flash_attention(q + acc * 1e-9, k, v)
        return jnp.mean(o).astype(jnp.float32)
    return jax.lax.fori_loop(0, 20, body, jnp.float32(0))

mj = jax.jit(many)
print("warmup:", float(mj(q, k, v)), flush=True)
t0 = time.time(); float(mj(q, k, v)); dt = time.time() - t0
print(f"steady: {dt/20*1000:.2f} ms/call", flush=True)

out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "trace_attn")
with jax.profiler.trace(out):
    float(mj(q, k, v))
print("trace files:", glob.glob(out + "/**/*", recursive=True), flush=True)
