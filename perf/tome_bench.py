"""vitl-518 forward throughput with ToMe token merging on vs off.

One config per process (custom_vjp/jit caching): TOME_RATIO env sets the
merge fraction (default 0.3). Methodology: >=100 chained fori_loop iters
(ms-scale bench rule, perf/attn_trace_analysis.md)."""
import json, os, sys, time
import jax, jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.models import build_depth_model
from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.core.debug import enable_compilation_cache

enable_compilation_cache()
ratio = float(os.environ.get("TOME_RATIO", "0.3"))
bs = int(os.environ.get("TOME_BS", "8"))
iters = int(os.environ.get("TOME_ITERS", "100"))
model = build_depth_model("vitl", max_depth=20.0, dtype=jnp.bfloat16,
                          token_merge=ratio)
image = jnp.asarray(np.random.default_rng(0).normal(
    size=(bs, 518, 518, 3)).astype(np.float32))
shapes = jax.eval_shape(lambda r: model.init(r, image[:1])["params"],
                        jax.random.PRNGKey(0))
params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)

def many(p, x):
    def body(_, acc):
        return jnp.mean(model.apply({"params": p}, x + acc * 1e-9))
    return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

mj = jax.jit(many)
t0 = time.time(); float(mj(params, image))
print(f"compile+first: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
best = 1e9
for _ in range(3):
    t0 = time.time(); float(mj(params, image)); best = min(best, time.time()-t0)
ms = best / iters * 1000
print(json.dumps({"ratio": ratio, "bs": bs, "ms_per_batch": round(ms, 2),
                  "fps": round(bs / (ms / 1000), 2)}))
