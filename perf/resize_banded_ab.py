"""In-model A/B of the block-banded DPT resize matmuls (VERDICT r4 #2).

The bilinear align-corners resize matrices are 2-sparse per row; the
dense einsum pays the full (out x in) contraction. E3D_RESIZE_BANDED=1
chunks output rows and statically slices each chunk's nonzero input band
(~4x fewer MACs at the hot 296->518 shape, exact numerics). Measured
HERE on the full flagship forward — standalone resize wins historically
do not survive in-model (perf/resize_sweep.log, CLAUDE.md dead ends).

Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/resize_banded_ab.py
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SNIPPET = r"""
import os, sys, time
sys.path.insert(0, "__REPO__")
import jax, jax.numpy as jnp, numpy as np
from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.models import build_depth_model
bs = int(os.environ.get("E3D_AB_BS", "8"))
model = build_depth_model("vitl", max_depth=20.0, dtype=jnp.bfloat16)
shapes = jax.eval_shape(lambda r: model.init(r, jnp.zeros((1, 518, 518, 3)))["params"], jax.random.PRNGKey(0))
params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)
x = jnp.asarray(np.random.default_rng(0).normal(size=(bs, 518, 518, 3)).astype(np.float32))
iters = 30
def many(p, img):
    def body(_, acc):
        return jnp.mean(model.apply({"params": p}, img + acc * 1e-9))
    return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
mj = jax.jit(many)
t0 = time.time(); print("warm", float(mj(params, x)), f"{time.time()-t0:.0f}s", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.time(); float(mj(params, x)); best = min(best, time.time() - t0)
print(f"RESULT banded={os.environ.get('E3D_RESIZE_BANDED','1')} bs={bs}: "
      f"{best/iters*1000:.2f} ms/fwd", flush=True)
"""


def main() -> None:
    for banded in ("0", "1"):
        env = dict(os.environ, E3D_RESIZE_BANDED=banded)
        env["E3D_AB_BS"] = os.environ.get("E3D_AB_BS", "8")
        subprocess.run([sys.executable, "-c",
                        SNIPPET.replace("__REPO__", REPO)],
                       env=env, check=False)


if __name__ == "__main__":
    main()
