"""Attribute DPT-head time: re-measure the full head (bf16 tail) and time
the standalone hot ops (fusion resizes, final resize, tail convs)."""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from perf._timing import log, time_fn  # noqa: E402

B = 8


def main() -> None:
    from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.ops.resize import (  # noqa: E501
        resize_align_corners,
    )

    which = os.environ.get("DPT_OP", "resizes")
    rng = np.random.default_rng(0)
    results = {}

    impl = os.environ.get("DPT_IMPL", "default")
    if which == "resizes":
        # refinenet upsamples: 19->37 (256ch), 37->74, 74->148, 148->296,
        # final 296->518 at 128ch.
        cases = [
            ("r4_19_37", (B, 19, 19, 256), (37, 37)),
            ("r3_37_74", (B, 37, 37, 256), (74, 74)),
            ("r2_74_148", (B, 74, 74, 256), (148, 148)),
            ("r1_148_296", (B, 148, 148, 256), (296, 296)),
            ("final_296_518", (B, 296, 296, 128), (518, 518)),
        ]
        for name, shape, out_hw in cases:
            x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)

            def step(acc, x, out_hw=out_hw):
                xi = x + acc.astype(jnp.bfloat16) * 1e-9
                if impl == "vmap":
                    y = _resize_vmap(xi, out_hw)
                else:
                    y = resize_align_corners(xi, out_hw)
                return jnp.mean(y.astype(jnp.float32))
            results[name] = round(
                time_fn(step, x, iters=20, label=name) * 1000, 3)

    elif which == "convs":
        import flax.linen as nn

        # the two most expensive conv groups: layer1_rn (148², 256->256)
        # and the refinenet1 RCU convs (148², 256ch x4), tail conv2_0.
        cases = [
            ("rn_l1_148", (B, 148, 148, 256), 256),
            ("rcu1_148x4", (B, 148, 148, 256), 256),
            ("conv1_296", (B, 296, 296, 256), 128),
            ("tail_518_bf16", (B, 518, 518, 128), 32),
        ]
        for name, shape, feats in cases:
            conv = nn.Conv(feats, (3, 3), padding=1, dtype=jnp.bfloat16,
                           param_dtype=jnp.float32)
            x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
            params = jax.tree.map(
                lambda s: jnp.full(s.shape, 0.01, s.dtype),
                jax.eval_shape(lambda r: conv.init(r, x)["params"],
                               jax.random.PRNGKey(0)))
            reps = 4 if name == "rcu1_148x4" else 1

            def step(acc, p, x, reps=reps, conv=conv):
                y = x + acc.astype(jnp.bfloat16) * 1e-9
                for _ in range(reps):
                    y = conv.apply({"params": p}, y)
                return jnp.mean(y.astype(jnp.float32))
            results[name] = round(
                time_fn(step, params, x, iters=20, label=name) * 1000, 3)

    elif which == "head":
        from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.models.dpt import (  # noqa: E501
            DPTHead,
        )

        head = DPTHead(embed_dim=1024, features=256,
                       out_channels=(256, 512, 1024, 1024),
                       dtype=jnp.bfloat16)
        taps = [(jnp.asarray(rng.normal(size=(B, 37 * 37, 1024)),
                             jnp.bfloat16),
                 jnp.asarray(rng.normal(size=(B, 1024)), jnp.bfloat16))
                for _ in range(4)]
        params = jax.tree.map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype),
            jax.eval_shape(lambda r: head.init(r, taps, 37, 37)["params"],
                           jax.random.PRNGKey(0)))

        def step(acc, p, t0):
            taps2 = [((t + acc.astype(jnp.bfloat16) * 1e-9), c)
                     for t, c in t0]
            d = head.apply({"params": p}, taps2, 37, 37)
            return jnp.mean(d.astype(jnp.float32))
        results["dpt_ms"] = round(
            time_fn(step, params, taps, iters=10, label="dpt") * 1000, 2)

    print(json.dumps(results))




def _resize_vmap(x, out_hw):
    """Matmul resize as vmapped per-batch dots with natural layouts."""
    from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.ops.resize import (  # noqa: E501
        _align_corners_matrix,
    )
    h2, w2 = out_hw
    b, h, w, c = x.shape
    mh = jnp.asarray(_align_corners_matrix(h, h2, "bilinear"), x.dtype)
    mw = jnp.asarray(_align_corners_matrix(w, w2, "bilinear"), x.dtype)
    y = jax.vmap(lambda xi: jnp.dot(mh, xi.reshape(h, w * c),
                                    preferred_element_type=jnp.float32)
                 .astype(x.dtype))(x)            # (b, h2, w*c)
    y = y.reshape(b * h2, w, c)
    y = jax.vmap(lambda xi: jnp.dot(mw, xi,
                                    preferred_element_type=jnp.float32)
                 .astype(x.dtype))(y)            # (b*h2, w2, c)
    return y.reshape(b, h2, w2, c)


if __name__ == "__main__":
    main()
