"""Attribute vitl-518 train-step time (bs 6, no remat) to components.

Pieces (select via TRAIN_PART, one per process — custom_vjp timing rule):
  micro    value_and_grad of the full loss, ONE microbatch (no scan/opt)
  fwd      forward-only full model at bs 6
  encoder  value_and_grad of encoder-only (mean-pool pseudo-loss)
  dpt      value_and_grad of DPT-head-only on synthetic ViT features
  opt      optimizer update alone (grads = ones like params)
  step     the real train_step (bs 6 x accum 4) for reference

Run: PYTHONPATH=/root/repo:/root/.axon_site TRAIN_PART=micro python perf/train_attrib.py
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from perf._timing import log, time_fn  # noqa: E402

B, SIZE = int(os.environ.get("TRAIN_B", "6")), 518


def fill_like_shapes(shapes, v=0.01):
    return jax.tree.map(lambda s: jnp.full(s.shape, v, s.dtype), shapes)


def main() -> None:
    part = os.environ.get("TRAIN_PART", "micro")
    log(f"backend={jax.default_backend()} part={part} bs={B}")
    rng = np.random.default_rng(0)
    results = {}

    if part in ("micro", "fwd"):
        from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.losses.silog import (  # noqa: E501
            silog_loss,
        )
        from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.models import (  # noqa: E501
            build_depth_model,
        )

        model = build_depth_model("vitl", max_depth=20.0,
                                  dtype=jnp.bfloat16, grad_checkpoint=False)
        image = jnp.asarray(rng.normal(size=(B, SIZE, SIZE, 3))
                            .astype(np.float32))
        depth = jnp.asarray(rng.uniform(0.5, 19.0, size=(B, SIZE, SIZE))
                            .astype(np.float32))
        shapes = jax.eval_shape(
            lambda r: model.init(r, image[:1])["params"],
            jax.random.PRNGKey(0))
        params = fill_like_shapes(shapes)

        def loss_fn(p, x, d):
            pred = model.apply({"params": p}, x)
            mask = (d >= 1e-6) & (d <= 20.0)
            return silog_loss(pred, d, mask)

        if part == "fwd":
            def step(acc, p, x, d):
                return loss_fn(p, x + acc * 1e-9, d)
            results["fwd_bs6_ms"] = time_fn(step, params, image, depth,
                                            iters=10, label="fwd") * 1000
        else:
            def step(acc, p, x, d):
                loss, grads = jax.value_and_grad(loss_fn)(
                    p, x + acc * 1e-9, d)
                # fold grads into a scalar so nothing is dead
                return loss + jax.tree.reduce(
                    lambda a, g: a + jnp.sum(g) * 1e-12, grads,
                    jnp.float32(0))
            results["micro_vg_ms"] = time_fn(step, params, image, depth,
                                             iters=10, label="micro") * 1000

    if part == "encoder":
        from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.models.dinov2 import (  # noqa: E501
            DinoViT,
        )

        enc = DinoViT(encoder="vitl", dtype=jnp.bfloat16)
        image = jnp.asarray(rng.normal(size=(B, SIZE, SIZE, 3))
                            .astype(np.float32))
        shapes = jax.eval_shape(
            lambda r: enc.init(r, image[:1])["params"],
            jax.random.PRNGKey(0))
        params = fill_like_shapes(shapes)

        def loss_fn(p, x):
            feats = enc.apply({"params": p}, x)
            return sum(jnp.mean(f[0].astype(jnp.float32)) for f in feats)

        def step(acc, p, x):
            loss, grads = jax.value_and_grad(loss_fn)(p, x + acc * 1e-9)
            return loss + jax.tree.reduce(
                lambda a, g: a + jnp.sum(g) * 1e-12, grads, jnp.float32(0))

        results["enc_vg_ms"] = time_fn(step, params, image,
                                       iters=10, label="encoder") * 1000

    if part == "dpt":
        from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.models.dpt import (  # noqa: E501
            DPTHead,
        )

        ph = pw = SIZE // 14
        head = DPTHead(1024, 256, (256, 512, 1024, 1024),
                       dtype=jnp.bfloat16)
        feats = [
            (jnp.asarray(rng.normal(size=(B, ph * pw, 1024)), jnp.bfloat16),
             jnp.asarray(rng.normal(size=(B, 1024)), jnp.bfloat16))
            for _ in range(4)]
        shapes = jax.eval_shape(
            lambda r: head.init(r, feats, ph, pw)["params"],
            jax.random.PRNGKey(0))
        params = fill_like_shapes(shapes)

        def loss_fn(p, f):
            return jnp.mean(
                head.apply({"params": p}, f, ph, pw).astype(jnp.float32))

        def step(acc, p, f):
            f2 = jax.tree.map(lambda t: t + acc.astype(t.dtype) * 1e-9, f)
            loss, grads = jax.value_and_grad(loss_fn)(p, f2)
            return loss + jax.tree.reduce(
                lambda a, g: a + jnp.sum(g) * 1e-12, grads, jnp.float32(0))

        results["dpt_vg_ms"] = time_fn(step, params, feats,
                                       iters=10, label="dpt") * 1000

    if part == "opt":
        from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.models import (  # noqa: E501
            build_depth_model,
        )
        from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.train.optim import (  # noqa: E501
            make_depth_optimizer,
        )

        model = build_depth_model("vitl", max_depth=20.0, dtype=jnp.bfloat16)
        sample = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
        shapes = jax.eval_shape(
            lambda r: model.init(r, sample)["params"], jax.random.PRNGKey(0))
        params = fill_like_shapes(shapes)
        opt = make_depth_optimizer(params, encoder_lr=5e-6, decoder_lr=5e-5,
                                   total_steps=100, pct_start=0.1,
                                   div_factor=1e9, clip_norm=1.0)
        opt_state = jax.jit(opt.init)(params)

        def step(acc, p, s):
            grads = jax.tree.map(
                lambda x: jnp.full(x.shape, 1e-6, jnp.float32) + acc * 1e-12,
                p)
            updates, s2 = opt.update(grads, s, p)
            p2 = jax.tree.map(lambda a, u: a + u, p, updates)
            return jax.tree.reduce(
                lambda a, x: a + jnp.sum(x) * 1e-12, p2, jnp.float32(0))

        results["opt_ms"] = time_fn(step, params, opt_state,
                                    iters=10, label="opt") * 1000

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
