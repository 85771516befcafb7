"""GPipe-style pipeline parallelism for the ViT trunk.

The reference has no parallelism at all (single-GPU Lightning, SURVEY.md
section 2c); DP/TP/SP/FSDP here are expressed purely as GSPMD shardings.
Pipeline parallelism is the one mode GSPMD cannot derive from shardings —
it needs an explicit schedule — so this module hand-writes the classic
GPipe loop with ``shard_map`` + ``lax.ppermute`` over the ``model`` mesh
axis (the scaling-book recipe: each device owns a contiguous stage of
transformer blocks; microbatches flow stage-to-stage over ICI while every
stage computes a different microbatch in parallel).

Design notes:

- The ``('data', 'model')`` mesh is reused: the ``model`` axis becomes the
  pipeline axis (stages), composing with data parallelism on ``data``.
  Mutually exclusive with tensor/sequence parallelism and FSDP (those give
  the ``model``/``data`` axes different jobs).
- Parameters stay in the per-block checkpoint layout (``blocks_0``..);
  they are stacked to a ``(stages, layers_per_stage, ...)`` leading dim
  inside the jitted program and handed to ``shard_map`` with the stage dim
  on ``model`` — each device consumes only its own stage slice, and
  reverse-mode AD unstacks the gradients back to per-block automatically.
- The DPT head consumes four INTERMEDIATE taps, not the final block
  output, so each stage records the taps it owns into a zero-initialized
  ``(n_taps, ...)`` buffer and one ``psum`` over the pipeline axis merges
  them at the end (each slot is written by exactly one stage).
- Bubble ticks (warmup/drain) compute on zero/stale buffers; their tap
  writes are masked by microbatch validity, so the waste is the standard
  GPipe bubble ``(stages-1)/(n_micro+stages-1)`` and nothing else.
- Everything differentiates: ``ppermute``/``psum``/``dynamic_update_slice``
  have transposes, so ``jax.grad`` through the pipelined forward yields a
  1F1B-free but correct pipelined backward (the scan replays stages in
  reverse tick order).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from . import mesh as meshlib

Array = jax.Array


def stack_block_params(vit_params: dict, depth: int) -> Any:
    """Stack ``blocks_0 .. blocks_{depth-1}`` into one tree whose leaves
    gain a leading ``depth`` dim. Blocks are architecturally identical
    within a ViT, so the trees zip exactly."""
    trees = [vit_params[f"blocks_{i}"] for i in range(depth)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def unstack_block_params(stacked: Any, depth: int) -> dict:
    """Inverse of :func:`stack_block_params` (used by tests)."""
    return {f"blocks_{i}": jax.tree.map(lambda x: x[i], stacked)
            for i in range(depth)}


def pipeline_vit_taps(block_apply, stacked_params: Any, x: Array,
                      taps: list[int], mesh, stages: int,
                      n_micro: int) -> Array:
    """Run ``depth`` transformer blocks as a ``stages``-deep GPipe pipeline.

    Args:
      block_apply: ``(single_block_params, tokens) -> tokens`` — one
        transformer block (already closed over its static config).
      stacked_params: output of :func:`stack_block_params`, leading dim
        ``depth = stages * layers_per_stage``.
      x: ``(B, T, C)`` token activations AFTER embedding (cls + pos).
      taps: global block indices whose OUTPUTS feed the DPT head.
      mesh: the ``('data', 'model')`` device mesh; ``model`` = pipeline.
      stages: pipeline depth; must equal ``mesh.shape['model']``.
      n_micro: microbatches per (per-data-shard) batch; the local batch
        must divide by it.

    Returns:
      ``(n_taps, B, T, C)`` tap activations (same dtype as ``x``),
      replicated over the pipeline axis / sharded over ``data``.
    """
    depth_leading = jax.tree.leaves(stacked_params)[0].shape[0]
    if depth_leading % stages:
        raise ValueError(f"depth {depth_leading} not divisible by "
                         f"{stages} pipeline stages")
    lps = depth_leading // stages
    if mesh.shape[meshlib.MODEL_AXIS] != stages:
        raise ValueError(
            f"pipeline stages={stages} != mesh model axis "
            f"{mesh.shape[meshlib.MODEL_AXIS]}")
    n_data = mesh.shape[meshlib.DATA_AXIS]
    b = x.shape[0]
    if b % (n_data * n_micro):
        raise ValueError(f"batch {b} must divide data axis {n_data} x "
                         f"microbatches {n_micro}")
    taps = list(taps)
    n_taps = len(taps)

    # (depth, ...) -> (stages, lps, ...) so the stage dim can shard.
    staged = jax.tree.map(
        lambda p: p.reshape((stages, lps) + p.shape[1:]), stacked_params)
    gids = jnp.arange(depth_leading, dtype=jnp.int32).reshape(stages, lps)

    def stage_fn(params_lps, gids_lps, tokens):
        """Apply this stage's ``lps`` blocks; collect owned taps."""
        tap_ids = jnp.asarray(taps, jnp.int32)

        def one_layer(carry, xs):
            h, tacc = carry
            p_l, gid = xs
            h = block_apply(p_l, h)
            hit = (tap_ids == gid)[:, None, None, None]  # (n_taps,1,1,1)
            tacc = jnp.where(hit, h[None].astype(tacc.dtype), tacc)
            return (h, tacc), None

        tacc0 = jnp.zeros((n_taps,) + tokens.shape, tokens.dtype)
        (h, tacc), _ = jax.lax.scan(one_layer, (tokens, tacc0),
                                    (params_lps, gids_lps))
        return h, tacc

    def pipelined(staged_local, gids_local, x_local):
        # shard_map local views: stage dim is size 1 on each device.
        params_lps = jax.tree.map(lambda p: p[0], staged_local)
        gids_lps = gids_local[0]
        mb = x_local.shape[0] // n_micro
        micro = x_local.reshape((n_micro, mb) + x_local.shape[1:])
        stage_idx = jax.lax.axis_index(meshlib.MODEL_AXIS)
        is_first = stage_idx == 0

        taps_acc0 = jnp.zeros((n_taps, n_micro, mb) + x_local.shape[1:],
                              x_local.dtype)
        buf0 = jnp.zeros((mb,) + x_local.shape[1:], x_local.dtype)

        def tick(carry, t):
            buf, taps_acc = carry
            # Stage 0 feeds microbatch t (clipped on drain ticks); later
            # stages consume what ppermute delivered last tick.
            inp = jnp.where(is_first,
                            micro[jnp.clip(t, 0, n_micro - 1)], buf)
            out, tacc = stage_fn(params_lps, gids_lps, inp)
            # This stage processes microbatch t - stage_idx at tick t.
            m_idx = t - stage_idx
            valid = (m_idx >= 0) & (m_idx < n_micro)
            mi = jnp.clip(m_idx, 0, n_micro - 1)
            cur = jax.lax.dynamic_slice_in_dim(taps_acc, mi, 1, axis=1)
            new = jnp.where(valid, tacc[:, None], cur)
            taps_acc = jax.lax.dynamic_update_slice_in_dim(
                taps_acc, new, mi, axis=1)
            nxt = jax.lax.ppermute(
                out, meshlib.MODEL_AXIS,
                [(i, i + 1) for i in range(stages - 1)])
            return (nxt, taps_acc), None

        ticks = jnp.arange(n_micro + stages - 1, dtype=jnp.int32)
        (_, taps_acc), _ = jax.lax.scan(tick, (buf0, taps_acc0), ticks)
        # Each (tap, microbatch) slot is nonzero on exactly one stage.
        taps_full = jax.lax.psum(taps_acc, meshlib.MODEL_AXIS)
        return taps_full.reshape((n_taps, n_micro * mb)
                                 + x_local.shape[1:])

    out = shard_map(
        pipelined, mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(meshlib.MODEL_AXIS), staged),
            P(meshlib.MODEL_AXIS),
            P(meshlib.DATA_AXIS),
        ),
        out_specs=P(None, meshlib.DATA_AXIS),
        # The final psum replicates the output over the pipeline axis;
        # the static varying-mesh-axes checker can't see through the
        # masked dynamic-slice writes, so it is disabled.
        check_vma=False,
    )(staged, gids, x)
    return out


def build_pp_depth_forward(model, mesh, stages: int, n_micro: int):
    """``(params, img) -> depth`` with the ViT trunk pipelined.

    Re-implements the (small) glue of ``DinoViT.__call__`` /
    ``DepthAnythingV2.__call__`` around :func:`pipeline_vit_taps`, reusing
    the same Flax leaf modules so numerics are identical to the plain
    forward (pinned by ``tests/test_pipeline_parallel.py``). Unsupported
    with token-merge / int8 / sequence-parallel (asserted by DepthTask).
    """
    import flax.linen as nn

    from ..models.dinov2 import (Block, INTERMEDIATE_LAYER_IDX, PATCH_SIZE,
                                 VIT_ARCHS, interpolate_pos_embed)
    from ..models.dpt import DPTHead

    arch = VIT_ARCHS[model.encoder]
    dim, depth = arch["embed_dim"], arch["depth"]
    heads = arch["num_heads"]
    ffn = arch.get("ffn", "mlp")
    taps = INTERMEDIATE_LAYER_IDX[model.encoder]
    dtype = model.dtype

    block = Block(dim, heads, dtype, False, "auto", ffn)
    patch_conv = nn.Conv(dim, kernel_size=(PATCH_SIZE, PATCH_SIZE),
                         strides=(PATCH_SIZE, PATCH_SIZE), padding="VALID",
                         dtype=dtype, param_dtype=jnp.float32)
    final_norm = nn.LayerNorm(epsilon=1e-6, dtype=dtype,
                              param_dtype=jnp.float32)
    head = DPTHead(dim, model.features, tuple(model.out_channels), dtype)

    def block_apply(p_l, h):
        return block.apply({"params": p_l}, h)

    if model.grad_checkpoint:
        # Same remat boundary as nn.remat(Block) in the plain path.
        block_apply = jax.checkpoint(block_apply)

    def forward(params, img: Array) -> Array:
        p = params["pretrained"]
        b, h, w, _ = img.shape
        gh, gw = h // PATCH_SIZE, w // PATCH_SIZE
        x = patch_conv.apply({"params": p["patch_embed"]},
                             img.astype(dtype))
        x = x.reshape(b, gh * gw, dim)
        cls = jnp.broadcast_to(p["cls_token"].astype(dtype), (b, 1, dim))
        x = jnp.concatenate([cls, x], axis=1)
        pe = interpolate_pos_embed(p["pos_embed"], gh, gw).astype(dtype)
        x = x + pe

        stacked = stack_block_params(p, depth)
        tap_acts = pipeline_vit_taps(block_apply, stacked, x, taps,
                                     mesh, stages, n_micro)
        results = []
        for k in range(len(taps)):
            y = final_norm.apply({"params": p["norm"]}, tap_acts[k])
            results.append((y[:, 1:], y[:, 0]))
        depth01 = head.apply({"params": params["depth_head"]},
                             results, gh, gw)
        return depth01[..., 0].astype(jnp.float32) * model.max_depth

    return forward
