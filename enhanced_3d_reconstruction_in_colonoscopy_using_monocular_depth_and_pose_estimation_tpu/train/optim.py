"""Optimizers and LR schedules.

Reference training recipe (``/root/reference/lightning_model.py:362-407``):
AdamW (betas 0.9/0.999, weight decay 0.01) with two parameter groups —
encoder params (torch name contains "pretrained") at ``encoder_lr``, the
rest at ``decoder_lr`` — each under a per-step OneCycleLR. Gradient clipping
by global norm 1.0 comes from the Lightning trainer config
(``configs/trainer/default.yaml``).

``onecycle_schedule`` reproduces ``torch.optim.lr_scheduler.OneCycleLR``
(cos anneal, ``div_factor`` initial LR, default ``final_div_factor=1e4``);
unit-tested against torch in ``tests/test_optim.py``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax


def onecycle_schedule(max_lr: float, total_steps: int, pct_start: float,
                      div_factor: float,
                      final_div_factor: float = 1e4) -> optax.Schedule:
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    up_end = float(pct_start * total_steps) - 1.0
    down_end = float(total_steps) - 1.0

    def _anneal_cos(start: float, end: float, pct: jax.Array) -> jax.Array:
        return end + (start - end) / 2.0 * (1.0 + jnp.cos(jnp.pi * pct))

    def schedule(step: jax.Array) -> jax.Array:
        s = jnp.minimum(jnp.asarray(step, jnp.float32), down_end)
        pct_up = s / jnp.maximum(up_end, 1e-12)
        pct_down = (s - up_end) / jnp.maximum(down_end - up_end, 1e-12)
        lr_up = _anneal_cos(initial_lr, max_lr, jnp.clip(pct_up, 0.0, 1.0))
        lr_down = _anneal_cos(max_lr, min_lr, jnp.clip(pct_down, 0.0, 1.0))
        return jnp.where(s <= up_end, lr_up, lr_down)

    return schedule


def onecycle_momentum_schedule(total_steps: int, pct_start: float,
                               base_momentum: float = 0.85,
                               max_momentum: float = 0.95) -> optax.Schedule:
    """``cycle_momentum=True`` companion of :func:`onecycle_schedule`.

    torch's OneCycleLR cycles the optimizer momentum INVERSELY to the LR
    (``max_momentum`` at the ends, ``base_momentum`` at peak LR); for Adam
    optimizers it overwrites ``betas[0]`` each step. The reference's pose
    recipe enables this (``configs/pose_estimation/pose_estimation.yaml:17``
    ``cycle_momentum: True`` -> ``pose_estimation_model.py:420``); the depth
    recipe keeps it off."""
    up_end = float(pct_start * total_steps) - 1.0
    down_end = float(total_steps) - 1.0

    def _anneal_cos(start: float, end: float, pct: jax.Array) -> jax.Array:
        return end + (start - end) / 2.0 * (1.0 + jnp.cos(jnp.pi * pct))

    def schedule(step: jax.Array) -> jax.Array:
        s = jnp.minimum(jnp.asarray(step, jnp.float32), down_end)
        pct_up = s / jnp.maximum(up_end, 1e-12)
        pct_down = (s - up_end) / jnp.maximum(down_end - up_end, 1e-12)
        m_up = _anneal_cos(max_momentum, base_momentum,
                           jnp.clip(pct_up, 0.0, 1.0))
        m_down = _anneal_cos(base_momentum, max_momentum,
                             jnp.clip(pct_down, 0.0, 1.0))
        return jnp.where(s <= up_end, m_up, m_down)

    return schedule


def _encoder_label_tree(params: Any) -> Any:
    """'encoder' for params under the ViT trunk ('pretrained', matching the
    torch name split), 'decoder' for everything else."""

    def label(kp, _leaf) -> str:
        for k in kp:
            if getattr(k, "key", None) == "pretrained":
                return "encoder"
        return "decoder"

    return jax.tree_util.tree_map_with_path(label, params)


def make_depth_optimizer(params: Any, encoder_lr: float, decoder_lr: float,
                         total_steps: int, pct_start: float,
                         div_factor: float, clip_norm: float = 1.0,
                         weight_decay: float = 0.01
                         ) -> optax.GradientTransformation:
    enc_sched = onecycle_schedule(encoder_lr, total_steps, pct_start,
                                  div_factor)
    dec_sched = onecycle_schedule(decoder_lr, total_steps, pct_start,
                                  div_factor)

    def adamw(sched):
        return optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=weight_decay)

    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.multi_transform(
            {"encoder": adamw(enc_sched), "decoder": adamw(dec_sched)},
            _encoder_label_tree(params),
        ),
    )


def make_pose_optimizer(lr: float, total_steps: int, pct_start: float,
                        div_factor: float, weight_decay: float = 0.01,
                        clip_norm: float = 1.0, cycle_momentum: bool = False
                        ) -> optax.GradientTransformation:
    """AdamW + OneCycle for the pose net
    (``pose_estimation_model.py:400-440``).

    ``cycle_momentum=True`` additionally schedules Adam's b1 the way torch
    OneCycleLR does (0.95 -> 0.85 -> 0.95, inverse to the LR) — the
    reference pose recipe trains with this on. Implemented with
    ``optax.inject_hyperparams`` so b1 is evaluated per step; bias
    correction uses the current b1, matching torch (which reads the
    mutated ``betas[0]`` inside ``adamw`` each step)."""
    sched = onecycle_schedule(lr, total_steps, pct_start, div_factor)
    if cycle_momentum:
        m_sched = onecycle_momentum_schedule(total_steps, pct_start)
        adamw = optax.inject_hyperparams(optax.adamw)(
            learning_rate=sched, b1=m_sched, b2=0.999, eps=1e-8,
            weight_decay=weight_decay)
    else:
        adamw = optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8,
                            weight_decay=weight_decay)
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        adamw,
    )
