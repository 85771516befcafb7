"""Pose-regression task: jitted train/eval steps.

TPU-native re-design of ``PoseEstimationModule``
(``/root/reference/pose_estimation_model.py:108-441``): f32 ("32-true")
compute, AdamW + OneCycle, combined translation/rotation/regularizer loss,
per-batch ATE/RTE/ROTE metrics, and full-trajectory evaluation via the
associative-scan pose chain (``evaluation.pose_metrics``). BatchNorm
statistics live in the ``batch_stats`` collection and update inside the
jitted step; dropout uses an explicit PRNG key folded with the step counter.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..core.dtypes import POLICY_F32, DtypePolicy
from ..evaluation.pose_metrics import compute_pose_errors, evaluate_trajectory
from ..losses.pose_loss import pose_loss
from ..models.resnet_pose import PoseEstimationNet
from ..parallel import mesh as meshlib
from .optim import make_pose_optimizer

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PoseTrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Array
    rng: Array


class PoseTask:
    def __init__(
        self,
        in_channels: int = 8,
        lr: float = 1e-4,
        weight_decay: float = 0.01,
        pct_start: float = 0.3,
        div_factor: float = 25.0,
        beta: float = 1.0,
        total_steps: int = 1000,
        clip_norm: float = 1.0,
        device_mesh=None,
        policy: DtypePolicy = POLICY_F32,
        cycle_momentum: bool = False,
        dropout: bool = True,
    ):
        # Reference parity is '32-true' (pose_estimation.yaml) -> f32
        # compute. trainer.precision=bf16-mixed opts into bf16 conv/GEMM
        # compute with f32 params/BN stats/loss — the same master-weight
        # policy the depth task uses (core/dtypes.py).
        # ``dropout=False`` disables the head dropout (train-math parity
        # tests need determinism on both frameworks); default matches the
        # reference.
        self.model = PoseEstimationNet(in_channels=in_channels,
                                       dtype=policy.compute_dtype,
                                       dropout=dropout)
        self.beta = float(beta)
        self.mesh = device_mesh or meshlib.build_mesh()
        self._sched_args = dict(total_steps=total_steps,
                                pct_start=pct_start, div_factor=div_factor)
        self._lr = lr
        self.optimizer = make_pose_optimizer(
            lr, total_steps, pct_start, div_factor,
            weight_decay=weight_decay, clip_norm=clip_norm,
            cycle_momentum=cycle_momentum)
        # keyed by "batch divisible by data axis" (sharded vs replicated)
        self._train_step: dict[bool, Any] = {}
        self._eval_step = None

    def init_state(self, rng: Array,
                   image_hw: tuple[int, int]) -> PoseTrainState:
        h, w = image_hw
        sample = jnp.zeros((1, h, w, self.model.in_channels), jnp.float32)
        init_rng, state_rng = jax.random.split(rng)
        variables = self.model.init(init_rng, sample, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.optimizer.init(params)
        state = PoseTrainState(params, batch_stats, opt_state,
                               jnp.zeros((), jnp.int32), state_rng)
        repl = meshlib.replicated_sharding(self.mesh)
        return jax.device_put(state, jax.tree.map(lambda _: repl, state))

    def lr_table(self):
        """Per-step LR values (LearningRateMonitor parity)."""
        import numpy as np

        from .optim import onecycle_schedule

        sched = onecycle_schedule(self._lr, **self._sched_args)
        steps = jnp.arange(self._sched_args["total_steps"])
        return np.asarray(jax.vmap(sched)(steps))

    # ------------------------------------------------------------ train step

    def _loss_fn(self, params, batch_stats, image, target, dropout_rng):
        out, mutated = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            image, train=True, rngs={"dropout": dropout_rng},
            mutable=["batch_stats"],
        )
        loss = pose_loss(out, target, beta=self.beta)
        return loss, (mutated["batch_stats"], jax.lax.stop_gradient(out))

    def train_step(self, state: PoseTrainState, batch: dict):
        """batch: {"input": (B, H, W, 8), "target": (B, 7)}."""
        # One compiled program per sharding regime: the divisibility of
        # the batch by the data axis must be re-decided per call, not
        # frozen from the first batch (a small first/debug batch would
        # otherwise pin every later full-size batch to the replicated
        # path, silently forfeiting data parallelism).
        sharded = (batch["input"].shape[0]
                   % self.mesh.shape[meshlib.DATA_AXIS] == 0)
        if self._train_step.get(sharded) is None:
            def step_fn(state: PoseTrainState, batch: dict):
                rng = jax.random.fold_in(state.rng, state.step)
                (loss, (batch_stats, pred)), grads = jax.value_and_grad(
                    self._loss_fn, has_aux=True)(
                        state.params, state.batch_stats,
                        batch["input"], batch["target"], rng)
                updates, opt_state = self.optimizer.update(
                    grads, state.opt_state, state.params)
                params = optax.apply_updates(state.params, updates)
                metrics = compute_pose_errors(pred, batch["target"])
                metrics["loss"] = loss
                new_state = PoseTrainState(params, batch_stats, opt_state,
                                           state.step + 1, state.rng)
                return new_state, metrics

            data_sh = (meshlib.batch_sharding(self.mesh) if sharded
                       else meshlib.replicated_sharding(self.mesh))
            self._train_step[sharded] = jax.jit(
                step_fn, donate_argnums=(0,),
                in_shardings=(None, {"input": data_sh, "target": data_sh}),
            )
        return self._train_step[sharded](state, batch)

    # ------------------------------------------------------------- eval step

    def eval_step(self, state: PoseTrainState, batch: dict):
        """Returns (loss+metrics dict, predictions (B, 7))."""
        if self._eval_step is None:
            def step_fn(params, batch_stats, batch):
                pred = self.model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    batch["input"], train=False)
                loss = pose_loss(pred, batch["target"], beta=self.beta)
                metrics = compute_pose_errors(pred, batch["target"])
                metrics["loss"] = loss
                return metrics, pred

            self._eval_step = jax.jit(step_fn)
        return self._eval_step(state.params, state.batch_stats, batch)

    @staticmethod
    def trajectory_metrics(pred_rel: Array, gt_rel: Array) -> dict:
        """Full-sequence trajectory evaluation (flattened frame order).

        Unlike the reference epoch-end path (which silently keeps only the
        first batch, see evaluation.pose_metrics docstring), this evaluates
        the entire buffered trajectory.
        """
        return evaluate_trajectory(pred_rel, gt_rel)
