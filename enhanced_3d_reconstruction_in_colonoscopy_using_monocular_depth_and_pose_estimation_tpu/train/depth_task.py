"""Depth fine-tuning task: jitted train/eval steps over a device mesh.

TPU-native re-design of ``DepthAnythingV2Module``
(``/root/reference/lightning_model.py:49-407``) and its combined-dataset
variant (``lightning_model_combined.py``):

- ``train_step`` is a single compiled program: gradient accumulation is a
  ``lax.scan`` over microbatches (reference: Lightning
  ``accumulate_grad_batches=4``, ``configs/trainer/default.yaml:7``),
  followed by global-norm clipping and the two-group AdamW/OneCycle update.
  State is donated, so parameters update in place in HBM.
- batches are sharded over the ``data`` mesh axis; XLA inserts the gradient
  all-reduce (psum) — the TPU equivalent of DDP.
- per-source handling for the combined dataset (per-sample ``max_depth``
  mask bound, C3VD cm->mm metric rescale) follows
  ``lightning_model_combined.py:160-164,330-334,372-391``.
- validity mask: ``min_depth <= depth <= max_depth``
  (``lightning_model.py:191-193``).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any

import jax
import jax.flatten_util
import jax.numpy as jnp
import optax

from ..core.dtypes import DtypePolicy, POLICY_BF16
from ..evaluation.depth_metrics import compute_depth_errors
from ..losses.silog import silog_loss
from ..models.depth_anything import build_depth_model
from ..parallel import mesh as meshlib
from .optim import make_depth_optimizer

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DepthTrainState:
    params: Any
    opt_state: Any
    step: Array


class DepthTask:
    """Owns the model, optimizer and compiled steps for depth fine-tuning."""

    def __init__(
        self,
        encoder: str = "vitl",
        min_depth: float = 1e-6,
        max_depth: float = 20.0,
        encoder_lr: float = 5e-6,
        decoder_lr: float = 5e-5,
        pct_start: float = 0.1,
        div_factor: float = 1e9,
        total_steps: int = 1000,
        grad_accum: int = 4,
        clip_norm: float = 1.0,
        policy: DtypePolicy = POLICY_BF16,
        grad_checkpoint: bool = True,
        device_mesh=None,
        tensor_parallel: bool = False,
        fsdp: bool = False,
        fsdp_min_size: int | None = None,
        token_merge: float = 0.0,
        quant_int8: bool = False,
        seq_parallel: bool = False,
        pipeline_parallel: int = 0,
        pipe_microbatches: int = 0,
        pipe_virtual: int = 1,
        distill_encoder: str | None = None,
        distill_weight: float = 1.0,
    ):
        # quant_int8 is inference-only (zero gradients through round);
        # it is exposed here so the test/eval CLI can run quantized.
        self.mesh = device_mesh or meshlib.build_mesh()
        # Sequence parallelism (Megatron-SP expressed purely as GSPMD
        # sharding constraints): the ViT residual stream is pinned to
        # (data, model) between blocks so per-device activations shrink
        # by the model-axis size and the TP all-reduces become
        # reduce-scatter + just-in-time all-gather pairs. Numerics are
        # identical (it is only a layout constraint); a no-op unless the
        # model axis is >1.
        self.seq_parallel = bool(seq_parallel)
        token_sharding = None
        if self.seq_parallel and self.mesh.shape[meshlib.MODEL_AXIS] > 1:
            token_sharding = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec(
                    meshlib.DATA_AXIS, meshlib.MODEL_AXIS))
        self.model = build_depth_model(
            encoder, max_depth, dtype=policy.compute_dtype,
            grad_checkpoint=grad_checkpoint, token_merge=token_merge,
            quant_int8=quant_int8, token_sharding=token_sharding,
            # Eval/test batches are sharded over the data axis, so the
            # int8 auto scope sees the true per-device batch.
            data_shards=self.mesh.shape[meshlib.DATA_AXIS])
        self.encoder = encoder
        self.min_depth = float(min_depth)
        self.max_depth = float(max_depth)
        # Pipeline parallelism (GPipe over the model axis; see
        # parallel/pipeline.py). An explicit schedule, not a sharding —
        # mutually exclusive with the modes that give the mesh axes other
        # jobs, and with the trunk-rewriting speed dials.
        self.pipeline_parallel = int(pipeline_parallel)
        if self.pipeline_parallel > 1:
            if tensor_parallel or seq_parallel or fsdp:
                raise ValueError("pipeline_parallel is mutually exclusive "
                                 "with tensor_parallel/seq_parallel/fsdp")
            if token_merge > 0 or quant_int8:
                raise ValueError("pipeline_parallel does not compose with "
                                 "token_merge/quant_int8")
            if self.mesh.shape[meshlib.MODEL_AXIS] != self.pipeline_parallel:
                raise ValueError(
                    f"pipeline_parallel={self.pipeline_parallel} needs "
                    f"mesh_model={self.pipeline_parallel} (got "
                    f"{self.mesh.shape[meshlib.MODEL_AXIS]})")
            from ..parallel.pipeline import build_pp_depth_forward

            self.pipe_microbatches = (int(pipe_microbatches)
                                      or self.pipeline_parallel)
            self.pipe_virtual = max(1, int(pipe_virtual))
            self._pp_forward = build_pp_depth_forward(
                self.model, self.mesh, self.pipeline_parallel,
                self.pipe_microbatches, virtual=self.pipe_virtual)
        else:
            self._pp_forward = None
        self._model_repl = None  # data_shards=1 clone, built on demand
        # Knowledge distillation (TPU-native extension beyond the
        # reference's capability set; the step being extended is the SiLog
        # step of ``lightning_model.py:170-224``): a frozen teacher
        # (typically vitl) forward under stop-gradient adds
        # ``distill_weight * silog(student, teacher)`` to the loss, so a
        # small student (vits/vitb) can be trained toward the 82.9 fps
        # vitl headline's predictions as a cheaper deployment point.
        # Teacher params are NOT in the train state (frozen by
        # construction) and enter the jitted step as an argument — a
        # closure capture would bake 335M params in as constants and
        # constant-fold for 20+ min at compile (see
        # ops/quant.py calibrate_scales).
        self.distill_weight = float(distill_weight)
        self.teacher_model = None
        self.teacher_params = None
        if distill_encoder is not None:
            if self.pipeline_parallel > 1:
                raise ValueError("distill_encoder does not compose with "
                                 "pipeline_parallel")
            self.teacher_model = build_depth_model(
                distill_encoder, max_depth, dtype=policy.compute_dtype,
                data_shards=self.mesh.shape[meshlib.DATA_AXIS])
        self.grad_accum = int(grad_accum)
        self.tensor_parallel = tensor_parallel
        self.fsdp = fsdp
        self.fsdp_min_size = (meshlib.FSDP_MIN_SIZE if fsdp_min_size is None
                              else int(fsdp_min_size))
        self._sched_args = dict(total_steps=total_steps, pct_start=pct_start,
                                div_factor=div_factor)
        self._lrs = (encoder_lr, decoder_lr)
        self._opt_factory = functools.partial(
            make_depth_optimizer,
            encoder_lr=encoder_lr, decoder_lr=decoder_lr,
            total_steps=total_steps, pct_start=pct_start,
            div_factor=div_factor, clip_norm=clip_norm)
        self._optimizer = None
        # keyed by (mb divisible by data axis, has max_depth, has weight)
        self._train_step: dict[tuple, Any] = {}
        self._eval_step = None

    # ------------------------------------------------------------------ init

    def init_state(self, rng: Array, image_hw: tuple[int, int],
                   pretrained_params: Any | None = None,
                   fill_value: float | None = None) -> DepthTrainState:
        """Initialize (on host, then device_put with mesh shardings).

        ``pretrained_params`` is a converted DAv2 tree; encoder-only trees
        merge over the random init (reference bootstrap semantics,
        ``lightning_model.py:130-140``). ``fill_value`` skips the real
        random init and fills every param with a constant — benchmarking
        only (matmul timing is data-independent; random-init of vitl
        through the device tunnel costs ~200 s).
        """
        h, w = image_hw
        sample = jnp.zeros((1, h, w, 3), jnp.float32)
        if fill_value is not None:
            shapes = jax.eval_shape(
                lambda r: self.model.init(r, sample)["params"], rng)
            params = jax.tree.map(
                lambda s: jnp.full(s.shape, fill_value, s.dtype), shapes)
        else:
            params = self.model.init(rng, sample)["params"]
        if pretrained_params is not None:
            params = _merge_params(params, pretrained_params)

        self._optimizer = self._opt_factory(params)
        opt_state = self._optimizer.init(params)
        state = DepthTrainState(params, opt_state,
                                jnp.zeros((), jnp.int32))

        shardings = self.state_shardings(state)
        return jax.device_put(state, shardings)

    def state_shardings(self, state: DepthTrainState):
        """Sharding pytree matching a ``DepthTrainState``.

        - default: params replicated (TP rules if enabled), optimizer
          state replicated;
        - ``fsdp=True``: params AND the Adam moments (every array leaf of
          the optimizer state — mu/nu mirror the param shapes, so the
          shape-based ``fsdp_spec`` gives them the same layout) sharded
          over the ``data`` axis. ZeRO-3 as pure shardings: GSPMD inserts
          the just-in-time all-gathers / gradient reduce-scatters.
        """
        param_sh = meshlib.param_shardings(self.mesh, state.params,
                                           self.tensor_parallel, self.fsdp,
                                           self.fsdp_min_size)
        rep = meshlib.replicated_sharding(self.mesh)
        if self.fsdp:
            # The Adam moments mirror the param tree — give them the
            # params' exact composed (TP + FSDP) layout, so fsdp and
            # tensor_parallel together don't pin moments to a spec that
            # conflicts with the params'. Non-param leaves (step counts,
            # schedule state) stay replicated.
            opt_state_sh = optax.tree_map_params(
                self._optimizer, lambda _, sh: sh, state.opt_state,
                param_sh, transform_non_params=lambda _: rep,
                is_leaf=lambda x: isinstance(x, optax.MaskedNode))
        else:
            opt_state_sh = jax.tree.map(lambda _: rep, state.opt_state)
        return DepthTrainState(param_sh, opt_state_sh, rep)

    def lr_table(self) -> dict[str, Any]:
        """Per-step LR values for both groups (LearningRateMonitor parity,
        reference ``main_lightning.py:125``). Computed once, on host."""
        import numpy as np

        from .optim import onecycle_schedule

        steps = jnp.arange(self._sched_args["total_steps"])
        out = {}
        for name, lr in zip(("encoder", "decoder"), self._lrs):
            sched = onecycle_schedule(lr, **self._sched_args)
            out[name] = np.asarray(jax.vmap(sched)(steps))
        return out

    # ------------------------------------------------------------- loss core

    def _forward(self, params, image, train: bool = False):
        """Model forward — the GPipe-pipelined trunk when enabled.

        The pipeline needs the (static) batch to divide data-axis x
        microbatches; eval shapes that don't (trailing batches the loader
        couldn't pad) fall back to the plain forward at trace time —
        numerics are identical either way (test_pipeline_parallel.py).
        TRAIN shapes are config-controlled, so there a mismatch is a
        misconfiguration that would silently train un-pipelined for the
        whole run (half the mesh idle) — raise instead.
        """
        if self._pp_forward is not None:
            divisor = (self.mesh.shape[meshlib.DATA_AXIS]
                       * self.pipe_microbatches)
            if image.shape[0] % divisor == 0:
                return self._pp_forward(params, image)
            if train:
                raise ValueError(
                    f"pipeline_parallel={self.pipeline_parallel}: train "
                    f"microbatch {image.shape[0]} must divide data axis "
                    f"{self.mesh.shape[meshlib.DATA_AXIS]} x "
                    f"pipe_microbatches {self.pipe_microbatches}")
        model = self.model
        if (image.shape[0] % self.mesh.shape[meshlib.DATA_AXIS] != 0
                and self.model.data_shards != 1):
            # Batches that can't shard run replicated (shard_batch's own
            # rule): the whole batch sits on every device, so the int8
            # auto scope must threshold on data_shards=1, not the data
            # axis (same overcounting trap as jax.device_count()).
            if self._model_repl is None:
                self._model_repl = self.model.clone(data_shards=1)
            model = self._model_repl
        return model.apply({"params": params}, image)

    def set_teacher(self, teacher_params) -> None:
        """Install frozen teacher weights for distillation (replicated —
        the teacher is inference-only, so DP-style replication is the
        right layout on every mesh).

        The tree is COPIED: the train step donates ``state``, so a
        teacher aliasing the student's buffers (self-distillation,
        EMA-style setups) would trip XLA's donated-buffer-reuse check on
        the first step.
        """
        if self.teacher_model is None:
            raise ValueError("task was built without distill_encoder")
        rep = meshlib.replicated_sharding(self.mesh)
        self.teacher_params = jax.tree.map(
            lambda a: jax.device_put(jnp.array(a, copy=True), rep),
            teacher_params)

    def _loss_and_metrics(self, params, image, depth, max_depth_arr,
                          train: bool = False, teacher_params=None):
        pred = self._forward(params, image, train=train)  # (b, h, w)
        gt = depth[..., 0] if depth.ndim == 4 else depth
        maxd = max_depth_arr[:, None, None]
        mask = (gt >= self.min_depth) & (gt <= maxd)
        loss = silog_loss(pred, gt, mask)
        metrics = compute_depth_errors(jax.lax.stop_gradient(pred), gt, mask)
        if teacher_params is not None:
            # Teacher forward under stop-gradient: soft targets from the
            # frozen big model, same SiLog distance as the hard loss.
            # Masked to the teacher's confident range — sigmoid-scaled
            # output is always in [0, max_depth], but values below
            # min_depth would hit the loss's log guard.
            t_pred = jax.lax.stop_gradient(self.teacher_model.apply(
                {"params": teacher_params}, image))
            t_mask = (t_pred >= self.min_depth) & (t_pred <= maxd)
            distill = silog_loss(pred, t_pred, t_mask)
            loss = loss + self.distill_weight * distill
            metrics["distill"] = jax.lax.stop_gradient(distill)
        return loss, metrics

    # ------------------------------------------------------------ train step

    def _build_train_step(self):
        def step_fn(state: DepthTrainState, batch: dict,
                    teacher_params=None) -> tuple:
            """batch leaves have shape (A, mb, ...): A = grad-accum chunks.

            An optional ``weight`` (A,) vector down-weights padded chunks so
            a trailing partial accumulation group at epoch end still steps
            the optimizer (Lightning steps on the remainder; see
            ``fit_depth``). Grads/metrics are weighted means over chunks.
            ``teacher_params``: frozen distillation teacher (an argument,
            never a closure constant — see ``__init__``).
            """
            accum = batch["image"].shape[0]
            mb = batch["image"].shape[1]
            grad_sh = (meshlib.param_shardings(
                self.mesh, state.params, self.tensor_parallel, True,
                self.fsdp_min_size) if self.fsdp else None)

            # Flat grad carry (sweep knob, default OFF — measured SLOWER):
            # ravel each microbatch's grad tree into ONE vector so the
            # accumulation is a single add instead of one fused kernel per
            # param leaf (the train-step trace shows ~741 convert_add
            # kernels/step summing to 157 ms, ~13x above pure-bandwidth
            # cost; perf/trace_train). Measured 1142 vs 1077 ms/step at
            # bs8 x accum3: the ravel materializes an extra 1.34 GB concat
            # per microbatch that XLA cannot fuse into the backward
            # epilogues, costing more than the small-kernel waste it
            # removes. Incompatible with FSDP's per-leaf carry shardings.
            flat_mode = (os.environ.get("E3D_ACCUM_FLAT", "0") == "1"
                         and not self.fsdp)

            def micro(carry, xs):
                grads_acc, loss_acc, met_acc = carry
                image, depth, maxd, wi = xs
                (loss, metrics), grads = jax.value_and_grad(
                    self._loss_and_metrics, has_aux=True)(
                        state.params, image, depth, maxd, train=True,
                        teacher_params=teacher_params)
                if flat_mode:
                    # Add in the grad dtype THEN cast, matching the tree
                    # carry's rounding so E3D_ACCUM_FLAT composes with
                    # E3D_ACCUM_DTYPE=bf16 bit-exactly (advisor r3).
                    gflat = jax.flatten_util.ravel_pytree(grads)[0]
                    grads_acc = (grads_acc + gflat
                                 * wi).astype(grads_acc.dtype)
                else:
                    grads_acc = jax.tree.map(
                        lambda a, g: (a + g * wi).astype(a.dtype),
                        grads_acc, grads)
                if self.fsdp:
                    # ZeRO-2: pin the accumulated grads to the params'
                    # composed (TP + FSDP) layout so GSPMD reduce-scatters
                    # each microbatch's grads instead of carrying the full
                    # tree replicated through the scan.
                    grads_acc = jax.tree.map(
                        jax.lax.with_sharding_constraint,
                        grads_acc, grad_sh)
                met_acc = jax.tree.map(lambda a, m: a + m * wi,
                                       met_acc, metrics)
                return (grads_acc, loss_acc + loss * wi, met_acc), None

            # Grad-accumulator carry dtype: bf16 halves the 335M-param
            # carry traffic of the scan (the weighted mean at the end and
            # the optimizer stay f32). Sweep knob for the ~74 ms/step scan
            # overhead; numerics: bf16 accumulation of <=4 microbatch
            # grads costs ~1e-2 relative on the smallest grads.
            acc_dtype = (jnp.bfloat16
                         if os.environ.get("E3D_ACCUM_DTYPE") == "bf16"
                         else jnp.float32)
            zero_grads = jax.tree.map(
                lambda p: jnp.zeros(p.shape, acc_dtype), state.params)
            unravel = None
            if flat_mode:
                flat0, unravel = jax.flatten_util.ravel_pytree(zero_grads)
                zero_grads = flat0
            met_keys = ("d1", "abs_rel", "rmse", "l1") + (
                ("distill",) if teacher_params is not None else ())
            zero_mets = {k: jnp.zeros((), jnp.float32) for k in met_keys}
            maxd = batch.get(
                "max_depth",
                jnp.full((accum, mb), self.max_depth, jnp.float32))
            weight = batch.get("weight", jnp.ones((accum,), jnp.float32))
            # Accumulation layouts (E3D_ACCUM_MODE, measured in
            # perf/train_attrib.py at vitl-518):
            #   scan    - lax.scan over microbatches (default; ~25 ms of
            #             carry/add overhead per microbatch beyond the
            #             fwd+bwd itself).
            #   barrier - unrolled Python loop with an optimization
            #             barrier on the carry between microbatches: XLA
            #             can fuse the grad-adds into backward epilogues
            #             but cannot interleave microbatch live ranges
            #             (a plain unroll OOMs HBM: 19.6 G needed).
            # E3D_ACCUM_UNROLL>1 additionally unrolls the scan body.
            mode = os.environ.get("E3D_ACCUM_MODE", "scan")
            unroll = int(os.environ.get("E3D_ACCUM_UNROLL", "1"))
            carry = (zero_grads, jnp.zeros((), jnp.float32), zero_mets)
            if mode == "barrier":
                for a in range(accum):
                    xs = (batch["image"][a], batch["depth"][a], maxd[a],
                          weight[a])
                    carry, _ = micro(carry, xs)
                    if a + 1 < accum:
                        carry = jax.lax.optimization_barrier(carry)
                grads, loss_sum, met_sum = carry
            else:
                (grads, loss_sum, met_sum), _ = jax.lax.scan(
                    micro, carry,
                    (batch["image"], batch["depth"], maxd, weight),
                    unroll=min(unroll, accum) if unroll > 1 else 1)

            inv_a = 1.0 / jnp.maximum(jnp.sum(weight), 1e-6)
            if flat_mode:
                grads = unravel(grads * inv_a)
            else:
                grads = jax.tree.map(lambda g: g * inv_a, grads)
            updates, opt_state = self._optimizer.update(
                grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = DepthTrainState(params, opt_state, state.step + 1)
            metrics = {k: v * inv_a for k, v in met_sum.items()}
            metrics["loss"] = loss_sum * inv_a
            return new_state, metrics

        batch_spec = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec(None, meshlib.DATA_AXIS))
        return step_fn, batch_spec

    def train_step(self, state: DepthTrainState, batch: dict):
        """batch: dict of (A, mb, ...) arrays; returns (state, metrics)."""
        jitted = self.jitted_train_step(state, batch)
        if self.teacher_params is not None:
            return jitted(state, batch, self.teacher_params)
        return jitted(state, batch)

    def jitted_train_step(self, state: DepthTrainState, batch: dict):
        """The jitted step program for this (state, batch) regime —
        built but NOT executed (the export/guardrail tests lower it
        ahead-of-time for platforms this host doesn't have)."""
        # Sharding regime re-decided per call (one compiled program per
        # regime): freezing the first batch's divisibility would pin a
        # debug-batch warmup's replicated layout onto every later
        # full-size batch (see pose_task.train_step).
        sharded = (batch["image"].shape[1]
                   % self.mesh.shape[meshlib.DATA_AXIS] == 0)
        key = (sharded, "max_depth" in batch, "weight" in batch)
        if self._train_step.get(key) is None:
            step_fn, batch_spec = self._build_train_step()
            if not sharded:
                # Microbatch not divisible by the data axis: replicate
                # instead of failing (small-batch / debug runs).
                batch_spec = meshlib.replicated_sharding(self.mesh)
            state_shardings = self.state_shardings(state)
            batch_shardings = {
                "image": batch_spec, "depth": batch_spec,
            }
            if "max_depth" in batch:
                batch_shardings["max_depth"] = batch_spec
            if "weight" in batch:
                batch_shardings["weight"] = \
                    meshlib.replicated_sharding(self.mesh)
            metric_sh = meshlib.replicated_sharding(self.mesh)
            met_keys = ("d1", "abs_rel", "rmse", "l1", "loss")
            in_sh = [state_shardings, batch_shardings]
            if self.teacher_params is not None:
                met_keys += ("distill",)
                rep = meshlib.replicated_sharding(self.mesh)
                in_sh.append(jax.tree.map(lambda _: rep,
                                          self.teacher_params))
            self._train_step[key] = jax.jit(
                step_fn,
                donate_argnums=(0,),
                in_shardings=tuple(in_sh),
                out_shardings=(state_shardings,
                               {k: metric_sh for k in met_keys}),
            )
        return self._train_step[key]

    # ------------------------------------------------------------- eval step

    def eval_step(self, params, batch: dict):
        """batch: dict of (B, ...) arrays; returns scalar loss + metrics."""
        if self._eval_step is None:
            def step_fn(params, batch):
                maxd = batch.get(
                    "max_depth",
                    jnp.full((batch["image"].shape[0],), self.max_depth,
                             jnp.float32))
                loss, metrics = self._loss_and_metrics(
                    params, batch["image"], batch["depth"], maxd)
                metrics["loss"] = loss
                return metrics

            self._eval_step = jax.jit(step_fn)
        return self._eval_step(params, batch)

    def eval_step_combined(self, params, batch: dict):
        """Per-source metrics for combined SimCol+C3VD eval.

        Mirrors ``lightning_model_combined.py:199-217,372-391``: separate
        metric collections with ``SimCol/`` and ``C3VD/`` prefixes; C3VD
        l1/rmse are scaled x10 back to mm (training happens in the /10 cm
        convention). Also returns the overall metrics so combined eval
        needs a single forward pass.
        """
        if not hasattr(self, "_eval_combined"):
            def step_fn(params, batch):
                pred = self._forward(params, batch["image"])
                gt = batch["depth"][..., 0]
                maxd = batch["max_depth"][:, None, None]
                mask = (gt >= self.min_depth) & (gt <= maxd)
                source = batch["source"][:, None, None]
                out = {"loss": silog_loss(pred, gt, mask)}
                out.update(compute_depth_errors(pred, gt, mask))
                for name, sid in (("SimCol", 0), ("C3VD", 1)):
                    m = mask & (source == sid)
                    metrics = compute_depth_errors(pred, gt, m)
                    scale = 10.0 if sid == 1 else 1.0
                    out[f"{name}/l1"] = metrics["l1"] * scale
                    out[f"{name}/rmse"] = metrics["rmse"] * scale
                    out[f"{name}/abs_rel"] = metrics["abs_rel"]
                    out[f"{name}/d1"] = metrics["d1"]
                    out[f"{name}/count"] = jnp.sum(
                        batch["source"] == sid).astype(jnp.float32)
                return out

            self._eval_combined = jax.jit(step_fn)
        return self._eval_combined(params, batch)

    def eval_step_per_sample(self, params, batch: dict):
        """Per-sample metrics (for the per-procedure collectors of
        ``test_lightning.py``). Returns dict of (B,) arrays.

        Note: the reference appends the same *batch-level* metric once per
        sample (``test_lightning.py:73-109``, a known artifact); this
        computes true per-sample values.

        Output sharding is left to GSPMD (pinning P(data) would forbid
        trailing batches not divisible by the axis); multi-process
        consumers read the tiny (B,) outputs back with
        ``mesh.gather_rows`` and slice their own deterministic global row
        range (``cli/test_depth.py``), so coverage is exactly-once
        regardless of what sharding the compiler picks.
        """
        if not hasattr(self, "_eval_per_sample"):
            def step_fn(params, batch):
                pred = self._forward(params, batch["image"])
                gt = (batch["depth"][..., 0] if batch["depth"].ndim == 4
                      else batch["depth"])
                maxd = batch.get(
                    "max_depth",
                    jnp.full((batch["image"].shape[0],), self.max_depth,
                             jnp.float32))

                def one(pred_i, gt_i, maxd_i):
                    mask = (gt_i >= self.min_depth) & (gt_i <= maxd_i)
                    m = compute_depth_errors(pred_i, gt_i, mask)
                    m["loss"] = silog_loss(pred_i, gt_i, mask)
                    return m

                return jax.vmap(one)(pred, gt, maxd)

            self._eval_per_sample = jax.jit(step_fn)
        return self._eval_per_sample(params, batch)

    def predict(self, params, image: Array) -> Array:
        """image: (B, H, W, 3) normalized -> (B, H, W) depth."""
        if not hasattr(self, "_predict"):
            # Cached: a fresh jit(lambda) per call would retrace and
            # recompile the full model on every batch.
            self._predict = jax.jit(
                lambda p, x: self._forward(p, x))
        return self._predict(params, image)


def _merge_params(base: Any, overlay: Any) -> Any:
    """Recursively overlay converted weights onto a random init."""
    if isinstance(base, dict) and isinstance(overlay, dict):
        out = dict(base)
        for k, v in overlay.items():
            out[k] = _merge_params(base[k], v) if k in base else v
        return out
    return jnp.asarray(overlay, dtype=base.dtype if hasattr(base, "dtype")
                       else None)
