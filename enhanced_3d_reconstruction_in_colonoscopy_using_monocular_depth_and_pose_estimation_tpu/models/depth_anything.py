"""DepthAnythingV2-style metric depth model (encoder + DPT head) and the
single-image inference pipeline.

Model-size table matches the reference exactly
(``/root/reference/run.py:97-118`` / ``lightning_model.py:88-109``);
``infer_image`` reproduces the reference's per-frame inference semantics
(``run.py:234``: lower-bound aspect-preserving resize to multiples of 14,
ImageNet normalization, forward, bilinear resize back to the input size).
"""

from __future__ import annotations

import functools
import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .dinov2 import DinoViT, VIT_ARCHS, PATCH_SIZE
from .dpt import DPTHead
from ..ops.resize import resize_antialias, resize_align_corners

Array = jax.Array

MODEL_CONFIGS: dict[str, dict[str, Any]] = {
    "vits": {"encoder": "vits", "features": 64,
             "out_channels": [48, 96, 192, 384]},
    "vitb": {"encoder": "vitb", "features": 128,
             "out_channels": [96, 192, 384, 768]},
    "vitl": {"encoder": "vitl", "features": 256,
             "out_channels": [256, 512, 1024, 1024]},
    "vitg": {"encoder": "vitg", "features": 384,
             "out_channels": [1536, 1536, 1536, 1536]},
    # tiny debug config (not in the reference)
    "vitt": {"encoder": "vitt", "features": 32,
             "out_channels": [16, 32, 48, 64]},
}

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class DepthAnythingV2(nn.Module):
    """Metric monocular depth: ``depth = sigmoid(head(vit(x))) * max_depth``.

    Input: (B, H, W, 3) NHWC, ImageNet-normalized, H/W multiples of 14.
    Output: (B, H, W) depth in [0, max_depth], f32.
    """

    encoder: str = "vitl"
    features: int = 256
    out_channels: tuple[int, ...] = (256, 512, 1024, 1024)
    max_depth: float = 20.0
    dtype: Any = jnp.bfloat16
    grad_checkpoint: bool = False
    # ToMe-style token-merge fraction (0 = off; see ops/token_merge.py).
    token_merge: float = 0.0
    # Dynamic-int8 encoder matmuls (inference-only; see ops/quant.py).
    quant_int8: bool = False
    # int8 scope (auto|all|mlp|attn) and DPT-conv quant toggle — module
    # FIELDS (resolved from env once, in build_depth_model) so every jit
    # cache key sees them; reading env at trace time instead would let a
    # stale compiled program serve a flipped knob.
    quant_scope: str = "auto"
    quant_dpt: bool = True
    # Sequence-parallel residual-stream sharding for the ViT trunk
    # (NamedSharding over (data, model) or None; see dinov2.Block).
    token_sharding: Any = None
    # How many ways the batch dim is sharded at the jit boundary (the
    # data mesh axis under DP/TP, 1 when the batch sits on one device) —
    # the int8 auto scope thresholds on the PER-DEVICE batch, which the
    # traced global shape alone can't tell (see dinov2.Block).
    data_shards: int = 1

    @nn.compact
    def __call__(self, img: Array) -> Array:
        b, h, w, _ = img.shape
        ph, pw = h // PATCH_SIZE, w // PATCH_SIZE
        taps = DinoViT(self.encoder, self.dtype, self.grad_checkpoint,
                       self.token_merge, self.quant_int8, self.quant_scope,
                       token_sharding=self.token_sharding,
                       data_shards=self.data_shards,
                       name="pretrained")(img)
        depth01 = DPTHead(VIT_ARCHS[self.encoder]["embed_dim"], self.features,
                          tuple(self.out_channels), self.dtype,
                          quant=self.quant_int8 and self.quant_dpt,
                          name="depth_head")(taps, ph, pw)
        return depth01[..., 0].astype(jnp.float32) * self.max_depth


_QUANT_SCOPES = ("auto", "all", "mlp", "attn")


def build_depth_model(encoder: str, max_depth: float,
                      dtype: Any = jnp.bfloat16,
                      grad_checkpoint: bool = False,
                      token_merge: float = 0.0,
                      quant_int8: bool = False,
                      token_sharding: Any = None,
                      data_shards: int = 1) -> DepthAnythingV2:
    cfg = MODEL_CONFIGS[encoder]
    scope = os.environ.get("E3D_QUANT_SCOPE", "auto")
    if scope not in _QUANT_SCOPES:
        # A typo (e.g. "atn", "ALL") must not silently run bf16 while a
        # sweep records the numbers as an int8 scope variant.
        raise ValueError(f"E3D_QUANT_SCOPE={scope!r}; "
                         f"expected one of {_QUANT_SCOPES}")
    return DepthAnythingV2(
        encoder=cfg["encoder"],
        features=cfg["features"],
        out_channels=tuple(cfg["out_channels"]),
        max_depth=max_depth,
        dtype=dtype,
        grad_checkpoint=grad_checkpoint,
        token_merge=token_merge,
        quant_int8=quant_int8,
        quant_scope=scope,
        quant_dpt=os.environ.get("E3D_QUANT_DPT", "1") == "1",
        token_sharding=token_sharding,
        data_shards=max(1, int(data_shards)),
    )


def _lower_bound_hw(h: int, w: int, target: int,
                    multiple: int = PATCH_SIZE) -> tuple[int, int]:
    """Aspect-preserving resize so min(H', W') >= target, rounded to
    multiples of 14 (DAv2 ``image2tensor`` lower-bound semantics)."""
    scale = max(target / h, target / w)
    def round_up_to(x: float) -> int:
        return int(np.ceil(x / multiple) * multiple)
    def round_to(x: float) -> int:
        r = int(np.round(x / multiple) * multiple)
        if r < target:
            r = round_up_to(x)
        return max(r, multiple)
    return round_to(h * scale), round_to(w * scale)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _infer(params, rgb01: Array, net_hw: tuple[int, int],
           model_static) -> Array:
    model = model_static()
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    x = resize_antialias(rgb01[None], net_hw, method="bicubic")
    x = (x - mean) / std
    depth = model.apply({"params": params}, x)
    out = resize_align_corners(depth[..., None],
                               (rgb01.shape[0], rgb01.shape[1]))
    return out[0, ..., 0]


def infer_image(model: DepthAnythingV2, params, bgr: np.ndarray,
                input_size: int = 518) -> np.ndarray:
    """Reference ``infer_image`` pipeline on one BGR uint8 frame.

    BGR->RGB, /255, lower-bound resize to multiples of 14, normalize,
    forward, bilinear back to the original resolution. Returns f32 depth
    (H, W) in metric units.
    """
    rgb01 = jnp.asarray(bgr[..., ::-1].astype(np.float32) / 255.0)
    net_hw = _lower_bound_hw(bgr.shape[0], bgr.shape[1], input_size)
    model_static = _ModelThunk(model)
    return np.asarray(_infer(params, rgb01, net_hw, model_static))


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _run_batched(params, rgb01, net_hw, out_hw, model_static):
    m = model_static()
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    x = resize_antialias(rgb01, net_hw, method="bicubic")
    x = (x - mean) / std
    depth = m.apply({"params": params}, x)
    return resize_align_corners(depth[..., None], out_hw)[..., 0]


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _run_batched_u8(params, bgr_u8, net_hw, out_hw, model_static,
                    readback_f16: bool = False):
    """uint8-BGR entry: the BGR->RGB flip and /255 run ON DEVICE, so the
    host uploads 4x fewer bytes per batch than the f32 form — measured
    through the axon tunnel as 9.1 -> 12.2 served fps at a 60 fps
    arrival stream (perf/serve_latency{,_u8}.log); identical IEEE math
    to the host-side conversion (round 5). ``readback_f16`` additionally
    halves the depth readback (f16 keeps ~0.01 absolute at the 20 m
    range cap — the same opt-in trade as E3D_POISSON_READBACK); a
    STATIC arg, not a trace-time env read, so a flipped knob can never
    be served by a stale cached program. The f32 ``_run_batched``
    remains the export/AOT calling convention."""
    rgb01 = bgr_u8[..., ::-1].astype(jnp.float32) / 255.0
    out = _run_batched.__wrapped__(params, rgb01, net_hw, out_hw,
                                   model_static)
    return out.astype(jnp.float16) if readback_f16 else out


@functools.lru_cache(maxsize=8)
def _dp_runner(net_hw: tuple[int, int], out_hw: tuple[int, int],
               model_static, n_devices: int, readback_f16: bool = False):
    """Data-parallel batched-inference program: batch sharded over the
    ``data`` mesh axis, params replicated — multi-chip serving with no
    collectives (SURVEY.md section 2c). ``readback_f16`` is part of the
    cache key, so a flipped knob gets its own program."""
    from ..parallel import mesh as meshlib

    mesh = meshlib.build_mesh(meshlib.MeshSpec(data=n_devices, model=1))
    rep = meshlib.replicated_sharding(mesh)
    batch_sh = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(meshlib.DATA_AXIS))

    def fn(params, bgr_u8):
        return _run_batched_u8.__wrapped__(params, bgr_u8, net_hw, out_hw,
                                           model_static, readback_f16)

    jfn = jax.jit(fn, in_shardings=(rep, batch_sh), out_shardings=batch_sh)
    return jfn, rep


class BatchedRunner:
    """Reusable compiled batched-inference program for ONE resolution.

    Build once per ``(resolution, batch_size)`` group, call many times —
    the streaming CLI path holds one of these per resolution so static
    int8 calibration happens ONCE (on the first K device batches) and
    every later flush reuses the same frozen-scale jit instead of
    re-calibrating and re-compiling per chunk (advisor r4 high).
    """

    def __init__(self, model: DepthAnythingV2, params,
                 resolution_hw: tuple[int, int],
                 input_size: int = 518, batch_size: int = 8,
                 data_parallel: bool | None = None,
                 calib_frames: list[np.ndarray] | None = None,
                 calib_batches: int = 0):
        h, w = resolution_hw
        self.resolution_hw = (h, w)
        self.batch_size = batch_size
        net_hw = _lower_bound_hw(h, w, input_size)

        n_dev = jax.device_count()
        use_dp = (n_dev > 1 if data_parallel is None else data_parallel)
        use_dp = use_dp and n_dev > 1 and batch_size % n_dev == 0
        if calib_batches > 0 and use_dp and data_parallel is None:
            # Auto-DP would kick in, but calibration is single-chip only.
            # The CLI exposes no data_parallel flag, so fall back with a
            # warning instead of raising an unreachable remedy (advisor
            # r4 low); explicit data_parallel=True still hard-errors.
            import warnings

            warnings.warn("static int8 calibration does not compose with "
                          "multi-device inference; falling back to "
                          "single-chip for this run", stacklevel=2)
            use_dp = False
        # The int8 auto scope keys on the PER-DEVICE batch: under DP the
        # batch spreads over n_dev chips, otherwise it sits on one.
        model_static = _ModelThunk(
            model.clone(data_shards=n_dev if use_dp else 1))
        if calib_batches > 0:
            if not model.quant_int8:
                raise ValueError("calib_batches requires quant_int8=True")
            if use_dp:
                raise ValueError("static int8 calibration does not compose "
                                 "with multi-device inference yet — pass "
                                 "data_parallel=False or drop calib_batches")
            from ..ops.quant import calibrate_scales, with_frozen_scales

            def fwd(p, x):
                return _run_batched_u8.__wrapped__(p, x, net_hw, (h, w),
                                                   model_static)

            calib_frames = calib_frames or []
            want = calib_batches * batch_size
            if len(calib_frames) < want:
                import warnings

                warnings.warn(
                    f"int8 calibration requested {calib_batches} batches "
                    f"({want} frames) but only {len(calib_frames)} frames "
                    f"were available — scales frozen from a smaller set",
                    stacklevel=2)
            if not calib_frames:
                raise ValueError("calib_batches > 0 requires calib_frames")
            calib = [jnp.asarray(arr) for arr, _ in chunk_bgr_u8(
                calib_frames[:want], batch_size)]
            # params go through as a jit ARG (closure capture would bake
            # them as constants — see calibrate_scales docstring).
            self.amax = calibrate_scales(
                lambda x, p: fwd(p, x), calib, params)
            frozen = with_frozen_scales(fwd, self.amax)
            if os.environ.get("E3D_SERVE_READBACK", "f32") == "f16":
                base = frozen
                frozen = lambda p, x: base(p, x).astype(jnp.float16)  # noqa: E731,E501
            self._run = jax.jit(frozen)
            self._params = params
        elif use_dp:
            run_j, rep = _dp_runner(
                net_hw, (h, w), model_static, n_dev,
                os.environ.get("E3D_SERVE_READBACK", "f32") == "f16")
            self._params = jax.device_put(params, rep)
            self._run = run_j
        else:
            self._params = params
            # Resolved ONCE at construction (not per trace) and passed
            # as a static jit arg — see _run_batched_u8.
            f16 = os.environ.get("E3D_SERVE_READBACK", "f32") == "f16"
            # positional: the jit's static_argnums are positional-only
            self._run = (lambda p, x: _run_batched_u8(p, x, net_hw, (h, w),
                                                      model_static, f16))

    def __call__(self, bgr_frames: list[np.ndarray]) -> list[np.ndarray]:
        h, w = self.resolution_hw
        for f in bgr_frames:
            if f.shape[:2] != (h, w):
                raise ValueError("BatchedRunner is compiled for "
                                 f"{(h, w)}; got {f.shape[:2]}")
        outputs: list[np.ndarray] = []
        # uint8 upload: 4x less host->device traffic than f32 (the
        # BGR->RGB flip and /255 happen inside the jit — see
        # _run_batched_u8).
        for arr, n in chunk_bgr_u8(bgr_frames, self.batch_size):
            outputs.extend(
                np.asarray(self._run(self._params, jnp.asarray(arr)))[:n])
        return outputs


def infer_images_batched(model: DepthAnythingV2, params,
                         bgr_frames: list[np.ndarray],
                         input_size: int = 518,
                         batch_size: int = 8,
                         data_parallel: bool | None = None,
                         calib_batches: int = 0
                         ) -> list[np.ndarray]:
    """Batched inference over same-resolution BGR frames.

    TPU-native extension of the reference's per-frame ``infer_image`` loop
    (``run.py:195-262``): frames are stacked into device batches so the
    MXU stays busy; resize/normalize/resize-back run inside the same jit.
    Ragged tails are padded to keep one compiled program. With multiple
    devices (and ``batch_size`` divisible by the device count), the batch
    is sharded over the ``data`` mesh axis (``data_parallel=None`` =
    auto).

    ``calib_batches > 0`` (requires ``model.quant_int8``): one-shot
    static int8 calibration — activation scales frozen from the first K
    device batches (``ops/quant.py calibrate_scales``), then everything
    runs through a dedicated frozen-scale program (its own jit: the
    frozen scales are closure constants, not part of the shared
    ``_run_batched`` cache key). Single-chip path only. Streaming callers
    should build a :class:`BatchedRunner` once and reuse it instead.
    """
    if not bgr_frames:
        return []
    h, w = bgr_frames[0].shape[:2]
    for f in bgr_frames:
        if f.shape[:2] != (h, w):
            raise ValueError("infer_images_batched requires equal "
                             "resolutions; use infer_image for mixed sizes")
    runner = BatchedRunner(model, params, (h, w), input_size, batch_size,
                           data_parallel, calib_frames=bgr_frames,
                           calib_batches=calib_batches)
    return runner(bgr_frames)


def chunk_rgb01(bgr_frames: list[np.ndarray], batch_size: int):
    """Yield ``(rgb01 (batch_size, H, W, 3) f32, n_valid)`` device-batch
    chunks: BGR->RGB, /255, zero-padded ragged tails (one compiled
    shape). The AOT-export calling convention (``serving/export.py``)
    and the shared pre-batching reference; the LIVE path uploads uint8
    instead (``chunk_bgr_u8`` + ``_run_batched_u8`` — same math on
    device, 4x less H2D traffic)."""
    for start in range(0, len(bgr_frames), batch_size):
        chunk = bgr_frames[start:start + batch_size]
        arr = np.stack([f[..., ::-1] for f in chunk]).astype(np.float32)
        arr /= 255.0
        n = len(chunk)
        if n < batch_size:
            arr = np.concatenate(
                [arr, np.zeros((batch_size - n,) + arr.shape[1:],
                               np.float32)])
        yield arr, n


def chunk_bgr_u8(bgr_frames: list[np.ndarray], batch_size: int):
    """Yield ``(bgr (batch_size, H, W, 3) uint8, n_valid)`` device-batch
    chunks with zero-padded ragged tails — the live serving upload
    format (BGR->RGB and /255 run on device, see ``_run_batched_u8``)."""
    for start in range(0, len(bgr_frames), batch_size):
        chunk = bgr_frames[start:start + batch_size]
        arr = np.stack(chunk).astype(np.uint8, copy=False)
        n = len(chunk)
        if n < batch_size:
            arr = np.concatenate(
                [arr, np.zeros((batch_size - n,) + arr.shape[1:],
                               np.uint8)])
        yield arr, n


class _ModelThunk:
    """Hashable wrapper so the module config is a static jit arg."""

    def __init__(self, model: DepthAnythingV2):
        self._model = model
        # Every field that changes the traced graph must be in the key,
        # or a cached jit program from a different config gets reused.
        self._key = (model.encoder, model.features, tuple(model.out_channels),
                     float(model.max_depth), str(model.dtype),
                     model.grad_checkpoint, float(model.token_merge),
                     model.quant_int8, model.quant_scope, model.quant_dpt,
                     model.token_sharding, int(model.data_shards))

    def __call__(self) -> DepthAnythingV2:
        return self._model

    def __hash__(self) -> int:
        return hash(self._key)

    def __eq__(self, other) -> bool:
        return isinstance(other, _ModelThunk) and self._key == other._key
