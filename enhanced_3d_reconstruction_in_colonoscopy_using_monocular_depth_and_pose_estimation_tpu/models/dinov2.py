"""DINOv2 ViT encoder (vits/vitb/vitl/vitg, patch 14), Flax/NHWC.

TPU-native re-design of the DepthAnythingV2 encoder used by the reference
via the external ``Depth_Anything_V2`` checkout (imported at
``/root/reference/lightning_model.py:16``; sizes table at ``run.py:97-118``).
Architecture parity targets the published DINOv2 ViT so converted ``.pth``
weights drop in (see ``models/convert.py``):

- patch embed: 14x14/14 conv; cls token; learned pos-embed for a 37x37 grid
  (518 px) with bicubic interpolation for other sizes;
- pre-LN blocks (eps 1e-6), exact GELU MLP (ratio 4) — fused SwiGLU for
  vit_giant2 (upstream ``ffn_layer="swiglufused"``) — LayerScale
  (init_values=1.0), no register tokens;
- ``get_intermediate_layers`` semantics: tap blocks at the DAv2 indices,
  apply the final LayerNorm to each tap, return (patch_tokens, cls_token).

TPU specifics: attention runs through ``ops.attention`` (Pallas flash
attention on TPU); activations in bf16 with f32 params (core.dtypes policy);
gradient checkpointing via ``flax.linen.remat`` mirrors the reference's
``set_grad_checkpointing`` (``lightning_model.py:124-127``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import attention as attn_ops

Array = jax.Array

VIT_ARCHS: dict[str, dict[str, Any]] = {
    "vits": dict(embed_dim=384, depth=12, num_heads=6),
    "vitb": dict(embed_dim=768, depth=12, num_heads=12),
    "vitl": dict(embed_dim=1024, depth=24, num_heads=16),
    # vit_giant2 uses the fused-SwiGLU FFN (upstream DINOv2 backbones
    # and DAv2's vendored copy: ffn_layer="swiglufused" for giant only).
    "vitg": dict(embed_dim=1536, depth=40, num_heads=24, ffn="swiglu"),
    # tiny config for tests / dry runs (not in the reference)
    "vitt": dict(embed_dim=64, depth=4, num_heads=2),
}

# DAv2 feature-tap indices per encoder size.
INTERMEDIATE_LAYER_IDX: dict[str, list[int]] = {
    "vits": [2, 5, 8, 11],
    "vitb": [2, 5, 8, 11],
    "vitl": [4, 11, 17, 23],
    "vitg": [9, 19, 29, 39],
    "vitt": [0, 1, 2, 3],
}

PATCH_SIZE = 14
POS_GRID = 37  # pretrained pos-embed grid (518 / 14)


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: Any = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.quant:
            from ..ops.quant import int8_dense

            # Same {kernel, bias} tree as nn.Dense -> checkpoints drop in.
            k1, b1 = _LinearParams(x.shape[-1], self.hidden_dim,
                                   name="fc1")()
            x = int8_dense(x.astype(self.dtype), k1, b1)
            x = nn.gelu(x, approximate=False)
            k2, b2 = _LinearParams(self.hidden_dim, self.out_dim,
                                   name="fc2")()
            return int8_dense(x, k2, b2)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc2")(x)
        return x


def swiglu_hidden(dim: int, ratio: float = 4.0) -> int:
    """DINOv2 SwiGLUFFNFused hidden width: 2/3 of the MLP hidden, rounded
    up to a multiple of 8 (vitg: 1536 -> 4096)."""
    return (int(dim * ratio * 2 / 3) + 7) // 8 * 8


class SwiGLU(nn.Module):
    """Fused-SwiGLU FFN (DINOv2 ``SwiGLUFFNFused``): ``w12`` packs the
    gate and value projections, ``w3`` projects back.

    Param names mirror the DAv2 checkpoint keys (``mlp.w12``/``mlp.w3``)
    so the converter maps giant checkpoints one-to-one."""

    hidden_dim: int
    out_dim: int
    dtype: Any = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.quant:
            from ..ops.quant import int8_dense

            k12, b12 = _LinearParams(x.shape[-1], 2 * self.hidden_dim,
                                     name="w12")()
            x12 = int8_dense(x.astype(self.dtype), k12, b12)
            x1, x2 = jnp.split(x12, 2, axis=-1)
            h = nn.silu(x1) * x2
            k3, b3 = _LinearParams(self.hidden_dim, self.out_dim,
                                   name="w3")()
            return int8_dense(h, k3, b3)
        x12 = nn.Dense(2 * self.hidden_dim, dtype=self.dtype,
                       param_dtype=jnp.float32, name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return nn.Dense(self.out_dim, dtype=self.dtype,
                        param_dtype=jnp.float32,
                        name="w3")(nn.silu(x1) * x2)


class _LinearParams(nn.Module):
    """Declares an nn.Dense-compatible {kernel, bias} param pair without
    applying it, so the Attention module can feed the packed weights to the
    fused-layout TPU path (``ops.attention.qkv_self_attention``) while
    keeping checkpoint/converter-identical param trees."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self) -> tuple[Array, Array]:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = jnp.bfloat16
    quant: bool = False
    # Pad-once residual stream (DinoViT): x arrives pre-padded to the
    # kernel block multiple and only the first n_valid tokens are real.
    # None = x is unpadded (per-layer pad inside qkv_self_attention).
    n_valid: int | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, n, _ = x.shape
        head_dim = self.dim // self.num_heads
        w_qkv, b_qkv = _LinearParams(self.dim, 3 * self.dim, name="qkv")()
        w_proj, b_proj = _LinearParams(self.dim, self.dim, name="proj")()
        x = x.astype(self.dtype)
        if attn_ops.use_fused_qkv():
            return attn_ops.qkv_self_attention(
                x, w_qkv, b_qkv, w_proj, b_proj, self.num_heads,
                quant=self.quant, n_valid=self.n_valid)
        assert self.n_valid is None, \
            "pad-once requires the fused attention path (padded keys " \
            "would enter the XLA softmax unmasked)"
        if self.quant:
            from ..ops.quant import int8_dense

            qkv = int8_dense(x, w_qkv, b_qkv)
        else:
            qkv = x @ w_qkv.astype(self.dtype) + b_qkv.astype(self.dtype)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = attn_ops.multi_head_attention(q, k, v)
        out = out.reshape(b, n, self.dim)
        if self.quant:
            from ..ops.quant import int8_dense

            return int8_dense(out, w_proj, b_proj)
        return out @ w_proj.astype(self.dtype) + b_proj.astype(self.dtype)


def _shard_tokens(x: Array, sharding) -> Array:
    """Pin a (B, N, C) token-activation layout (sequence parallelism).

    ``sharding`` is a concrete ``jax.sharding.NamedSharding`` baked in as
    a module FIELD at build time (like the int8 knobs: participating in
    the jit cache key, no trace-time globals). ``None`` = off.

    Axes whose mesh size doesn't divide the corresponding dim are
    dropped at trace time (shapes are static): jax rejects uneven
    explicit shardings at jit boundaries, and mid-graph GSPMD would
    silently ignore them anyway — trimming makes both behave the same
    (e.g. the batch-1 init trace, or a token count not divisible by the
    model axis, degrade to the divisible subset of the constraint)."""
    if sharding is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec

    mesh = sharding.mesh
    entries = list(sharding.spec) + [None] * (x.ndim - len(sharding.spec))
    trimmed = [
        axis if (axis is not None and x.shape[i] % mesh.shape[axis] == 0
                 and x.shape[i] > 0) else None
        for i, axis in enumerate(entries[:x.ndim])]
    if not any(a is not None for a in trimmed):
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, PartitionSpec(*trimmed)))


class LayerScale(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,),
                           jnp.float32)
        return x * gamma.astype(x.dtype)


class Block(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = jnp.bfloat16
    quant: bool = False
    quant_scope: str = "auto"
    ffn: str = "mlp"  # "mlp" (ratio-4 GELU) | "swiglu" (vit_giant2)
    # Megatron-style sequence parallelism: residual stream sharded over
    # (data, model) between blocks — GSPMD then reduce-scatters the TP
    # row-parallel outputs and all-gathers tokens just-in-time for
    # attention, instead of keeping full-sequence activations replicated
    # on every model-axis device. NamedSharding or None (off).
    token_sharding: Any = None
    # Ways the batch dim is sharded at the jit boundary (1 = whole batch
    # on one device). Set by the caller that knows the actual sharding
    # (DepthTask: the data mesh axis; infer_images_batched: n_dev iff its
    # DP path engaged) — jax.device_count() would overcount for
    # replicated batches or meshes with a model axis.
    data_shards: int = 1
    # Pad-once residual stream: see Attention.n_valid.
    n_valid: int | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # quant_scope: auto | all | mlp | attn (a build-time module field
        # — resolved from E3D_QUANT_SCOPE in build_depth_model, so it
        # participates in every jit cache key instead of being hidden
        # trace-time env state). Measured on v5e (perf/quant_int8_
        # scope.log, quant_int8_bs_sweep.log): full quant wins at
        # bs8/16/32 (+14/7.8/13.9%) but the attention projections LOSE
        # 22 ms at bs64, where bf16 GEMMs already run at peak
        # efficiency. "auto" quantizes the MLP always and attention only
        # when the (trace-time static) PER-DEVICE batch is <= 32; the
        # global batch dim spreads over ``data_shards`` devices.
        scope = self.quant_scope
        if scope == "auto":
            scope = ("all" if x.shape[0] <= 32 * max(1, self.data_shards)
                     else "mlp")
        attn_q = self.quant and scope in ("all", "attn")
        mlp_q = self.quant and scope in ("all", "mlp")
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm1")(x)
        y = Attention(self.dim, self.num_heads, self.dtype,
                      quant=attn_q, n_valid=self.n_valid, name="attn")(y)
        x = x + LayerScale(self.dim, name="ls1")(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm2")(x)
        if self.ffn == "swiglu":
            y = SwiGLU(swiglu_hidden(self.dim), self.dim, self.dtype,
                       quant=mlp_q, name="mlp")(y)
        else:
            y = Mlp(4 * self.dim, self.dim, self.dtype, quant=mlp_q,
                    name="mlp")(y)
        return _shard_tokens(x + LayerScale(self.dim, name="ls2")(y),
                             self.token_sharding)


def _pad_once_enabled() -> bool:
    """Perf A/B knob for the pad-once residual stream (default on).
    Trace-time like the other E3D_FLASH_* sweep knobs."""
    import os

    return os.environ.get("E3D_PAD_ONCE", "1") == "1"


def _torch_bicubic_matrix(out_size: int, in_size: int,
                          offset: float = 0.1):
    """(out, in) interpolation matrix matching torch ``F.interpolate``
    bicubic with DINOv2's ``interpolate_offset`` semantics: the scale is
    the GIVEN ``(out + offset) / in`` factor (not out/in), cubic kernel
    A = -0.75, ``antialias=False``, edge-clamped taps. Static-shape work
    done in numpy at trace time."""
    import numpy as np

    a = -0.75
    scale = float(out_size + offset) / in_size
    w = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        src = (i + 0.5) / scale - 0.5
        i0 = int(np.floor(src))
        t = src - i0
        # cubic convolution weights at distances (1+t, t, 1-t, 2-t)
        d = np.array([1.0 + t, t, 1.0 - t, 2.0 - t])
        ad = np.abs(d)
        wt = np.where(
            ad <= 1.0, (a + 2.0) * ad ** 3 - (a + 3.0) * ad ** 2 + 1.0,
            a * ad ** 3 - 5.0 * a * ad ** 2 + 8.0 * a * ad - 4.0 * a)
        for k in range(4):
            j = min(max(i0 - 1 + k, 0), in_size - 1)
            w[i, j] += wt[k]
    return w


def interpolate_pos_embed(pos_embed: Array, grid_h: int, grid_w: int) -> Array:
    """Resize the (1, 1+37*37, C) pos-embed to a (grid_h, grid_w) patch grid.

    DINOv2 interpolates the patch grid bicubically and keeps the cls
    slot. Numerics match the reference chain's
    ``DinoVisionTransformer.interpolate_pos_encoding`` (DAv2's vendored
    dinov2: torch bicubic A=-0.75, ``antialias=False``,
    ``interpolate_offset=0.1`` scale-factor semantics) — NOT
    ``jax.image.resize``, whose Keys kernel (A=-0.5) and antialiasing
    would give a systematic small deviation at every non-518-square
    resolution."""
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:]
    n = patch_pe.shape[1]
    src = int(round(float(n) ** 0.5))
    if (grid_h, grid_w) == (src, src):
        return pos_embed
    c = patch_pe.shape[-1]
    grid = patch_pe.reshape(src, src, c).astype(jnp.float32)
    wh = jnp.asarray(_torch_bicubic_matrix(grid_h, src))
    ww = jnp.asarray(_torch_bicubic_matrix(grid_w, src))
    out = jnp.einsum("hm,mnc->hnc", wh, grid)
    out = jnp.einsum("wn,hnc->hwc", ww, out).astype(pos_embed.dtype)
    return jnp.concatenate([cls_pe, out.reshape(1, grid_h * grid_w, c)],
                           axis=1)


class DinoViT(nn.Module):
    """DINOv2 ViT trunk exposing DAv2-style intermediate features.

    ``token_merge`` (off by default): ToMe-style one-shot merge of that
    fraction of patch tokens right after the FIRST tap block; later taps
    reconstruct the full grid through the tracked slot map
    (``ops/token_merge.py``) so the DPT decoder is unchanged. A pure
    speed/accuracy dial with no reference counterpart.
    """

    encoder: str = "vitl"
    dtype: Any = jnp.bfloat16
    grad_checkpoint: bool = False
    token_merge: float = 0.0
    # Dynamic-int8 (W8A8) block matmuls — inference-only opt-in speed
    # mode riding the MXU's 2x int8 rate (ops/quant.py).
    quant_int8: bool = False
    quant_scope: str = "auto"
    # FFN variant; "" resolves from VIT_ARCHS (swiglu for vitg).
    ffn: str = ""
    # Sequence-parallel residual-stream sharding (see Block.token_sharding).
    token_sharding: Any = None
    # Batch-dim shard count for the int8 auto scope (see Block.data_shards).
    data_shards: int = 1

    @nn.compact
    def __call__(self, img: Array, tap_indices: list[int] | None = None
                 ) -> list[tuple[Array, Array]]:
        """img: (B, H, W, 3), H/W multiples of 14, already normalized.

        Returns [(patch_tokens (B, N, C), cls_token (B, C)), ...] per tap,
        each with the final LayerNorm applied (dinov2
        ``get_intermediate_layers(..., norm=True)`` semantics).
        """
        arch = VIT_ARCHS[self.encoder]
        dim, depth, heads = arch["embed_dim"], arch["depth"], arch["num_heads"]
        taps = tap_indices or INTERMEDIATE_LAYER_IDX[self.encoder]

        b, h, w, _ = img.shape
        gh, gw = h // PATCH_SIZE, w // PATCH_SIZE

        x = nn.Conv(dim, kernel_size=(PATCH_SIZE, PATCH_SIZE),
                    strides=(PATCH_SIZE, PATCH_SIZE), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="patch_embed")(img.astype(self.dtype))
        x = x.reshape(b, gh * gw, dim)

        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, dim), jnp.float32)
        # mask_token exists in the checkpoints; declare it for conversion
        # completeness (unused at inference/fine-tune).
        self.param("mask_token", nn.initializers.zeros, (1, dim), jnp.float32)
        pos_grid = POS_GRID if self.encoder != "vitt" else 4
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, 1 + pos_grid * pos_grid, dim), jnp.float32)

        cls = jnp.broadcast_to(cls_token.astype(self.dtype), (b, 1, dim))
        x = jnp.concatenate([cls, x], axis=1)
        pe = interpolate_pos_embed(pos_embed, gh, gw).astype(self.dtype)
        x = x + pe

        final_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                  param_dtype=jnp.float32, name="norm")

        block_cls = Block
        if self.grad_checkpoint:
            block_cls = nn.remat(Block)

        outputs: dict[int, Array] = {}
        merged_taps: set[int] = set()
        slot_map = None
        tap_set = set(taps)
        merge_after = min(taps) if (self.token_merge > 0 and taps) else None
        ffn = self.ffn or arch.get("ffn", "mlp")

        # Pad-once residual stream: on the fused-attention (TPU) path, pad
        # the token dim to the flash kernel's block multiple ONCE here
        # (518 px: 1370 -> 1408 = 11*128, a lane multiple) instead of a
        # pad + slice pair inside all ``depth`` attention layers. Every
        # other encoder op is token-wise, so the pad rows stay inert
        # garbage-but-finite; taps slice back to n_valid below, which also
        # zeroes pad-row cotangents so weight grads are unchanged. Token
        # merging changes the token count mid-stream, so it keeps the
        # per-layer pad path. The int8 mode also keeps it: its per-token
        # quantize passes and int8 GEMMs pay the 2.8% extra rows without
        # the pad/slice savings (measured bs8 87.4 -> 90.9 ms/batch,
        # perf/padonce_ab.log).
        n_valid: int | None = None
        if (attn_ops.use_fused_qkv() and merge_after is None
                and not self.quant_int8 and _pad_once_enabled()):
            from ..ops.flash_attention import padded_len

            n_tok = x.shape[1]
            np_ = padded_len(n_tok)
            if np_ != n_tok:
                x = jnp.pad(x, ((0, 0), (0, np_ - n_tok), (0, 0)))
                n_valid = n_tok

        x = _shard_tokens(x, self.token_sharding)
        for i in range(depth):
            x = block_cls(dim, heads, self.dtype, self.quant_int8,
                          self.quant_scope, ffn,
                          token_sharding=self.token_sharding,
                          data_shards=self.data_shards,
                          n_valid=n_valid,
                          name=f"blocks_{i}")(x)
            if i in tap_set:
                outputs[i] = x
                if slot_map is not None:
                    merged_taps.add(i)
            if i == merge_after:
                from ..ops.token_merge import bipartite_merge

                x, slot_map = bipartite_merge(x, self.token_merge)

        results: list[tuple[Array, Array]] = []
        for i in taps:
            y = outputs[i]
            if n_valid is not None:
                y = y[:, :n_valid]
            y = final_norm(y)
            if i in merged_taps:
                from ..ops.token_merge import unmerge

                y = unmerge(y, slot_map)
            results.append((y[:, 1:], y[:, 0]))
        return results
