"""DPT decoder head for metric depth, Flax/NHWC.

Structural parity with the DAv2 metric-depth DPT head that the reference
consumes externally (``/root/reference/lightning_model.py:16``;
features/out_channels tables duplicated at ``lightning_model.py:88-109`` and
``run.py:97-118``):

- per-tap 1x1 projection to ``out_channels[i]``;
- resize stack: 4x and 2x learned upsampling, identity, stride-2 3x3 conv;
- 3x3 no-bias "scratch" convs to the common ``features`` width;
- four RefineNet-style fusion blocks (ResidualConvUnit x2 + 1x1 out conv,
  bilinear align_corners=True upsampling);
- head: 3x3 conv -> bilinear to (14*ph, 14*pw) -> 3x3 conv -> ReLU ->
  1x1 conv -> sigmoid (metric variant; caller scales by max_depth).

TPU re-design notes: the k=stride transposed convs are expressed as an
einsum + reshape ("pixel expand") — mathematically identical, maps straight
onto the MXU with no conv_transpose lowering; upsampling is the
matmul-based ``resize_align_corners``.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize_align_corners

Array = jax.Array


class PixelExpand(nn.Module):
    """ConvTranspose with kernel_size == stride == factor.

    out[b, h*f+i, w*f+j, o] = sum_c x[b,h,w,c] * W[i,j,c,o] + bias[o]
    """

    features: int
    factor: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        f = self.factor
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (f, f, c, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        y = jnp.einsum("bhwc,ijco->bhiwjo", x, kernel.astype(x.dtype))
        y = y.reshape(b, h * f, w * f, self.features)
        return y + bias.astype(y.dtype)


class PackedStride2Conv(nn.Module):
    """3x3 conv applied as the exactly-equivalent 4x4/stride-2 conv whose
    output packs a 2x2 pixel block into the channel axis (4*features).

    Why: the head's 518-px 128->32 conv leaves 3/4 of the MXU's 128 output
    lanes idle; packing four output pixels per position fills them
    (measured: tail 4.56 -> see perf/ logs). Param names/shapes match
    ``nn.Conv(features, (3, 3))`` so converted checkpoints load unchanged.

    out[b, 2t+q, 2s+p, c] == packed[b, t, s, (2q+p)*features + c]; the
    packed kernel places the original 3x3 taps at offset (q, p) of a 4x4
    window (stride 2, SAME-style (1,1) padding reproduces pad=1 exactly).
    Requires even H and W (always true here: DPT sizes are 14*patch).
    """

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        assert x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0, \
            f"PackedStride2Conv needs even H/W, got {x.shape}"
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        kd = kernel.astype(self.dtype)
        kp = jnp.zeros((4, 4, cin, 4, self.features), kd.dtype)
        for q in range(2):
            for p in range(2):
                kp = kp.at[q:q + 3, p:p + 3, :, 2 * q + p, :].set(kd)
        kp = kp.reshape(4, 4, cin, 4 * self.features)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kp, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + jnp.tile(bias, 4).astype(y.dtype)


class PackedPointwiseHead(nn.Module):
    """1x1 conv (cin -> 1, f32) applied per phase of a 2x2-packed layout:
    (B, H/2, W/2, 4*cin) -> (B, H/2, W/2, 4). Param names/shapes match
    ``nn.Conv(1, (1, 1))`` with ``cin`` input channels."""

    cin: int = 32

    @nn.compact
    def __call__(self, y: Array) -> Array:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, self.cin, 1), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (1,), jnp.float32)
        b, h2, w2, _ = y.shape
        return jnp.einsum("bhwpc,c->bhwp",
                          y.reshape(b, h2, w2, 4, self.cin),
                          kernel[0, 0, :, 0]) + bias


def _depth_to_space2(z: Array) -> Array:
    """(B, H/2, W/2, 4) phase-packed (2q+p) -> (B, H, W, 1)."""
    b, h2, w2, _ = z.shape
    z = z.reshape(b, h2, w2, 2, 2).transpose(0, 1, 3, 2, 4)
    return z.reshape(b, 2 * h2, 2 * w2, 1)


class QConv(nn.Module):
    """nn.Conv-compatible conv (same {kernel, bias} param tree) with an
    optional dynamic-int8 path (ops/quant.py int8_conv).

    ``quant`` only engages when both channel widths are >= 128: the int8
    MXU path measured 1.49x bf16 for 256-ch 3x3 convs but ~2x SLOWER for
    32-ch ones (narrow channels under-tile the int8 lanes)."""

    features: int
    kernel_hw: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: int = 1
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (*self.kernel_hw, cin, self.features),
                            jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        pad = ((self.padding, self.padding),) * 2
        if self.quant and min(cin, self.features) >= 128:
            from ..ops.quant import int8_conv

            return int8_conv(x.astype(self.dtype), kernel, bias,
                             self.strides, pad)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), self.strides,
            pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(y.dtype) if bias is not None else y


class ResidualConvUnit(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out = nn.relu(x)
        out = QConv(self.features, dtype=self.dtype, quant=self.quant,
                    name="conv1")(out)
        out = nn.relu(out)
        out = QConv(self.features, dtype=self.dtype, quant=self.quant,
                    name="conv2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x: Array, res: Array | None = None,
                 out_hw: tuple[int, int] | None = None) -> Array:
        if res is not None:
            x = x + ResidualConvUnit(self.features, self.dtype, self.quant,
                                     name="resConfUnit1")(res)
        x = ResidualConvUnit(self.features, self.dtype, self.quant,
                             name="resConfUnit2")(x)
        if out_hw is None:
            out_hw = (2 * x.shape[1], 2 * x.shape[2])
        # Reference order is resize -> 1x1 out_conv; a 1x1 conv commutes
        # exactly with bilinear resize (per-pixel linear map; resize rows
        # sum to 1, so the bias commutes too), and running it before the
        # upsample does 4x less conv work.
        x = QConv(self.features, (1, 1), padding=0, dtype=self.dtype,
                  quant=self.quant, name="out_conv")(x)
        return resize_align_corners(x, out_hw)


class DPTHead(nn.Module):
    embed_dim: int
    features: int
    out_channels: Sequence[int]
    dtype: Any = jnp.bfloat16
    # Dynamic-int8 for the wide (>=128-ch) convs; see ops/quant.py.
    quant: bool = False

    @nn.compact
    def __call__(self, taps: list[tuple[Array, Array]],
                 patch_h: int, patch_w: int) -> Array:
        """taps: 4 x (patch_tokens (B, N, C), cls). Returns (B, 14ph, 14pw, 1)
        in [0, 1] (sigmoid)."""
        assert len(taps) == 4
        outs = []
        for i, (tokens, _cls) in enumerate(taps):
            b, n, c = tokens.shape
            x = tokens.reshape(b, patch_h, patch_w, c)
            x = QConv(self.out_channels[i], (1, 1), padding=0,
                      dtype=self.dtype, quant=self.quant,
                      name=f"project_{i}")(x)
            if i == 0:
                x = PixelExpand(self.out_channels[0], 4, self.dtype,
                                name="resize_0")(x)
            elif i == 1:
                x = PixelExpand(self.out_channels[1], 2, self.dtype,
                                name="resize_1")(x)
            elif i == 3:
                x = QConv(self.out_channels[3], (3, 3), strides=(2, 2),
                          dtype=self.dtype, quant=self.quant,
                          name="resize_3")(x)
            outs.append(x)

        rn = []
        for i, x in enumerate(outs):
            rn.append(QConv(self.features, (3, 3), use_bias=False,
                            dtype=self.dtype, quant=self.quant,
                            name=f"layer{i + 1}_rn")(x))
        l1, l2, l3, l4 = rn

        path4 = FeatureFusionBlock(self.features, self.dtype, self.quant,
                                   name="refinenet4")(
            l4, None, out_hw=(l3.shape[1], l3.shape[2]))
        path3 = FeatureFusionBlock(self.features, self.dtype, self.quant,
                                   name="refinenet3")(
            path4, l3, out_hw=(l2.shape[1], l2.shape[2]))
        path2 = FeatureFusionBlock(self.features, self.dtype, self.quant,
                                   name="refinenet2")(
            path3, l2, out_hw=(l1.shape[1], l1.shape[2]))
        path1 = FeatureFusionBlock(self.features, self.dtype, self.quant,
                                   name="refinenet1")(path2, l1)

        out = QConv(self.features // 2, (3, 3), dtype=self.dtype,
                    quant=self.quant, name="output_conv1")(path1)
        out = resize_align_corners(out, (patch_h * 14, patch_w * 14),
                                   order=os.environ.get("E3D_FINAL_RESIZE_ORDER")
                                   or None)
        # First head conv in compute dtype: its input just came through a
        # compute-dtype resize, so there is no extra precision to preserve
        # — and a 518-px f32 conv runs at the slow f32 MXU rate. The final
        # 1x1 conv + sigmoid stay f32 (bf16 sigmoid saturation costs depth
        # resolution; SURVEY.md section 7, bf16 drift risk).
        #
        # The 3x3 conv runs 2x2-phase-packed (PackedStride2Conv): its 32
        # output channels would idle 3/4 of the MXU lanes at full
        # resolution. The packed layout flows through ReLU and the
        # per-phase 1x1 head conv unchanged (both pointwise) and is
        # unpacked after the sigmoid, where the tensor is 1-channel.
        out = PackedStride2Conv(32, self.dtype, name="output_conv2_0")(out)
        if os.environ.get("E3D_HEAD_RELU_BF16", "0") == "1":
            # A/B knob (round 5): relu in compute dtype, f32 cast moved
            # to the 1x1 head input — relu(cast(x)) == cast(relu(x))
            # bit-exactly, but the f32 materialization between them
            # (trace: copy.1037, ~1.0 ms/fwd at bs8) halves to bf16 and
            # the cast can fuse into the einsum's operand load.
            out = nn.relu(out)
            z = PackedPointwiseHead(32, name="output_conv2_2")(
                out.astype(jnp.float32))
        else:
            out = nn.relu(out.astype(jnp.float32))
            z = PackedPointwiseHead(32, name="output_conv2_2")(out)
        return _depth_to_space2(nn.sigmoid(z))
