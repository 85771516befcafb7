"""ResNet-18 relative-pose regressor, Flax/NHWC.

Parity target: ``PoseEstimationNet`` in
``/root/reference/pose_estimation_model.py:35-105`` — torchvision
resnet18 (no pretrained weights) with:

- conv1 rebuilt for ``in_channels`` inputs (8 = 2 frames x RGB-D)
  (``:56-63``);
- fc replaced by Linear(512 -> 256) (``:66-67``);
- pose head: ReLU, Dropout(.3), Linear 256->128, ReLU, Dropout(.2),
  Linear 128->64, ReLU, Dropout(.1), Linear 64->7 (``:75-90``);
- output ``[tx, ty, tz, qx, qy, qz, qw]``.

BatchNorm uses torch defaults (eps 1e-5, running-stat momentum 0.1 ==
flax momentum 0.9); stats live in the ``batch_stats`` collection.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=1, use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv1")(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype,
                           param_dtype=jnp.float32, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="conv2")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype,
                           param_dtype=jnp.float32, name="bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, dtype=self.dtype,
                               param_dtype=jnp.float32,
                               name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype, param_dtype=jnp.float32,
                                    name="downsample_bn")(identity)
        return nn.relu(out + identity)


class PoseEstimationNet(nn.Module):
    in_channels: int = 8
    dtype: Any = jnp.float32  # pose training is 32-true in the reference
    dropout: bool = True  # False: deterministic head (train-parity tests)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        """x: (B, H, W, in_channels) NHWC. Returns (B, 7) f32 poses."""
        drop = train and self.dropout
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        plan = [(64, 1), (64, 1), (128, 2), (128, 1),
                (256, 2), (256, 1), (512, 2), (512, 1)]
        names = [f"layer{1 + i // 2}_{i % 2}" for i in range(8)]
        for (planes, stride), name in zip(plan, names):
            x = BasicBlock(planes, stride, self.dtype, name=name)(x, train)

        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.Dense(256, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc")(x)

        # pose head (dropout active only in training)
        x = nn.relu(x)
        x = nn.Dropout(0.3, deterministic=not drop)(x)
        x = nn.Dense(128, dtype=self.dtype, param_dtype=jnp.float32,
                     name="head_fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.2, deterministic=not drop)(x)
        x = nn.Dense(64, dtype=self.dtype, param_dtype=jnp.float32,
                     name="head_fc2")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.1, deterministic=not drop)(x)
        x = nn.Dense(7, dtype=self.dtype, param_dtype=jnp.float32,
                     name="head_fc3")(x)
        return x.astype(jnp.float32)
