"""ResNet backbone family (R-50/R-101) with frozen BatchNorm.

Capability twin of maskrcnn_benchmark/modeling/backbone/resnet.py (642 LoC):
bottleneck stages C2-C5 with FrozenBatchNorm2d, stride-in-1x1 (Caffe2-style)
or stride-in-3x3 variants, stage freezing (FREEZE_CONV_BODY_AT), returning
the multi-scale feature list the FPN consumes. Registered detector configs
in the reference use Swin; ResNet is part of the backbone registry surface
(modeling/backbone/__init__.py:19-233) — built here TPU-native in NHWC.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mqdet_tpu.models.layers import FrozenBatchNorm

Dtype = Any


class Bottleneck(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1 = self.stride if self.stride_in_1x1 else 1
        s3 = 1 if self.stride_in_1x1 else self.stride
        residual = x
        if x.shape[-1] != self.out_channels or self.stride != 1:
            residual = nn.Conv(
                self.out_channels, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = FrozenBatchNorm(self.out_channels, name="downsample_bn")(residual)

        y = nn.Conv(
            self.bottleneck_channels, (1, 1), strides=(s1, s1),
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = nn.relu(FrozenBatchNorm(self.bottleneck_channels, name="bn1")(y))
        y = nn.Conv(
            self.bottleneck_channels, (3, 3), strides=(s3, s3),
            padding=self.dilation, kernel_dilation=(self.dilation, self.dilation),
            use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = nn.relu(FrozenBatchNorm(self.bottleneck_channels, name="bn2")(y))
        y = nn.Conv(
            self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
            name="conv3",
        )(y)
        y = FrozenBatchNorm(self.out_channels, name="bn3")(y)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """C4/C5-style ResNet trunk returning (C2, C3, C4, C5) NHWC features."""

    depths: Tuple[int, ...] = (3, 4, 6, 3)  # R-50; R-101: (3, 4, 23, 3)
    base_channels: int = 64
    stride_in_1x1: bool = True
    return_stages: Sequence[int] = (1, 2, 3, 4)  # 1-based C2..C5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # stem: 7x7/2 conv + frozen BN + 3x3/2 maxpool
        y = nn.Conv(
            self.base_channels, (7, 7), strides=(2, 2), padding=3,
            use_bias=False, dtype=self.dtype, name="stem_conv",
        )(x)
        y = nn.relu(FrozenBatchNorm(self.base_channels, name="stem_bn")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        channels = self.base_channels
        for stage, blocks in enumerate(self.depths, start=1):
            out_ch = channels * 4
            stride = 1 if stage == 1 else 2
            for b in range(blocks):
                y = Bottleneck(
                    out_channels=out_ch,
                    bottleneck_channels=channels,
                    stride=stride if b == 0 else 1,
                    stride_in_1x1=self.stride_in_1x1,
                    dtype=self.dtype,
                    name=f"layer{stage}_block{b}",
                )(y)
            if stage in self.return_stages:
                outs.append(y)
            channels *= 2
        return outs


def resnet50(dtype=jnp.float32) -> ResNet:
    return ResNet(depths=(3, 4, 6, 3), dtype=dtype)


def resnet101(dtype=jnp.float32) -> ResNet:
    return ResNet(depths=(3, 4, 23, 3), dtype=dtype)
