"""EfficientNet backbone family + BiFPN + EffNetFPN (flax, NHWC).

Capability twins of the reference backbone-registry entries
EFFICIENT{3,5,7}-{FPN,BIFPN}-{RETINANET,FCOS} and EFFICIENT-DET:

- EfficientNet body: maskrcnn_benchmark/modeling/backbone/efficientnet.py
  (compound width/depth scaling table get_efficientnet :625-691, stage-merge
  reduce logic :662-676, EffiDwsConvUnit :331-389, EffiInvResUnit :391-471,
  EffiInitBlock :473-512, forward collecting stages i>1 :615-621 -> four
  feature maps at strides 4/8/16/32).
- BiFPN: maskrcnn_benchmark/modeling/backbone/bifpn.py:7-271 (fast-attention
  weighted fusion, first_time down-channel paths p5_to_p6/p6_to_p7).
  NOTE: the reference's BiFPN 3x3 depthwise convs and 3x3/s2 maxpools carry
  no padding (bifpn.py:12-52), so every conv shrinks the map by 2px and the
  residual adds cannot line up on real inputs — the module is only shape-safe
  with same-padding, which upstream EfficientDet (efficientdet.py
  Conv2dStaticSamePadding:84-147) uses. We use TF SAME padding throughout,
  matching efficientdet.py and making the path actually runnable.
- EffNetFPN: maskrcnn_benchmark/modeling/backbone/efficientdet.py:1193-1216
  (EfficientDetBackbone compound tables :1229-1245, start_from in {2,3}).

TPU-first notes: all convolutions are NHWC with TF SAME padding so XLA maps
them straight onto the MXU; batch-norm is FrozenBatchNorm (a folded affine) —
MQ-Det freezes the whole detector trunk during modulated training
(tools/train_net.py:67-82), so frozen statistics are the executed semantics;
fast-attention weight normalization is a 2/3-way scalar blend fused by XLA.
"""
from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mqdet_tpu.models.layers import FrozenBatchNorm

Dtype = Any


def round_channels(channels: float, divisor: int = 8) -> int:
    """efficientnet.py:17-38 make-divisible rounding."""
    rounded = max(int(channels + divisor / 2.0) // divisor * divisor, divisor)
    if float(rounded) < 0.9 * channels:
        rounded += divisor
    return rounded


# base b0 stage description (efficientnet.py:651-658)
_LAYERS = [1, 2, 2, 3, 3, 4, 1]
_DOWNSAMPLE = [1, 1, 1, 1, 0, 1, 0]
_CHANNELS = [16, 24, 40, 80, 112, 192, 320]
_EXPANSION = [1, 6, 6, 6, 6, 6, 6]
_KERNELS = [3, 3, 5, 3, 5, 5, 3]
_STRIDES = [1, 2, 2, 2, 1, 2, 1]

# version -> (depth_factor, width_factor) (efficientnet.py:625-655)
_VERSION_FACTORS = {
    "b0": (1.0, 1.0),
    "b1": (1.1, 1.0),
    "b2": (1.2, 1.1),
    "b3": (1.4, 1.2),
    "b4": (1.8, 1.4),
    "b5": (2.2, 1.6),
    "b6": (2.6, 1.8),
    "b7": (3.1, 2.0),
    "b8": (3.6, 2.2),
}


def efficientnet_spec(version: str):
    """Expand the b{n} compound scaling into merged per-stage unit lists.

    Mirrors the reduce() stage-merge in efficientnet.py:662-676: a layer group
    with downsample=0 is appended to the previous stage. Returns
    (channels, kernels, expansions, stage_strides, out_channels) where the
    first three are per-stage lists of per-unit values.
    """
    if version not in _VERSION_FACTORS:
        raise ValueError(f"Unsupported EfficientNet version {version}")
    depth_f, width_f = _VERSION_FACTORS[version]
    layers = [int(math.ceil(li * depth_f)) for li in _LAYERS]
    channels = [round_channels(ci * width_f) for ci in _CHANNELS]

    def merge(values):
        stages: List[list] = []
        for v, n, down in zip(values, layers, _DOWNSAMPLE):
            if down:
                stages.append([v] * n)
            else:
                stages[-1].extend([v] * n)
        return stages

    st_channels = merge(channels)
    st_kernels = merge(_KERNELS)
    st_expansion = merge(_EXPANSION)
    st_strides = [s[0] for s in merge(_STRIDES)]
    out_channels = [st[-1] for st in st_channels[1:]]  # stages 2..5
    init_channels = round_channels(32 * width_f)
    return st_channels, st_kernels, st_expansion, st_strides, init_channels, out_channels


class _ConvBN(nn.Module):
    """Conv (TF SAME) + FrozenBatchNorm + optional swish."""

    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = FrozenBatchNorm(self.features, name="bn")(x)
        if self.act:
            x = jax.nn.silu(x)
        return x


class _SqueezeExcite(nn.Module):
    """SEBlock(channels=mid, reduction=exp*4) => bottleneck = in/4.

    efficientnet.py EffiInvResUnit :445-449; swish mid activation, sigmoid out.
    """

    channels: int
    bottleneck: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.bottleneck, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = jax.nn.silu(s)
        s = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * jax.nn.sigmoid(s)


class _DwsConvUnit(nn.Module):
    """Stage-1 depthwise-separable unit (EffiDwsConvUnit :331-389)."""

    in_channels: int
    out_channels: int
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = self.in_channels == self.out_channels and self.stride == 1
        identity = x
        x = _ConvBN(
            self.in_channels, 3, self.stride, groups=self.in_channels,
            dtype=self.dtype, name="dw",
        )(x)
        x = _SqueezeExcite(self.in_channels, max(1, self.in_channels // 4), dtype=self.dtype, name="se")(x)
        x = _ConvBN(self.out_channels, 1, act=False, dtype=self.dtype, name="pw")(x)
        if residual:
            x = x + identity
        return x


class _InvResUnit(nn.Module):
    """MBConv inverted-residual unit (EffiInvResUnit :391-471)."""

    in_channels: int
    out_channels: int
    kernel: int
    stride: int
    expansion: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = self.in_channels == self.out_channels and self.stride == 1
        identity = x
        mid = self.in_channels * self.expansion
        x = _ConvBN(mid, 1, dtype=self.dtype, name="expand")(x)
        x = _ConvBN(
            mid, self.kernel, self.stride, groups=mid, dtype=self.dtype, name="dw"
        )(x)
        # reduction = expansion * se_factor(4) => bottleneck = in_channels // 4
        x = _SqueezeExcite(mid, max(1, self.in_channels // 4), dtype=self.dtype, name="se")(x)
        x = _ConvBN(self.out_channels, 1, act=False, dtype=self.dtype, name="project")(x)
        if residual:
            x = x + identity
        return x


class EfficientNet(nn.Module):
    """EfficientNet-b{n} trunk returning (C2, C3, C4, C5) at strides 4..32.

    Matches efficientnet.py EfficientNet.forward :615-621 which collects the
    outputs of merged stages 2..5 (the stem and stride-1 stage 1 are
    consumed, not returned).
    """

    version: str = "b0"
    dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> List[int]:
        return efficientnet_spec(self.version)[5]

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        (st_channels, st_kernels, st_expansion, st_strides, init_ch, _) = (
            efficientnet_spec(self.version)
        )
        x = x.astype(self.dtype)
        x = _ConvBN(init_ch, 3, 2, dtype=self.dtype, name="stem")(x)
        in_ch = init_ch
        outs = []
        for si, (chs, ks, exps) in enumerate(zip(st_channels, st_kernels, st_expansion)):
            for ui, (ch, k, e) in enumerate(zip(chs, ks, exps)):
                stride = st_strides[si] if ui == 0 else 1
                if si == 0:
                    x = _DwsConvUnit(
                        in_ch, ch, stride, dtype=self.dtype, name=f"s{si+1}_u{ui+1}"
                    )(x)
                else:
                    x = _InvResUnit(
                        in_ch, ch, k, stride, e, dtype=self.dtype,
                        name=f"s{si+1}_u{ui+1}",
                    )(x)
                in_ch = ch
            if si > 0:
                outs.append(x)
        return outs


class _SeparableConvBN(nn.Module):
    """BiFPN node conv: depthwise 3x3 SAME + pointwise 1x1 + BN.

    bifpn.py:12-52 conv{3..7}_{up,down}; SAME padding per the module
    docstring note (upstream efficientdet.py SeparableConvBlock:149-188).
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, (3, 3), padding="SAME",
            feature_group_count=self.features, use_bias=False,
            dtype=self.dtype, name="dw",
        )(x)
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="pw")(x)
        return FrozenBatchNorm(self.features, name="bn")(x)


def _max_pool_s2_same(x):
    """MaxPool2d(3, 2) with TF SAME padding (bifpn.py:60-63)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")


def _upsample_to(x, out_h: int, out_w: int):
    """Nearest x2 upsample cropped to the target size (bifpn.py:55-58)."""
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return x[:, :out_h, :out_w]


class BiFPN(nn.Module):
    """One BiFPN cell: 5-level bidirectional FPN with fast attention.

    bifpn.py:7-271. first_time=True takes the 3 body maps (C3,C4,C5) and
    synthesizes P6/P7 by strided pooling; later repeats take 5 maps.
    attention=True uses the relu-normalized fast-attention blend
    (_forward_fast_attention :155-226); False is the unweighted sum
    (_forward :228-271).
    """

    out_channels: int
    first_time: bool = False
    attention: bool = True
    epsilon: float = 1e-4
    dtype: Dtype = jnp.float32

    def _blend(self, name: str, parts: List[jnp.ndarray]) -> jnp.ndarray:
        if not self.attention:
            return sum(parts)
        w = self.param(name, nn.initializers.ones, (len(parts),))
        w = nn.relu(w)
        w = w / (jnp.sum(w) + self.epsilon)
        return sum(w[i].astype(parts[i].dtype) * parts[i] for i in range(len(parts)))

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        dn = lambda c: nn.Sequential([
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype),
            FrozenBatchNorm(self.out_channels),
        ], name=c)
        if self.first_time:
            p3, p4, p5 = feats[-3:]
            p6_in = _max_pool_s2_same(dn("p5_to_p6")(p5))
            p7_in = _max_pool_s2_same(p6_in)
            p3_in = dn("p3_down_channel")(p3)
            p4_in = dn("p4_down_channel")(p4)
            p5_in = dn("p5_down_channel")(p5)
        else:
            p3_in, p4_in, p5_in, p6_in, p7_in = feats

        swish = jax.nn.silu
        conv = lambda name: _SeparableConvBN(self.out_channels, dtype=self.dtype, name=name)

        # top-down (P7 -> P3)
        p6_up = conv("conv6_up")(swish(self._blend(
            "p6_w1", [p6_in, _upsample_to(p7_in, *p6_in.shape[1:3])])))
        p5_up = conv("conv5_up")(swish(self._blend(
            "p5_w1", [p5_in, _upsample_to(p6_up, *p5_in.shape[1:3])])))
        p4_up = conv("conv4_up")(swish(self._blend(
            "p4_w1", [p4_in, _upsample_to(p5_up, *p4_in.shape[1:3])])))
        p3_out = conv("conv3_up")(swish(self._blend(
            "p3_w1", [p3_in, _upsample_to(p4_up, *p3_in.shape[1:3])])))

        if self.first_time:
            p4_in = dn("p4_down_channel_2")(p4)
            p5_in = dn("p5_down_channel_2")(p5)

        # bottom-up (P3 -> P7)
        p4_out = conv("conv4_down")(swish(self._blend(
            "p4_w2", [p4_in, p4_up, _max_pool_s2_same(p3_out)])))
        p5_out = conv("conv5_down")(swish(self._blend(
            "p5_w2", [p5_in, p5_up, _max_pool_s2_same(p4_out)])))
        p6_out = conv("conv6_down")(swish(self._blend(
            "p6_w2", [p6_in, p6_up, _max_pool_s2_same(p5_out)])))
        p7_out = conv("conv7_down")(swish(self._blend(
            "p7_w2", [p7_in, _max_pool_s2_same(p6_out)])))

        return p3_out, p4_out, p5_out, p6_out, p7_out


# EfficientDetBackbone compound tables (efficientdet.py:1229-1246)
_DET_BACKBONE = ["b0", "b1", "b2", "b3", "b4", "b5", "b6", "b6"]
_DET_FILTERS = [64, 88, 112, 160, 224, 288, 384, 384]
_DET_REPEATS = [3, 4, 5, 6, 7, 7, 8, 8]


class EffNetFPN(nn.Module):
    """EfficientNet-D backbone+BiFPN stack (efficientdet.py EffNetFPN:1193-1216).

    start_from=3 feeds (C3,C4,C5); start_from=2 additionally keeps C2 as the
    finest level by shifting the pyramid one level down (the reference's
    conv_channel_coef2345 variant). Output: 5 maps at self.out_channels.
    """

    compound_coef: int = 0
    start_from: int = 3
    dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        return _DET_FILTERS[self.compound_coef]

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        assert self.start_from in (2, 3)
        body = EfficientNet(
            version=_DET_BACKBONE[self.compound_coef], dtype=self.dtype, name="body"
        )
        c2, c3, c4, c5 = body(x, deterministic=deterministic)
        feats = (c2, c3, c4) if self.start_from == 2 else (c3, c4, c5)
        filters = _DET_FILTERS[self.compound_coef]
        attention = self.compound_coef < 6
        for i in range(_DET_REPEATS[self.compound_coef]):
            feats = BiFPN(
                out_channels=filters,
                first_time=(i == 0),
                attention=attention,
                dtype=self.dtype,
                name=f"bifpn{i}",
            )(feats)
        return list(feats)
