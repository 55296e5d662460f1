"""Common flax modules shared across the detector stacks.

TPU-native equivalents of maskrcnn_benchmark/layers/ (Scale, DYReLU, SE,
FrozenBatchNorm2d, DropPath/stochastic depth) and the GCP FeedForward
(modeling/language_backbone/modeling_bert_new.py:115-127). All convs are
NHWC; compute dtype is configurable (bf16 by default on TPU).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class Scale(nn.Module):
    """Learnable scalar multiplier (layers/scale.py)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.constant(self.init_value), ())
        return x * scale.astype(x.dtype)


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics (layers/batch_norm.py FrozenBatchNorm2d).

    Parameters are stored but never updated by batch statistics; acts as an
    affine transform folded from imported torch weights.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale * jax.lax.rsqrt(var + 1e-5)
        return x * inv + (bias - mean * inv)


def h_sigmoid(x, h_max: float = 1.0):
    """relu6(x + 3) * h_max / 6 (vldyhead.py:42-49)."""
    return jnp.clip(x + 3.0, 0.0, 6.0) * (h_max / 6.0)


class DYReLU(nn.Module):
    """Dynamic ReLU (layers/dyrelu.py DYReLU, as used by DyConv).

    Channel-wise piecewise-linear activation whose slopes/intercepts are
    predicted from globally-pooled features:
      coefficients = fc2(relu(fc1(avgpool(x)))) -> 2*k per channel
      y = max(a1 * x + b1, a2 * x + b2)
    with a1 in [1-lambda, 1+lambda] around init 1.0, a2 around 0, b ranges
    scaled by init values (lambda_a=1.0, K2=True, use_bias=True defaults).
    """

    channels: int
    reduction: int = 4
    lambda_a: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        theta = jnp.mean(x, axis=(1, 2))  # (B, C)
        squeeze = self.channels // self.reduction
        theta = nn.Dense(squeeze, dtype=self.dtype, name="fc1")(theta)
        theta = nn.relu(theta)
        theta = nn.Dense(self.channels * 4, dtype=self.dtype, name="fc2")(theta)
        theta = h_sigmoid(theta)

        a1, b1, a2, b2 = jnp.split(theta, 4, axis=-1)
        a1 = (a1 - 0.5) * 2 * self.lambda_a + 1.0
        a2 = (a2 - 0.5) * 2 * self.lambda_a
        b1 = b1 - 0.5
        b2 = b2 - 0.5
        a1 = a1[:, None, None, :]
        a2 = a2[:, None, None, :]
        b1 = b1[:, None, None, :]
        b2 = b2[:, None, None, :]
        return jnp.maximum(x * a1 + b1, x * a2 + b2)


class SELayer(nn.Module):
    """Squeeze-and-excitation (layers/se.py)."""

    channels: int
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2))
        s = nn.Dense(self.channels // self.reduction, dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Dense(self.channels, dtype=self.dtype)(s)
        s = jax.nn.sigmoid(s)
        return x * s[:, None, None, :]


class DropPath(nn.Module):
    """Stochastic depth per sample."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return x * mask / keep


class Mlp(nn.Module):
    """Transformer MLP: fc1 -> gelu -> fc2."""

    hidden_features: int
    out_features: int
    dtype: Dtype = jnp.float32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out_features, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class GCPFeedForward(nn.Module):
    """The GCP FeedForward (modeling_bert_new.py:115-127):
    LayerNorm -> Dense(inner, no bias) -> GELU -> Dense(out, no bias)."""

    dim: int
    mult: float = 4.0
    out_dim: Optional[int] = None
    zero_init_out: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult)
        out_dim = self.out_dim if self.out_dim is not None else self.dim
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="linear1")(x)
        x = nn.gelu(x, approximate=False)
        kernel_init = (
            nn.initializers.zeros if self.zero_init_out else nn.initializers.lecun_normal()
        )
        x = nn.Dense(
            out_dim, use_bias=False, dtype=self.dtype, kernel_init=kernel_init,
            name="linear2",
        )(x)
        return x


class ConvGN(nn.Module):
    """3x3 conv + GroupNorm (Conv3x3Norm with bn_type=('gn', 16))."""

    features: int
    stride: int = 1
    groups: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=1, dtype=self.dtype, name="conv",
        )(x)
        x = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype, name="gn")(x)
        return x


def avg_pool_2x(x):
    """AvgPool2d(2) on NHWC."""
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def _bilinear_matrix(in_size: int, out_size: int, align_corners: bool) -> "np.ndarray":
    """(out, in) interpolation matrix. Resampling-as-matmul: gathers are slow
    on TPU, but a resize is a linear map, so it rides the MXU as two small
    matmuls (rows then cols)."""
    import numpy as np

    m = np.zeros((out_size, in_size), np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    for o in range(out_size):
        if align_corners:
            pos = o * (in_size - 1) / max(out_size - 1, 1)
        else:
            pos = (o + 0.5) * in_size / out_size - 0.5
        pos = min(max(pos, 0.0), in_size - 1.0)
        lo = int(np.floor(pos))
        hi = min(lo + 1, in_size - 1)
        f = pos - lo
        m[o, lo] += 1.0 - f
        m[o, hi] += f
    return m


def resize_bilinear_matmul(x, out_h: int, out_w: int, align_corners: bool = True):
    """Bilinear resize of (B, H, W, C) via static interpolation matrices."""
    b, h, w, c = x.shape
    if h == out_h and w == out_w:
        return x
    wy = jnp.asarray(_bilinear_matrix(h, out_h, align_corners), x.dtype)
    wx = jnp.asarray(_bilinear_matrix(w, out_w, align_corners), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", wy, x, preferred_element_type=jnp.float32)
    y = jnp.einsum("pw,bowc->bopc", wx, y.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def upsample_bilinear(x, out_h: int, out_w: int):
    """F.upsample_bilinear (align_corners=True in legacy torch upsample_bilinear)."""
    return resize_bilinear_matmul(x, out_h, out_w, align_corners=True)
