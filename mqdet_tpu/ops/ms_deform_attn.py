"""Multi-scale deformable attention sampling (XLA composite).

TPU-native replacement for the reference CUDA kernel
(groundingdino_new/models/GroundingDINO/csrc_groundingdino/MsDeformAttn/
ms_deform_im2col_cuda.cuh) with the semantics of the pure-torch fallback
(ms_deform_attn.py:93-134): per query, 8 heads x 4 levels x 4 points of
bilinear samples over the flattened pyramid, combined with softmaxed
attention weights — F.grid_sample(align_corners=False, padding zeros) twin.

This is the gather-based composite (correct everywhere, CPU-testable); a
banded Pallas kernel for the encoder path (where queries = pixels and
offsets are local) is the planned fast path.
"""
from __future__ import annotations

import functools
import os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_sample_nhwc(feat: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """feat (H, W, C); x, y (...,) pixel coords; zeros padding. (..., C)."""
    h, w, _ = feat.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx, ly = x - x0, y - y0
    flat = feat.reshape(-1, feat.shape[-1])

    def corner(yy, xx):
        inb = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
        yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        v = flat[yc * w + xc]
        return jnp.where(inb[..., None], v, 0.0)

    return (
        corner(y0, x0) * ((1 - ly) * (1 - lx))[..., None]
        + corner(y0, x0 + 1) * ((1 - ly) * lx)[..., None]
        + corner(y0 + 1, x0) * (ly * (1 - lx))[..., None]
        + corner(y0 + 1, x0 + 1) * (ly * lx)[..., None]
    )


def ms_deform_attn_sample(
    value: jnp.ndarray,                 # (B, S, heads, head_dim)
    spatial_shapes: Sequence[Tuple[int, int]],  # static [(H, W)] per level
    sampling_locations: jnp.ndarray,    # (B, Q, heads, L, P, 2) in [0, 1]
    attention_weights: jnp.ndarray,     # (B, Q, heads, L, P) softmaxed
) -> jnp.ndarray:
    """Returns (B, Q, heads * head_dim)."""
    b, s, nh, hd = value.shape
    q = sampling_locations.shape[1]
    num_levels = len(spatial_shapes)
    num_points = sampling_locations.shape[4]

    outputs = jnp.zeros((b, q, nh, hd), jnp.float32)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v_l = value[:, start : start + h * w]  # (B, HW, nh, hd)
        v_l = v_l.transpose(0, 2, 1, 3).reshape(b * nh, h, w, hd)
        # grid_sample align_corners=False: pix = loc * size - 0.5
        loc = sampling_locations[:, :, :, lvl]  # (B, Q, nh, P, 2)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x = x.transpose(0, 2, 1, 3).reshape(b * nh, q, num_points)
        y = y.transpose(0, 2, 1, 3).reshape(b * nh, q, num_points)
        sampled = jax.vmap(_bilinear_sample_nhwc)(v_l, x, y)  # (B*nh, Q, P, hd)
        wgt = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3).reshape(
            b * nh, q, num_points
        )
        acc = (sampled * wgt[..., None].astype(sampled.dtype)).sum(axis=2)
        outputs = outputs + acc.reshape(b, nh, q, hd).transpose(0, 2, 1, 3)
        start += h * w

    return outputs.reshape(b, q, nh * hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _encoder_pallas_diff(spatial_shapes, interpret, value, loc, attn):
    from mqdet_tpu.ops.pallas.msda_pallas import ms_deform_attn_encoder

    return ms_deform_attn_encoder(
        value, spatial_shapes, loc, attn, interpret=interpret
    )


def _encoder_pallas_fwd(spatial_shapes, interpret, value, loc, attn):
    return _encoder_pallas_diff(spatial_shapes, interpret, value, loc, attn), (
        value, loc, attn,
    )


def _encoder_pallas_bwd(spatial_shapes, interpret, res, g):
    # gradient through the (unclipped) composite: matches the kernel
    # everywhere offsets stay inside the window, the same contract as the
    # DCNv2 window kernel (ops/pallas/deform_conv_pallas.py)
    value, loc, attn = res
    _, vjp = jax.vjp(
        lambda v, l, a: ms_deform_attn_sample(v, spatial_shapes, l, a),
        value, loc, attn,
    )
    return vjp(g)


_encoder_pallas_diff.defvjp(_encoder_pallas_fwd, _encoder_pallas_bwd)


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Implementation dispatch (MQDET_MSDA_IMPL=pallas|gather|
    pallas_interpret, default pallas): the banded window kernel
    (ops/pallas/msda_pallas.py) serves the encoder path — queries are the
    pyramid pixels — on TPU backends; the decoder path (few queries,
    arbitrary positions) and CPU runs use the gather composite.
    pallas_interpret forces the kernel in interpreter mode on any backend
    (testing only)."""
    impl = os.environ.get("MQDET_MSDA_IMPL", "pallas")
    q = sampling_locations.shape[1]
    s = value.shape[1]
    is_encoder = q == s == sum(h * w for h, w in spatial_shapes)
    on_accel = jax.default_backend() != "cpu" or impl == "pallas_interpret"
    if impl.startswith("pallas") and is_encoder and on_accel:
        return _encoder_pallas_diff(
            tuple((int(h), int(w)) for h, w in spatial_shapes),
            impl == "pallas_interpret",
            value, sampling_locations, attention_weights,
        )
    return ms_deform_attn_sample(
        value, spatial_shapes, sampling_locations, attention_weights
    )
