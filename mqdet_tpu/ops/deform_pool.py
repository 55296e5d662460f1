"""Deformable (modulated) PSRoI pooling — XLA composite.

TPU-native equivalent of the reference CUDA kernel
(maskrcnn_benchmark/csrc/cuda/deform_pool_kernel_cuda.cu:55-140,
layers/deform_pool.py). Unused by the shipped MQ-Det configs (SURVEY §2.4
"parity-optional") but part of the reference op surface.

Semantics (forward, matching the CUDA kernel exactly):
  * ROI coords are rounded to ints, scaled by spatial_scale and shifted -0.5;
    width/height floored at 0.1.
  * Each pooled bin (ph, pw) is shifted by a learned per-part offset
    trans[class, :, part_h, part_w] * trans_std * roi_size.
  * The bin averages sample_per_part^2 bilinear samples; samples outside
    (-0.5, size-0.5) are EXCLUDED from the count (not zero-averaged).
  * Position-sensitive channels: output channel ctop reads input channel
    (ctop * group_size + gh) * group_size + gw where (gh, gw) is the bin's
    group cell.

Features are NHWC with C = output_dim * group_size^2.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(
    jax.jit,
    static_argnames=(
        "output_dim", "pooled_size", "group_size", "part_size",
        "sample_per_part", "no_trans",
    ),
)
def deform_psroi_pool(
    features: jnp.ndarray,            # (B, H, W, C)
    rois: jnp.ndarray,                # (N, 5) [batch, x1, y1, x2, y2]
    trans: jnp.ndarray | None = None, # (N, num_classes, 2, part, part)
    spatial_scale: float = 1.0,
    output_dim: int = 256,
    pooled_size: int = 7,
    group_size: int = 1,
    part_size: int | None = None,
    sample_per_part: int = 4,
    trans_std: float = 0.1,
    no_trans: bool = False,
) -> jnp.ndarray:
    """Returns (N, pooled, pooled, output_dim)."""
    b, h, w, c = features.shape
    gs = group_size
    ps = pooled_size
    part = part_size or ps
    assert c == output_dim * gs * gs, (c, output_dim, gs)
    n = rois.shape[0]
    num_classes = 1 if no_trans or trans is None else trans.shape[1]
    ch_each = output_dim // num_classes

    if trans is None:
        trans = jnp.zeros((n, num_classes, 2, part, part), features.dtype)

    # (ps,) static bin metadata (host-side numpy; ps is static)
    phw_np = np.arange(ps, dtype=np.float32)
    part_idx = jnp.asarray(np.floor(phw_np / ps * part).astype(np.int32))
    g_idx = np.clip((phw_np * gs / ps).astype(np.int32), 0, gs - 1)  # np (ps,)
    phw = jnp.asarray(phw_np)

    sub = (jnp.arange(sample_per_part, dtype=jnp.float32))

    def one_roi(roi, tr):
        batch = roi[0].astype(jnp.int32)
        x1 = jnp.round(roi[1]) * spatial_scale - 0.5
        y1 = jnp.round(roi[2]) * spatial_scale - 0.5
        x2 = (jnp.round(roi[3]) + 1.0) * spatial_scale - 0.5
        y2 = (jnp.round(roi[4]) + 1.0) * spatial_scale - 0.5
        rw = jnp.maximum(x2 - x1, 0.1)
        rh = jnp.maximum(y2 - y1, 0.1)
        bw, bh = rw / ps, rh / ps
        sbw, sbh = bw / sample_per_part, bh / sample_per_part

        feat = features[batch]  # (H, W, C)

        # per class: trans lookup per bin -> (cls, ps, ps)
        tx = tr[:, 0][:, part_idx[:, None], part_idx[None, :]] * trans_std  # (cls, ps, ps)
        ty = tr[:, 1][:, part_idx[:, None], part_idx[None, :]] * trans_std

        # sample grid per bin: (cls, ps, ps, sp, sp)
        wstart = phw[None, None, :] * bw + x1 + tx * rw  # (cls, ps, ps)
        hstart = phw[None, :, None] * bh + y1 + ty * rh
        sx = wstart[..., None, None] + (sub * sbw)[None, None, None, None, :]
        sy = hstart[..., None, None] + (sub * sbh)[None, None, None, :, None]
        sx = jnp.broadcast_to(sx, sx.shape[:3] + (sample_per_part, sample_per_part))
        sy = jnp.broadcast_to(sy, sy.shape[:3] + (sample_per_part, sample_per_part))

        valid = (
            (sx >= -0.5) & (sx <= w - 0.5) & (sy >= -0.5) & (sy <= h - 0.5)
        )
        xq = jnp.clip(sx, 0.0, w - 1.0)
        yq = jnp.clip(sy, 0.0, h - 1.0)

        # bilinear gather for every sample, all channels at once: (..., C)
        x0 = jnp.floor(xq); y0 = jnp.floor(yq)
        x1c = jnp.minimum(x0 + 1, w - 1.0); y1c = jnp.minimum(y0 + 1, h - 1.0)
        dx = xq - x0; dy = yq - y0
        flat = feat.reshape(h * w, c)

        def g(yy, xx):
            idx = (yy.astype(jnp.int32) * w + xx.astype(jnp.int32)).reshape(-1)
            return flat[idx].reshape(yy.shape + (c,))

        val = (
            g(y0, x0) * ((1 - dy) * (1 - dx))[..., None]
            + g(y0, x1c) * ((1 - dy) * dx)[..., None]
            + g(y1c, x0) * (dy * (1 - dx))[..., None]
            + g(y1c, x1c) * (dy * dx)[..., None]
        )  # (cls, ps, ps, sp, sp, C)
        val = val * valid[..., None]
        cnt = valid.sum(axis=(-1, -2)).astype(features.dtype)  # (cls, ps, ps)
        ssum = val.sum(axis=(3, 4))  # (cls, ps, ps, C)
        avg = ssum / jnp.maximum(cnt, 1.0)[..., None]

        # position-sensitive channel select: out channel ctop reads input
        # channel (ctop*gs + gh)*gs + gw with class_id = ctop // ch_each;
        # static gathers per bin (ps <= 7, gs typically 1)
        ctop = np.arange(output_dim)
        cls_of = jnp.asarray(ctop // ch_each)  # (Cout,)
        rows = []
        for ph in range(ps):
            cols = []
            for pw in range(ps):
                a = avg[:, ph, pw, :]        # (cls, C)
                ci = jnp.asarray((ctop * gs + int(g_idx[ph])) * gs + int(g_idx[pw]))
                cols.append(a[cls_of, ci])   # (Cout,)
            rows.append(jnp.stack(cols))
        return jnp.stack(rows)  # (ps, ps, Cout)

    return jax.vmap(one_roi)(rois.astype(jnp.float32), trans.astype(jnp.float32))
