"""ROIAlign (v2, aligned=True) as an XLA gather+bilinear composite.

TPU-native replacement for the reference CUDA kernel
(maskrcnn_benchmark/csrc/cuda/ROIAlign_cuda.cu) / torchvision
`roi_align(aligned=True)` used via ROIAlignV2
(maskrcnn_benchmark/layers/roi_align.py:71-89). In MQ-Det this runs only in
the vision-query extraction path, pooling GT boxes from FPN maps.

Features are NHWC. Sampling grid matches torchvision `aligned=True`:
coordinates are scaled by `spatial_scale` then shifted by -0.5; each output
cell averages `sampling_ratio`^2 bilinear samples (adaptive ceil(roi/out)
when sampling_ratio=0).

Because XLA needs static shapes, the adaptive sampling count is replaced by a
static `sampling_ratio` grid (default 2, marginally different from the CUDA
adaptive rule for large ROIs; AP-neutral for 7x7 query pooling since samples
are averaged either way).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _bilinear_sample(feat: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Sample feat (H, W, C) at fractional (y, x) of shape (...,). Returns (..., C).

    Out-of-range samples return 0 (matching roi_align's boundary handling:
    y < -1 or y > H is zero; clamped inside otherwise).
    """
    h, w, _ = feat.shape
    oob = (y < -1.0) | (y > h * 1.0) | (x < -1.0) | (x > w * 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1, h - 1.0)
    x1 = jnp.minimum(x0 + 1, w - 1.0)
    ly, lx = y - y0, x - x0
    hy, hx = 1.0 - ly, 1.0 - lx

    flat = feat.reshape(-1, feat.shape[-1])

    def gather(yy, xx):
        idx = (yy * w + xx).astype(jnp.int32)
        return flat[idx]

    v = (
        gather(y0, x0) * (hy * hx)[..., None]
        + gather(y0, x1) * (hy * lx)[..., None]
        + gather(y1, x0) * (ly * hx)[..., None]
        + gather(y1, x1) * (ly * lx)[..., None]
    )
    return jnp.where(oob[..., None], 0.0, v)


@functools.partial(
    jax.jit, static_argnames=("output_size", "sampling_ratio")
)
def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """ROIAlign on a single feature map.

    Args:
      features: (H, W, C) one image's feature map (NHWC without batch)
      rois: (R, 4) xyxy boxes in input-image coordinates
      spatial_scale: feature stride reciprocal (e.g. 0.125 for P3)
      output_size: pooled spatial size (P)
      sampling_ratio: bilinear samples per output cell per axis

    Returns: (R, P, P, C)
    """
    p = output_size
    s = sampling_ratio

    x1 = rois[:, 0] * spatial_scale - 0.5
    y1 = rois[:, 1] * spatial_scale - 0.5
    x2 = rois[:, 2] * spatial_scale - 0.5
    y2 = rois[:, 3] * spatial_scale - 0.5
    roi_w = x2 - x1
    roi_h = y2 - y1

    bin_w = roi_w / p  # (R,)
    bin_h = roi_h / p

    # sample offsets inside each bin: (iy + 0.5) / s for iy in range(s)
    offs = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s  # (s,)
    cell = jnp.arange(p, dtype=jnp.float32)  # (p,)

    # y coords: (R, p, s) = y1 + (cell + off) * bin_h
    ys = y1[:, None, None] + (cell[None, :, None] + offs[None, None, :]) * bin_h[:, None, None]
    xs = x1[:, None, None] + (cell[None, :, None] + offs[None, None, :]) * bin_w[:, None, None]

    # full grid (R, p, s, p, s)
    yy = jnp.broadcast_to(ys[:, :, :, None, None], ys.shape + (p, s))
    xx = jnp.broadcast_to(xs[:, None, None, :, :], (xs.shape[0], p, s, p, s))

    vals = _bilinear_sample(features, yy, xx)  # (R, p, s, p, s, C)
    return vals.mean(axis=(2, 4))  # average over sampling grid -> (R, p, p, C)


def multi_level_roi_align(
    features: list,
    rois: jnp.ndarray,
    spatial_scales: tuple,
    output_size: int = 7,
    canonical_scale: int = 224,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """FPN level-mapped pooling: the reference `Pooler` + `LevelMapper`
    (maskrcnn_benchmark/modeling/poolers.py:11-130).

    Each ROI is pooled from the level selected by the FPN paper heuristic
    target_lvl = floor(canonical_level + log2(sqrt(area) / canonical_scale)).
    Implemented fixed-shape: pool every ROI at EVERY level, then select.

    Returns: (R, P, P, C)
    """
    num_levels = len(features)
    # LevelMapper with k_min=log2(1/scales[0]) etc.
    lvl_min = -jnp.log2(jnp.asarray(spatial_scales[0]))
    area = (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1])
    scale = jnp.sqrt(jnp.maximum(area, 1e-6))
    target = jnp.floor(canonical_level + jnp.log2(scale / canonical_scale + 1e-6))
    target = jnp.clip(target, lvl_min, lvl_min + num_levels - 1) - lvl_min  # 0-based

    pooled = jnp.stack(
        [
            roi_align(f, rois, sc, output_size)
            for f, sc in zip(features, spatial_scales)
        ],
        axis=0,
    )  # (L, R, P, P, C)
    sel = target.astype(jnp.int32)
    return jnp.take_along_axis(
        pooled, sel[None, :, None, None, None], axis=0
    )[0]


def all_level_roi_align(features, rois, spatial_scales, output_size=7):
    """CustomPooler (poolers.py:133-168): pool every ROI from ALL levels.

    Returns: (L, R, P, P, C)
    """
    return jnp.stack(
        [roi_align(f, rois, sc, output_size) for f, sc in zip(features, spatial_scales)],
        axis=0,
    )


@functools.partial(jax.jit, static_argnames=("output_size",))
def roi_pool(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
) -> jnp.ndarray:
    """ROIPool (max pooling) — csrc/cuda/ROIPool_cuda.cu twin.

    Unused by MQ-Det configs (SURVEY.md §2.4) but part of the reference's op
    surface. Quantized bin boundaries, max over each bin, implemented as a
    dense masked max over the feature map (fixed shape; fine for the small
    ROI counts this op serves).
    """
    h, w, c = features.shape
    p = output_size
    x1 = jnp.round(rois[:, 0] * spatial_scale)
    y1 = jnp.round(rois[:, 1] * spatial_scale)
    x2 = jnp.round(rois[:, 2] * spatial_scale)
    y2 = jnp.round(rois[:, 3] * spatial_scale)
    roi_w = jnp.maximum(x2 - x1 + 1.0, 1.0)
    roi_h = jnp.maximum(y2 - y1 + 1.0, 1.0)
    bin_w = roi_w / p
    bin_h = roi_h / p

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)

    def one_roi(xx1, yy1, bw, bh):
        # bin index of each pixel row/col relative to the roi, or -1 outside
        def bins(coords, start, size, count):
            idx = jnp.floor((coords - start) / size)
            inside = (coords >= start) & (idx < count) & (idx >= 0)
            return jnp.where(inside, idx, -1.0)

        ybin = bins(ys, yy1, bh, p)  # (H,)
        xbin = bins(xs, xx1, bw, p)  # (W,)
        out = jnp.full((p, p, c), -jnp.inf)
        for py in range(p):
            row_mask = ybin == py
            for px in range(p):
                m = row_mask[:, None] & (xbin == px)[None, :]
                v = jnp.where(m[..., None], features, -jnp.inf).max(axis=(0, 1))
                out = out.at[py, px].set(v)
        return jnp.where(jnp.isfinite(out), out, 0.0)

    return jax.vmap(one_roi)(x1, y1, bin_w, bin_h)
