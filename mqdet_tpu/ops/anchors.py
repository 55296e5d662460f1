"""Anchor generation (host-side, static per image bucket).

Reproduces the reference AnchorGenerator
(maskrcnn_benchmark/modeling/rpn/anchor_generator.py:35-183, 356-425):
Detectron-style cell anchors (round-to-int ratio enumeration, +1 convention)
shifted over each FPN level grid. For GLIP configs: sizes (64..1024), strides
(8..128), 1 aspect ratio x 1 scale -> 1 anchor per location.

Anchors depend only on the (static) padded feature grid sizes, so they are
precomputed in numpy and closed over by the jitted forward.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def _whctrs(anchor):
    w = anchor[2] - anchor[0] + 1
    h = anchor[3] - anchor[1] + 1
    return w, h, anchor[0] + 0.5 * (w - 1), anchor[1] + 0.5 * (h - 1)


def _mkanchors(ws, hs, x_ctr, y_ctr):
    ws = ws[:, None]
    hs = hs[:, None]
    return np.hstack(
        [
            x_ctr - 0.5 * (ws - 1),
            y_ctr - 0.5 * (hs - 1),
            x_ctr + 0.5 * (ws - 1),
            y_ctr + 0.5 * (hs - 1),
        ]
    )


def _ratio_enum(anchor, ratios):
    w, h, x_ctr, y_ctr = _whctrs(anchor)
    size = w * h
    size_ratios = size / ratios
    ws = np.round(np.sqrt(size_ratios))
    hs = np.round(ws * ratios)
    return _mkanchors(ws, hs, x_ctr, y_ctr)


def _scale_enum(anchor, scales):
    w, h, x_ctr, y_ctr = _whctrs(anchor)
    return _mkanchors(w * scales, h * scales, x_ctr, y_ctr)


def cell_anchors(stride: int, sizes: Sequence[float], aspect_ratios: Sequence[float]) -> np.ndarray:
    """generate_anchors (anchor_generator.py:356-379)."""
    scales = np.array(sizes, dtype=float) / stride
    anchor = np.array([1, 1, stride, stride], dtype=float) - 1
    anchors = _ratio_enum(anchor, np.array(aspect_ratios, dtype=float))
    return np.vstack([_scale_enum(anchors[i, :], scales) for i in range(anchors.shape[0])])


def grid_anchors(
    grid_sizes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    sizes: Sequence[float],
    aspect_ratios: Sequence[float] = (1.0,),
) -> List[np.ndarray]:
    """Per-level (H*W*A, 4) anchor arrays (anchor_generator.py:73-95).

    `sizes` has one entry (or tuple of entries) per level.
    """
    out = []
    for (gh, gw), stride, size in zip(grid_sizes, strides, sizes):
        size_t = size if isinstance(size, (tuple, list)) else (size,)
        base = cell_anchors(stride, size_t, aspect_ratios).astype(np.float32)
        shifts_x = np.arange(0, gw * stride, step=stride, dtype=np.float32)
        shifts_y = np.arange(0, gh * stride, step=stride, dtype=np.float32)
        sx, sy = np.meshgrid(shifts_x, shifts_y)
        shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
        out.append((shifts[:, None, :] + base[None, :, :]).reshape(-1, 4))
    return out


def anchors_for_fpn(
    image_hw: Tuple[int, int],
    strides: Sequence[int] = (8, 16, 32, 64, 128),
    sizes: Sequence[float] = (64, 128, 256, 512, 1024),
    aspect_ratios: Sequence[float] = (1.0,),
) -> List[np.ndarray]:
    """Anchors for an FPN pyramid over a padded image of size (H, W)."""
    h, w = image_hw
    grid_sizes = [(-(-h // s), -(-w // s)) for s in strides]
    return grid_anchors(grid_sizes, strides, sizes, aspect_ratios)
