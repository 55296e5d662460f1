"""Pure-functional box operations (JAX).

Replaces the reference's `BoxList` methods and `BoxCoder`
(maskrcnn_benchmark/structures/bounding_box.py:9-286,
 maskrcnn_benchmark/modeling/rpn/vldyhead.py:52-108) with fixed-shape
array functions. All boxes are xyxy float32 unless stated otherwise.

The reference uses the legacy Detectron "+1" convention (TO_REMOVE=1) in its
box coder and IoU; we reproduce it exactly for AP parity.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

# Detectron legacy: width = x2 - x1 + 1
TO_REMOVE = 1.0
BBOX_XFORM_CLIP = math.log(1000.0 / 16)
# encode/decode weights, vldyhead.py:70 / :90
BOX_CODER_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area with the legacy +1 convention (bounding_box.py area 'xyxy')."""
    return (boxes[..., 2] - boxes[..., 0] + TO_REMOVE) * (
        boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    )


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU, legacy +1 convention (structures/boxlist_ops.boxlist_iou).

    a: (N, 4), b: (M, 4) -> (N, M)
    """
    area_a = box_area(a)  # (N,)
    area_b = box_area(b)  # (M,)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])  # (N, M, 2)
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt + TO_REMOVE, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def box_iou_aligned(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Element-wise IoU of aligned box arrays (..., 4)."""
    area_a = box_area(a)
    area_b = box_area(b)
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt + TO_REMOVE, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a + area_b - inter)


def encode(gt_boxes: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """BoxCoder.encode (vldyhead.py:58-77): xyxy -> (dx,dy,dw,dh) targets."""
    wx, wy, ww, wh = BOX_CODER_WEIGHTS
    ex_w = anchors[..., 2] - anchors[..., 0] + TO_REMOVE
    ex_h = anchors[..., 3] - anchors[..., 1] + TO_REMOVE
    ex_cx = (anchors[..., 2] + anchors[..., 0]) * 0.5
    ex_cy = (anchors[..., 3] + anchors[..., 1]) * 0.5

    gt_w = gt_boxes[..., 2] - gt_boxes[..., 0] + TO_REMOVE
    gt_h = gt_boxes[..., 3] - gt_boxes[..., 1] + TO_REMOVE
    gt_cx = (gt_boxes[..., 2] + gt_boxes[..., 0]) * 0.5
    gt_cy = (gt_boxes[..., 3] + gt_boxes[..., 1]) * 0.5

    return jnp.stack(
        [
            wx * (gt_cx - ex_cx) / ex_w,
            wy * (gt_cy - ex_cy) / ex_h,
            ww * jnp.log(gt_w / ex_w),
            wh * jnp.log(gt_h / ex_h),
        ],
        axis=-1,
    )


def decode(preds: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """BoxCoder.decode (vldyhead.py:79-108): deltas + anchors -> xyxy."""
    wx, wy, ww, wh = BOX_CODER_WEIGHTS
    widths = anchors[..., 2] - anchors[..., 0] + TO_REMOVE
    heights = anchors[..., 3] - anchors[..., 1] + TO_REMOVE
    ctr_x = (anchors[..., 2] + anchors[..., 0]) * 0.5
    ctr_y = (anchors[..., 3] + anchors[..., 1]) * 0.5

    dx = preds[..., 0] / wx
    dy = preds[..., 1] / wy
    dw = jnp.clip(preds[..., 2] / ww, max=BBOX_XFORM_CLIP)
    dh = jnp.clip(preds[..., 3] / wh, max=BBOX_XFORM_CLIP)

    pred_cx = dx * widths + ctr_x
    pred_cy = dy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights

    return jnp.stack(
        [
            pred_cx - 0.5 * (pred_w - TO_REMOVE),
            pred_cy - 0.5 * (pred_h - TO_REMOVE),
            pred_cx + 0.5 * (pred_w - TO_REMOVE),
            pred_cy + 0.5 * (pred_h - TO_REMOVE),
        ],
        axis=-1,
    )


def clip_to_image(boxes: jnp.ndarray, height, width) -> jnp.ndarray:
    """BoxList.clip_to_image (bounding_box.py:223-232): clamp to [0, size-1]."""
    x1 = jnp.clip(boxes[..., 0], 0.0, width - TO_REMOVE)
    y1 = jnp.clip(boxes[..., 1], 0.0, height - TO_REMOVE)
    x2 = jnp.clip(boxes[..., 2], 0.0, width - TO_REMOVE)
    y2 = jnp.clip(boxes[..., 3], 0.0, height - TO_REMOVE)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def remove_small_boxes_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """Validity mask of boxlist_ops.remove_small_boxes (keep ws/hs >= min)."""
    ws = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    hs = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    return (ws >= min_size) & (hs >= min_size)


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], -1)


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], -1)


def giou(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Generalized IoU of aligned xyxy boxes (loss.py GIoULoss semantics).

    Note: the reference GIoULoss computes areas WITHOUT the +1 convention
    (loss.py:612-655); we match that here.
    """
    px1, py1 = pred[..., 0], pred[..., 1]
    px2 = jnp.maximum(px1, pred[..., 2])
    py2 = jnp.maximum(py1, pred[..., 3])
    pred_area = (px2 - px1) * (py2 - py1)

    tx1, ty1, tx2, ty2 = target[..., 0], target[..., 1], target[..., 2], target[..., 3]
    target_area = (tx2 - tx1) * (ty2 - ty1)

    ix1 = jnp.maximum(px1, tx1)
    iy1 = jnp.maximum(py1, ty1)
    ix2 = jnp.minimum(px2, tx2)
    iy2 = jnp.minimum(py2, ty2)
    mask = (iy2 > iy1) & (ix2 > ix1)
    inter = jnp.where(mask, (ix2 - ix1) * (iy2 - iy1), 0.0)

    ex1 = jnp.minimum(px1, tx1)
    ey1 = jnp.minimum(py1, ty1)
    ex2 = jnp.maximum(px2, tx2)
    ey2 = jnp.maximum(py2, ty2)
    enclose = (ex2 - ex1) * (ey2 - ey1) + eps

    union = pred_area + target_area - inter + eps
    ious = inter / union
    return ious - (enclose - union) / enclose


def expand_boxes(boxes: jnp.ndarray, ratio: float, height, width) -> jnp.ndarray:
    """expand_bbox (generalized_vl_rcnn_new.py:32-49): scale boxes about their
    center by `ratio`, clipped to the image."""
    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5
    half_w = (boxes[..., 2] - boxes[..., 0]) * 0.5 * ratio
    half_h = (boxes[..., 3] - boxes[..., 1]) * 0.5 * ratio
    out = jnp.stack([cx - half_w, cy - half_h, cx + half_w, cy + half_h], axis=-1)
    return clip_to_image(out, height, width)
