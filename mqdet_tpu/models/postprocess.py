"""ATSS post-processing as a fixed-shape XLA program.

Capability twin of ATSSPostProcessor
(maskrcnn_benchmark/modeling/rpn/inference.py:592-851):
  per level:  sigmoid(dot logits) -> class scores via the positive-map
              aggregation (MEAN over each class's token span), threshold,
              top-k, box decode, clip, min-size filter;
  merged:     class-aware NMS then cap at DETECTIONS_PER_IMG.

TPU-first re-design:
  * `convert_grounding_to_od_logits`'s per-class python loop
    (inference.py:772-790) becomes ONE matmul with a host-precomputed
    (C, T) aggregation matrix: MEAN -> rows hold 1/|span|; MAX is kept as a
    masked max. This also subsumes the MDETR_STYLE_AGGREGATE_CLASS_NUM=3000
    sparse-class trick — chunk-local class slots are remapped host-side.
  * dynamic candidate selection becomes masked top-k on a static K.
  * the reference's kthvalue cap after NMS equals taking the first
    DETECTIONS_PER_IMG boxes our greedy NMS emits (it emits in score order).
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mqdet_tpu.core import boxes as box_ops
from mqdet_tpu.core.detections import Detections
from mqdet_tpu.ops.nms import class_aware_nms_matrix

NEG_INF = jnp.finfo(jnp.float32).min


class PostprocessParams(NamedTuple):
    pre_nms_thresh: float = 0.05
    pre_nms_top_n: int = 1000
    nms_thresh: float = 0.6
    detections_per_img: int = 100
    min_size: float = 0.0
    score_agg: str = "MEAN"


def build_agg_map(
    label_token_spans: List[List[int]], max_text_len: int
) -> np.ndarray:
    """Host-side: (C, T) MEAN-aggregation matrix from per-class token indices.

    label_token_spans[c] lists token positions of class slot c in the caption
    (positive_map_label_to_token values, engine/inference.py:212-283).
    """
    c = len(label_token_spans)
    m = np.zeros((c, max_text_len), np.float32)
    for j, span in enumerate(label_token_spans):
        if len(span):
            m[j, span] = 1.0 / len(span)
    return m


def _level_candidates(
    bbox_reg: jnp.ndarray,       # (HW, 4)
    centerness: jnp.ndarray,     # (HW,)
    dot_logits: jnp.ndarray,     # (HW, T)
    anchors: jnp.ndarray,        # (HW, 4)
    agg_map: jnp.ndarray,        # (C, T)
    image_h, image_w,
    p: PostprocessParams,
):
    """One level, one image -> top pre_nms_top_n candidates (fixed shape)."""
    probs = jax.nn.sigmoid(dot_logits.astype(jnp.float32))
    scores = probs @ agg_map.T  # (HW, C) MEAN aggregation
    candidate = scores > p.pre_nms_thresh
    ctr = jax.nn.sigmoid(centerness.astype(jnp.float32))
    ranked = scores * ctr[:, None]

    masked = jnp.where(candidate, ranked, NEG_INF)  # (HW, C)
    hw, num_classes = masked.shape
    k = min(p.pre_nms_top_n, hw * num_classes)

    # Exact top-k in two stages (vs one top_k over HW*C ~= 672k lanes at P3,
    # which dominates postproc time on TPU): every flat entry in the global
    # top-k must lie in one of the top-k POSITIONS ranked by per-position
    # max score — at most k entries >= the k-th value, hence at most k
    # distinct positions hold any of them. So: cheap max-reduce over classes,
    # top-k over HW positions, gather those rows, small flat top-k. Exact up
    # to float ties (the reference's torch.topk breaks ties by index too).
    k_pos = min(k, hw)
    _, pos_idx = jax.lax.top_k(masked.max(axis=1), k_pos)  # (k_pos,)
    rows = masked[pos_idx]  # (k_pos, C)
    top_scores, flat_idx = jax.lax.top_k(
        rows.reshape(-1), min(k, k_pos * num_classes)
    )
    loc = pos_idx[flat_idx // num_classes]
    cls = flat_idx % num_classes + 1  # 1-based labels

    boxes = box_ops.decode(bbox_reg[loc].astype(jnp.float32), anchors[loc])
    boxes = box_ops.clip_to_image(boxes, image_h, image_w)
    valid = (top_scores > NEG_INF / 2) & box_ops.remove_small_boxes_mask(
        boxes, p.min_size
    )
    scores_out = jnp.sqrt(jnp.maximum(top_scores, 0.0))
    return boxes, scores_out, cls.astype(jnp.int32), valid


def atss_postprocess_single(
    bbox_reg_levels: List[jnp.ndarray],    # [(HW, 4)]
    centerness_levels: List[jnp.ndarray],  # [(HW,)]
    dot_logits_levels: List[jnp.ndarray],  # [(HW, T)]
    anchors_levels: List[jnp.ndarray],     # [(HW, 4)]
    agg_map: jnp.ndarray,
    image_h,
    image_w,
    p: PostprocessParams,
) -> Detections:
    """Post-process one image across all pyramid levels."""
    parts = [
        _level_candidates(br, ct, dl, an, agg_map, image_h, image_w, p)
        for br, ct, dl, an in zip(
            bbox_reg_levels, centerness_levels, dot_logits_levels, anchors_levels
        )
    ]
    boxes = jnp.concatenate([x[0] for x in parts])
    scores = jnp.concatenate([x[1] for x in parts])
    labels = jnp.concatenate([x[2] for x in parts])
    valid = jnp.concatenate([x[3] for x in parts])

    keep_idx, keep_valid = class_aware_nms_matrix(
        boxes, jnp.where(valid, scores, NEG_INF), labels, valid,
        p.nms_thresh, p.detections_per_img,
    )
    return Detections(
        boxes=boxes[keep_idx],
        scores=jnp.where(keep_valid, scores[keep_idx], 0.0),
        labels=jnp.where(keep_valid, labels[keep_idx], 0),
        valid=keep_valid,
    )


def atss_postprocess(
    head_out: dict,
    anchors_levels: List[jnp.ndarray],
    agg_map: jnp.ndarray,
    image_sizes: jnp.ndarray,  # (B, 2) (h, w) actual sizes
    p: PostprocessParams,
) -> Detections:
    """Batched post-processing. head_out is the VLDyHead output dict."""
    b = head_out["bbox_reg"][0].shape[0]
    bbox = [x.reshape(b, -1, 4) for x in head_out["bbox_reg"]]
    ctr = [x.reshape(b, -1) for x in head_out["centerness"]]
    dot = head_out["dot_product_logits"]

    if agg_map.ndim == 2:
        agg_map = jnp.broadcast_to(agg_map[None], (b,) + agg_map.shape)

    def single(bbox_i, ctr_i, dot_i, agg_i, size_i):
        return atss_postprocess_single(
            bbox_i, ctr_i, dot_i, anchors_levels, agg_i, size_i[0], size_i[1], p
        )

    return jax.vmap(single)(bbox, ctr, dot, agg_map, image_sizes)
