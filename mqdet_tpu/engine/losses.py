"""ATSS matching + GLIP losses as fixed-shape XLA programs.

Capability twin of ATSSLossComputation
(maskrcnn_benchmark/modeling/rpn/loss.py:519-1203): ATSS anchor assignment
(per-level top-9 by center distance, IoU mean+std threshold, center-in-gt),
token sigmoid focal loss on the dot-product logits, GIoU regression weighted
by centerness targets, centerness BCE, plus MQ-Det's gate regularization
(generalized_vl_rcnn_new.py:486-504) and the MLM loss.

Fixed-shape design: GT boxes arrive padded to MAX_GT with a validity mask;
all argmax/threshold logic is masked instead of ragged. Normalizers are
GLOBAL sums — under pjit with a sharded batch this reproduces the reference's
cross-GPU `num_pos_avg_per_gpu` reduction exactly (sum(loss)/sum(pos)).
"""
from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp

from mqdet_tpu.core import boxes as box_ops
from mqdet_tpu.ops.focal_loss import token_sigmoid_binary_focal_loss

INF = 1e8


class ATSSTargets(NamedTuple):
    cls_labels: jnp.ndarray     # (N,) int32, 0 = background
    reg_targets: jnp.ndarray    # (N, 4)
    token_labels: jnp.ndarray   # (N, T)
    matched_gt: jnp.ndarray     # (N,) index of matched gt (0 if none)


def atss_match(
    anchors: jnp.ndarray,        # (N, 4) all levels concatenated
    level_sizes: tuple,          # static per-level anchor counts
    gt_boxes: jnp.ndarray,       # (G, 4) padded
    gt_labels: jnp.ndarray,      # (G,)
    gt_valid: jnp.ndarray,       # (G,) bool
    gt_token_map: jnp.ndarray,   # (G, T) normalized positive map rows
    topk: int = 9,
    num_anchors_per_loc: int = 1,
) -> ATSSTargets:
    """ATSS assignment for one image (loss.py:655-838)."""
    n = anchors.shape[0]
    g = gt_boxes.shape[0]
    t_len = gt_token_map.shape[1]

    ious = box_ops.box_iou(anchors, gt_boxes)  # (N, G)
    ious = jnp.where(gt_valid[None, :], ious, -1.0)

    a_cx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    a_cy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    g_cx = (gt_boxes[:, 0] + gt_boxes[:, 2]) * 0.5
    g_cy = (gt_boxes[:, 1] + gt_boxes[:, 3]) * 0.5
    dist = jnp.sqrt((a_cx[:, None] - g_cx[None]) ** 2 + (a_cy[:, None] - g_cy[None]) ** 2)

    # per-level top-k closest anchors per gt -> candidate mask (N, G)
    candidate = jnp.zeros((n, g), bool)
    start = 0
    for size in level_sizes:
        k = min(topk * num_anchors_per_loc, size)
        d_level = dist[start : start + size]  # (size, G)
        _, idx = jax.lax.top_k(-d_level.T, k)  # (G, k) indices into level
        level_mask = jnp.zeros((g, size), bool)
        level_mask = level_mask.at[jnp.arange(g)[:, None], idx].set(True)
        candidate = candidate.at[start : start + size].set(level_mask.T)
        start += size

    # IoU threshold per gt: mean + unbiased std over candidates
    num_cand = candidate.sum(0)  # (G,) — static per level sum but fine
    cand_ious = jnp.where(candidate, ious, 0.0)
    mean = cand_ious.sum(0) / jnp.maximum(num_cand, 1)
    var = jnp.where(candidate, (ious - mean[None]) ** 2, 0.0).sum(0) / jnp.maximum(
        num_cand - 1, 1
    )
    thresh = mean + jnp.sqrt(var)

    is_pos = candidate & (ious >= thresh[None, :])

    # center of anchor inside gt (loss.py:758-768)
    l = a_cx[:, None] - gt_boxes[None, :, 0]
    t = a_cy[:, None] - gt_boxes[None, :, 1]
    r = gt_boxes[None, :, 2] - a_cx[:, None]
    b = gt_boxes[None, :, 3] - a_cy[:, None]
    inside = jnp.minimum(jnp.minimum(l, r), jnp.minimum(t, b)) > 0.01
    is_pos = is_pos & inside & gt_valid[None, :]

    ious_inf = jnp.where(is_pos, ious, -INF)
    matched_gt = jnp.argmax(ious_inf, axis=1)  # (N,)
    matched_iou = jnp.max(ious_inf, axis=1)
    is_matched = matched_iou > -INF / 2

    cls_labels = jnp.where(is_matched, gt_labels[matched_gt], 0)
    reg_targets = box_ops.encode(gt_boxes[matched_gt], anchors)

    token_labels = gt_token_map[matched_gt]
    unmatched = jnp.zeros((t_len,), token_labels.dtype).at[-1].set(1.0)
    token_labels = jnp.where(is_matched[:, None], token_labels, unmatched[None])

    return ATSSTargets(
        cls_labels=cls_labels.astype(jnp.int32),
        reg_targets=reg_targets,
        token_labels=token_labels,
        matched_gt=matched_gt,
    )


def centerness_targets(reg_targets: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """loss.py:840-855: sqrt((min/max l,r) * (min/max t,b)) of decoded gts."""
    gts = box_ops.decode(reg_targets, anchors)
    a_cx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    a_cy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    l = a_cx - gts[:, 0]
    t = a_cy - gts[:, 1]
    r = gts[:, 2] - a_cx
    b = gts[:, 3] - a_cy
    lr_min = jnp.minimum(l, r)
    lr_max = jnp.maximum(l, r)
    tb_min = jnp.minimum(t, b)
    tb_max = jnp.maximum(t, b)
    return jnp.sqrt(
        jnp.clip(lr_min / jnp.maximum(lr_max, 1e-8), 0.0)
        * jnp.clip(tb_min / jnp.maximum(tb_max, 1e-8), 0.0)
    )


def glip_losses(
    head_out: Dict,
    anchors: jnp.ndarray,          # (N, 4)
    level_sizes: tuple,
    gt_boxes: jnp.ndarray,         # (B, G, 4)
    gt_labels: jnp.ndarray,        # (B, G)
    gt_valid: jnp.ndarray,         # (B, G)
    gt_token_map: jnp.ndarray,     # (B, G, T)
    text_masks: jnp.ndarray,       # (B, T)
    topk: int = 9,
    reg_loss_weight: float = 2.0,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
) -> Dict[str, jnp.ndarray]:
    """Batched GLIP training losses (dot-product token + GIoU + centerness)."""
    b = gt_boxes.shape[0]
    bbox_reg = jnp.concatenate(
        [x.reshape(b, -1, 4) for x in head_out["bbox_reg"]], axis=1
    ).astype(jnp.float32)
    centerness = jnp.concatenate(
        [x.reshape(b, -1) for x in head_out["centerness"]], axis=1
    ).astype(jnp.float32)
    dot_logits = jnp.concatenate(head_out["dot_product_logits"], axis=1).astype(
        jnp.float32
    )  # (B, N, T)

    targets = jax.vmap(
        lambda bb, ll, vv, tm: atss_match(
            anchors, level_sizes, bb, ll, vv, tm, topk=topk
        )
    )(gt_boxes, gt_labels, gt_valid, gt_token_map)

    pos = targets.cls_labels > 0  # (B, N)
    total_pos = jnp.maximum(pos.sum(), 1.0)

    # token focal loss over dot-product logits (normalized by total positives)
    dp_loss = token_sigmoid_binary_focal_loss(
        dot_logits, targets.token_labels, text_masks,
        alpha=focal_alpha, gamma=focal_gamma,
    ) / total_pos

    # centerness + GIoU on positives
    ctr_t = jax.vmap(lambda rt: centerness_targets(rt, anchors))(targets.reg_targets)
    ctr_t = jnp.where(pos, ctr_t, 0.0)
    sum_ctr = jnp.maximum(ctr_t.sum(), 1e-6)

    pred_boxes = jax.vmap(lambda br: box_ops.decode(br, anchors))(bbox_reg)
    tgt_boxes = jax.vmap(lambda rt: box_ops.decode(rt, anchors))(targets.reg_targets)
    giou = box_ops.giou(pred_boxes, tgt_boxes)
    reg_loss = ((1.0 - giou) * ctr_t).sum() / sum_ctr * reg_loss_weight

    ctr_logits = centerness
    bce = (
        jnp.maximum(ctr_logits, 0)
        - ctr_logits * ctr_t
        + jnp.log1p(jnp.exp(-jnp.abs(ctr_logits)))
    )
    ctr_loss = jnp.where(pos, bce, 0.0).sum() / total_pos

    return {
        "loss_dot_product_token": dp_loss,
        "loss_reg": reg_loss,
        "loss_centerness": ctr_loss,
    }


def gate_loss_from_params(
    params,
    scale: float = 1.0,
    regularize: bool = False,
) -> jnp.ndarray:
    """MQ-Det gate loss (generalized_vl_rcnn_new.py:486-504).

    Collects every `ff_gate` / non-conditional `attn_gate` scalar in the
    parameter tree; loss = scale * mean(1 - |g|). Detached (analysis only)
    unless GATE_REGULARIZATION.
    """
    gates = []

    def visit(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if name.endswith("ff_gate") or name.endswith("attn_gate"):
            if leaf.ndim == 0:
                gates.append(leaf)

    jax.tree_util.tree_map_with_path(visit, params)
    if not gates:
        return jnp.zeros(())
    g = jnp.stack(gates)
    loss = scale * jnp.mean(1.0 - jnp.abs(g))
    return loss if regularize else jax.lax.stop_gradient(loss)


def mlm_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Cross entropy with ignore_index=-100 (vldyhead.py:1023-1025)."""
    valid = labels >= 0
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.where(valid, nll, 0.0).sum() / jnp.maximum(valid.sum(), 1)
