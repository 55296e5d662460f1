"""Losses + post-processors for the legacy (language-free) GLIP heads.

Capability twins of the reference loss/inference machinery for the
non-VLDyHead RPN registry entries:
  FCOS   -> modeling/rpn/loss.py FCOSLossComputation (:272-470) +
            modeling/rpn/inference.py FCOSPostProcessor
  RETINA -> modeling/rpn/loss.py RetinaNetLossComputation (:163-270) +
            RetinaNetPostProcessor
  ATSS   -> the class-logit variant of the ATSS machinery already built for
            VLDyHead (engine/losses.py atss_match, modeling/rpn/loss.py
            ATSSLossComputation)

TPU-first design: one fixed-shape padded GT array per image, vectorized
assignment (no per-gt python loops over dynamic counts), masked focal /
GIoU / BCE reductions, and a shared fixed-capacity ml_nms decode.
"""
from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mqdet_tpu.core import boxes as box_ops
from mqdet_tpu.core.detections import Detections
from mqdet_tpu.engine.losses import atss_match, centerness_targets
from mqdet_tpu.models.postprocess import PostprocessParams
from mqdet_tpu.ops.focal_loss import sigmoid_focal_loss
from mqdet_tpu.ops.nms import class_aware_nms_matrix

INF = 1e8
NEG_INF = -1e18

# FCOS per-level object size-of-interest ranges (loss.py:341-347)
FCOS_SIZE_RANGES = ((-1, 64), (64, 128), (128, 256), (256, 512), (512, INF))


# --------------------------------------------------------------------------
# FCOS
# --------------------------------------------------------------------------

def fcos_locations(
    image_hw: Tuple[int, int], strides: Tuple[int, ...]
) -> List[np.ndarray]:
    """Per-level (HW, 2) pixel centers (fcos.py compute_locations:
    shift + stride // 2)."""
    h, w = image_hw
    out = []
    for s in strides:
        ys = (np.arange(-(-h // s), dtype=np.float32)) * s + s // 2
        xs = (np.arange(-(-w // s), dtype=np.float32)) * s + s // 2
        gx, gy = np.meshgrid(xs, ys)
        out.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    return out


class FCOSTargets(NamedTuple):
    cls_labels: jnp.ndarray    # (N,) int32, 0 = background
    reg_targets: jnp.ndarray   # (N, 4) l/t/r/b distances
    centerness: jnp.ndarray    # (N,)


def fcos_match(
    locations: jnp.ndarray,       # (N, 2) all levels concatenated
    level_sizes: Tuple[int, ...],
    gt_boxes: jnp.ndarray,        # (G, 4) padded
    gt_labels: jnp.ndarray,       # (G,)
    gt_valid: jnp.ndarray,        # (G,) bool
) -> FCOSTargets:
    """compute_targets_for_locations (loss.py:397-452), vectorized:
    a location is positive for a gt iff it lies inside the box and
    max(l,t,r,b) falls in its level's size range; ties resolve to the
    minimum-area gt."""
    xs, ys = locations[:, 0], locations[:, 1]
    l = xs[:, None] - gt_boxes[None, :, 0]
    t = ys[:, None] - gt_boxes[None, :, 1]
    r = gt_boxes[None, :, 2] - xs[:, None]
    b = gt_boxes[None, :, 3] - ys[:, None]
    reg = jnp.stack([l, t, r, b], -1)          # (N, G, 4)
    inside = reg.min(-1) > 0
    max_reg = reg.max(-1)                       # (N, G)

    lo = jnp.concatenate(
        [jnp.full((s,), FCOS_SIZE_RANGES[i][0], jnp.float32)
         for i, s in enumerate(level_sizes)]
    )
    hi = jnp.concatenate(
        [jnp.full((s,), FCOS_SIZE_RANGES[i][1], jnp.float32)
         for i, s in enumerate(level_sizes)]
    )
    in_range = (max_reg >= lo[:, None]) & (max_reg <= hi[:, None])

    area = box_ops.box_area(gt_boxes)           # (G,)
    cand = inside & in_range & gt_valid[None, :]
    area_masked = jnp.where(cand, area[None, :], INF)
    matched = jnp.argmin(area_masked, -1)       # (N,)
    has_match = area_masked.min(-1) < INF

    cls_labels = jnp.where(has_match, gt_labels[matched], 0)
    reg_t = jnp.take_along_axis(reg, matched[:, None, None], 1)[:, 0]

    lr_min = jnp.minimum(reg_t[:, 0], reg_t[:, 2])
    lr_max = jnp.maximum(reg_t[:, 0], reg_t[:, 2])
    tb_min = jnp.minimum(reg_t[:, 1], reg_t[:, 3])
    tb_max = jnp.maximum(reg_t[:, 1], reg_t[:, 3])
    ctr = jnp.sqrt(
        jnp.clip(lr_min / jnp.maximum(lr_max, 1e-8), 0.0)
        * jnp.clip(tb_min / jnp.maximum(tb_max, 1e-8), 0.0)
    )
    return FCOSTargets(
        cls_labels=cls_labels.astype(jnp.int32),
        reg_targets=reg_t,
        centerness=ctr,
    )


def fcos_decode(locations: jnp.ndarray, distances: jnp.ndarray) -> jnp.ndarray:
    """(N,2) centers + (N,4) l/t/r/b -> xyxy (inference.py FCOS decode)."""
    return jnp.stack(
        [
            locations[:, 0] - distances[:, 0],
            locations[:, 1] - distances[:, 1],
            locations[:, 0] + distances[:, 2],
            locations[:, 1] + distances[:, 3],
        ],
        -1,
    )


def fcos_losses(
    head_out: Dict[str, List[jnp.ndarray]],
    locations_levels: List[jnp.ndarray],
    gt_boxes: jnp.ndarray,      # (B, G, 4)
    gt_labels: jnp.ndarray,     # (B, G)
    gt_valid: jnp.ndarray,      # (B, G)
    num_classes: int,
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> Dict[str, jnp.ndarray]:
    """FCOSLossComputation.__call__ (loss.py:454-470): cls focal / num_pos,
    centerness-weighted GIoU reg loss / sum(centerness targets),
    centerness BCE / num_pos."""
    level_sizes = tuple(loc.shape[0] for loc in locations_levels)
    locs = jnp.concatenate([jnp.asarray(x) for x in locations_levels])
    cls = jnp.concatenate(
        [x.reshape(x.shape[0], -1, num_classes) for x in head_out["cls_logits"]], 1
    )                                                       # (B, N, C)
    reg = jnp.concatenate(
        [x.reshape(x.shape[0], -1, 4) for x in head_out["bbox_reg"]], 1
    )
    ctr = jnp.concatenate(
        [x.reshape(x.shape[0], -1) for x in head_out["centerness"]], 1
    )

    tgt = jax.vmap(lambda b, l, v: fcos_match(locs, level_sizes, b, l, v))(
        gt_boxes, gt_labels, gt_valid
    )
    pos = tgt.cls_labels > 0                                # (B, N)
    num_pos = jnp.maximum(pos.sum(), 1.0)

    cls_loss = sigmoid_focal_loss(
        cls.reshape(-1, num_classes), tgt.cls_labels.reshape(-1),
        gamma=gamma, alpha=alpha,
    ).sum() / num_pos

    pred_boxes = jax.vmap(lambda d: fcos_decode(locs, d))(reg)
    gt_decoded = jax.vmap(lambda d: fcos_decode(locs, d))(tgt.reg_targets)
    g = box_ops.giou(
        pred_boxes.reshape(-1, 4), gt_decoded.reshape(-1, 4)
    ).reshape(pos.shape)
    w = jnp.where(pos, tgt.centerness, 0.0)
    reg_loss = ((1.0 - g) * w).sum() / jnp.maximum(w.sum(), 1e-6)

    ctr_bce = -(
        tgt.centerness * jax.nn.log_sigmoid(ctr)
        + (1.0 - tgt.centerness) * jax.nn.log_sigmoid(-ctr)
    )
    ctr_loss = jnp.where(pos, ctr_bce, 0.0).sum() / num_pos
    return {
        "loss_cls": cls_loss, "loss_reg": reg_loss,
        "loss_centerness": ctr_loss,
    }


# --------------------------------------------------------------------------
# RetinaNet
# --------------------------------------------------------------------------

def retina_match(
    anchors: jnp.ndarray,   # (N, 4)
    gt_boxes: jnp.ndarray,  # (G, 4)
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    fg_iou: float = 0.5,
    bg_iou: float = 0.4,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Matcher(0.5, 0.4, allow_low_quality_matches=True) semantics
    (modeling/matcher.py via loss.py:163-230): per-anchor best gt; below
    bg -> background (0), in [bg, fg) -> ignore (-1); every gt's
    highest-IoU anchors are force-matched."""
    ious = box_ops.box_iou(anchors, gt_boxes)               # (N, G)
    ious = jnp.where(gt_valid[None, :], ious, -1.0)
    best_gt = jnp.argmax(ious, 1)                           # (N,)
    best_iou = jnp.max(ious, 1)

    labels = jnp.where(
        best_iou >= fg_iou,
        gt_labels[best_gt],
        jnp.where(best_iou < bg_iou, 0, -1),
    )
    # low-quality matches (matcher.py set_low_quality_matches_): any anchor
    # achieving some gt's max IoU has its PRE-threshold best match restored —
    # the label comes from the anchor's own best gt, not the forcing gt
    gt_best = jnp.max(ious, 0)                              # (G,)
    force = (
        (ious >= gt_best[None, :] - 1e-7)
        & gt_valid[None, :]
        & (gt_best[None, :] > 0)
    )                                                       # (N, G)
    force_any = force.any(1)
    labels = jnp.where(force_any, gt_labels[best_gt], labels)
    return labels.astype(jnp.int32), best_gt, best_iou


def retina_losses(
    head_out: Dict[str, List[jnp.ndarray]],
    anchors_levels: List[jnp.ndarray],
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    num_classes: int,
    num_anchors: int,
    beta: float = 0.11,
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> Dict[str, jnp.ndarray]:
    """RetinaNetLossComputation.__call__ (loss.py:232-270): sigmoid focal on
    non-ignored anchors / num_pos, smooth-L1(beta=0.11) on encoded deltas of
    positives / num_pos (reference retina.py:107 box coder 10,10,5,5)."""
    anchors = jnp.concatenate([jnp.asarray(a) for a in anchors_levels])
    cls = jnp.concatenate(
        [x.reshape(x.shape[0], -1, num_classes) for x in head_out["cls_logits"]], 1
    )
    reg = jnp.concatenate(
        [x.reshape(x.shape[0], -1, 4) for x in head_out["bbox_reg"]], 1
    )

    # padded gt rows -> unit boxes so encode() stays finite (NaNs would
    # leak through jnp.where into gradients even when masked)
    unit = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    gt_safe = jnp.where(gt_valid[..., None], gt_boxes, unit)

    labels, matched, _ = jax.vmap(
        lambda b, l, v: retina_match(anchors, b, l, v)
    )(gt_safe, gt_labels, gt_valid)
    pos = labels > 0
    num_pos = jnp.maximum(pos.sum(), 1.0)

    # labels == -1 (ignore band) contribute zero in sigmoid_focal_loss
    # (both its pos and neg indicators require t >= 0)
    cls_loss = sigmoid_focal_loss(
        cls.reshape(-1, num_classes), labels.reshape(-1),
        gamma=gamma, alpha=alpha,
    ).sum() / num_pos

    tgt_deltas = jax.vmap(
        lambda b, m: box_ops.encode(b[m], anchors)
    )(gt_safe, matched)
    diff = jnp.abs(reg - tgt_deltas)
    sl1 = jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)
    reg_loss = jnp.where(pos[..., None], sl1, 0.0).sum() / num_pos
    return {"loss_cls": cls_loss, "loss_reg": reg_loss}


# --------------------------------------------------------------------------
# ATSS (class-logit variant)
# --------------------------------------------------------------------------

def atss_legacy_losses(
    head_out: Dict[str, List[jnp.ndarray]],
    anchors_levels: List[jnp.ndarray],
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    num_classes: int,
    topk: int = 9,
) -> Dict[str, jnp.ndarray]:
    """ATSSLossComputation with per-class logits instead of token maps:
    same assignment (engine/losses.py atss_match == loss.py:655-838), focal
    on one-hot class targets, centerness-weighted GIoU, centerness BCE."""
    anchors = jnp.concatenate([jnp.asarray(a) for a in anchors_levels])
    level_sizes = tuple(a.shape[0] for a in anchors_levels)
    cls = jnp.concatenate(
        [x.reshape(x.shape[0], -1, num_classes) for x in head_out["cls_logits"]], 1
    )
    reg = jnp.concatenate(
        [x.reshape(x.shape[0], -1, 4) for x in head_out["bbox_reg"]], 1
    )
    ctr = jnp.concatenate(
        [x.reshape(x.shape[0], -1) for x in head_out["centerness"]], 1
    )

    # token maps are unused in the class-logit variant; atss_match's
    # cls_labels output carries the per-anchor class directly
    token_map = jnp.zeros(gt_labels.shape + (1,))
    unit = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    gt_safe = jnp.where(gt_valid[..., None], gt_boxes, unit)
    tgt = jax.vmap(
        lambda b, l, v, m: atss_match(anchors, level_sizes, b, l, v, m, topk)
    )(gt_safe, gt_labels, gt_valid, token_map)
    pos = tgt.cls_labels > 0
    num_pos = jnp.maximum(pos.sum(), 1.0)

    cls_loss = sigmoid_focal_loss(
        cls.reshape(-1, num_classes), tgt.cls_labels.reshape(-1)
    ).sum() / num_pos

    pred = jax.vmap(box_ops.decode, (0, None))(reg, anchors)
    gt_dec = jax.vmap(box_ops.decode, (0, None))(tgt.reg_targets, anchors)
    g = box_ops.giou(pred.reshape(-1, 4), gt_dec.reshape(-1, 4)).reshape(pos.shape)
    ctr_t = jax.vmap(centerness_targets, (0, None))(tgt.reg_targets, anchors)
    w = jnp.where(pos, ctr_t, 0.0)
    reg_loss = ((1.0 - g) * w).sum() / jnp.maximum(w.sum(), 1e-6)

    bce = -(
        ctr_t * jax.nn.log_sigmoid(ctr)
        + (1.0 - ctr_t) * jax.nn.log_sigmoid(-ctr)
    )
    ctr_loss = jnp.where(pos, bce, 0.0).sum() / num_pos
    return {
        "loss_cls": cls_loss, "loss_reg": reg_loss,
        "loss_centerness": ctr_loss,
    }


# --------------------------------------------------------------------------
# Shared post-processor
# --------------------------------------------------------------------------

def legacy_postprocess_single(
    head_out: Dict[str, List[jnp.ndarray]],
    anchors_or_locations: List[jnp.ndarray],
    kind: str,                   # "fcos" | "retina" | "atss"
    image_h,
    image_w,
    p: PostprocessParams,
    num_classes: int,
    item: int = 0,
) -> Detections:
    """RetinaNet/FCOS/ATSS PostProcessor twin (modeling/rpn/inference.py):
    per-level threshold + top-n over (HW*C), decode, class-aware ml_nms with
    a fixed detections_per_img capacity."""
    all_boxes, all_scores, all_labels, all_valid = [], [], [], []
    has_ctr = "centerness" in head_out
    for lvl, ref in enumerate(anchors_or_locations):
        logits = head_out["cls_logits"][lvl][item].reshape(-1, num_classes)
        scores = jax.nn.sigmoid(logits.astype(jnp.float32))
        if has_ctr:
            c = jax.nn.sigmoid(
                head_out["centerness"][lvl][item].reshape(-1).astype(jnp.float32)
            )
            scores = jnp.sqrt(scores * c[:, None]) if kind == "atss" \
                else scores * c[:, None]
        reg = head_out["bbox_reg"][lvl][item].reshape(-1, 4)
        if kind == "fcos":
            boxes = fcos_decode(jnp.asarray(ref), reg)
        else:
            boxes = box_ops.decode(reg, jnp.asarray(ref))
        boxes = box_ops.clip_to_image(boxes, image_h, image_w)

        flat = scores.reshape(-1)                       # (HW*C,)
        keep = flat > p.pre_nms_thresh
        k = min(p.pre_nms_top_n, flat.shape[0])
        top_scores, top_idx = jax.lax.top_k(jnp.where(keep, flat, NEG_INF), k)
        loc_idx = top_idx // num_classes
        cls_idx = top_idx % num_classes + 1             # 1-based labels
        all_boxes.append(boxes[loc_idx])
        all_scores.append(top_scores)
        all_labels.append(cls_idx)
        all_valid.append(top_scores > NEG_INF / 2)

    boxes = jnp.concatenate(all_boxes)
    scores = jnp.concatenate(all_scores)
    labels = jnp.concatenate(all_labels)
    valid = jnp.concatenate(all_valid)
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


# --------------------------------------------------------------------------
# Dispatch: one loss_fn / postprocess_fn pair per RPN_ARCHITECTURE
# --------------------------------------------------------------------------

def build_legacy_machinery(cfg, image_hw: Tuple[int, int]):
    """Loss + postprocessor for a legacy head at a fixed image bucket
    (registry twin of the loss/inference makers in modeling/rpn/{fcos/fcos,
    retina, atss}.py). Returns (loss_fn, postprocess_fn):

      loss_fn(head_out, gt_boxes (B,G,4), gt_labels (B,G), gt_valid (B,G))
        -> dict of scalar losses
      postprocess_fn(head_out, image_h, image_w, item=0) -> Detections
    """
    arch = cfg.MODEL.RPN_ARCHITECTURE
    strides = tuple(cfg.MODEL.RPN.ANCHOR_STRIDE)
    ncls = cfg.MODEL.ATSS.NUM_CLASSES - 1
    p = PostprocessParams(
        pre_nms_thresh=cfg.MODEL.ATSS.INFERENCE_TH,
        pre_nms_top_n=cfg.MODEL.ATSS.PRE_NMS_TOP_N,
        nms_thresh=cfg.MODEL.ATSS.NMS_TH,
        detections_per_img=cfg.MODEL.ATSS.DETECTIONS_PER_IMG,
    )
    if arch == "FCOS":
        refs = fcos_locations(image_hw, strides)
        kind = "fcos"

        def loss_fn(head_out, gt_boxes, gt_labels, gt_valid):
            return fcos_losses(head_out, refs, gt_boxes, gt_labels,
                               gt_valid, ncls)
    elif arch in ("RETINA", "ATSS"):
        from mqdet_tpu.ops.anchors import anchors_for_fpn

        refs = anchors_for_fpn(
            image_hw, strides,
            sizes=tuple(cfg.MODEL.RPN.ANCHOR_SIZES),
            aspect_ratios=tuple(cfg.MODEL.RPN.ASPECT_RATIOS),
        )
        kind = arch.lower()
        if arch == "RETINA":
            na = len(cfg.MODEL.RPN.ASPECT_RATIOS)

            def loss_fn(head_out, gt_boxes, gt_labels, gt_valid):
                return retina_losses(head_out, refs, gt_boxes, gt_labels,
                                     gt_valid, ncls, num_anchors=na)
        else:
            topk = cfg.MODEL.ATSS.TOPK

            def loss_fn(head_out, gt_boxes, gt_labels, gt_valid):
                return atss_legacy_losses(head_out, refs, gt_boxes,
                                          gt_labels, gt_valid, ncls, topk)
    else:
        raise ValueError(f"no legacy machinery for RPN_ARCHITECTURE {arch!r}")

    def postprocess_fn(head_out, image_h, image_w, item: int = 0):
        return legacy_postprocess_single(
            head_out, refs, kind, image_h, image_w, p, ncls, item
        )

    return loss_fn, postprocess_fn


def make_legacy_train_step(model, loss_fn, tx):
    """One jitted SGD step for a LegacyDetector: the complete legacy
    training path (tools/train_net.py for non-VLDyHead architectures),
    fixed-shape padded GT arrays in place of BoxLists."""
    import optax

    @jax.jit
    def step(params, opt_state, images, gt_boxes, gt_labels, gt_valid):
        def total(p_):
            head_out = model.apply(p_, images, deterministic=False)
            losses = loss_fn(head_out, gt_boxes, gt_labels, gt_valid)
            return sum(losses.values()), losses

        (loss, losses), grads = jax.value_and_grad(total, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, losses

    return step
