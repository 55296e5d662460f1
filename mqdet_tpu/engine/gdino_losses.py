"""GroundingDINO training losses: Hungarian matching + set criterion.

Capability twin of groundingdino_new/models/GroundingDINO/loss.py:18-180 and
matcher.py:8-181, with reference-exact semantics:
  * HungarianMatcher (matcher.py:30-89): focal class cost = mean over the
    gt's positive-map tokens of (pos_cost - neg_cost) on sigmoid probs,
    + L1 cdist + (-GIoU), weights set_cost_class/bbox/giou (1.0/5.0/2.0).
  * SetCriterion (loss.py:42-96): loss_ce = TokenSigmoidFocalLoss "binary"
    (sigmoid_focal_loss.py:131-172 — masked to real text tokens, then SUM)
    over per-query target rows (matched -> binarized positive map row;
    zero-sum rows -> [no-obj] last-token one-hot), / num_boxes;
    loss_bbox = L1 sum / num_boxes; loss_giou = (1 - diag GIoU) / num_boxes;
    then weight_dict multipliers loss_ce/bbox/giou_coef (2.0/5.0/2.0)
    (loss.py:172-177). Aux decoder layers re-run the matcher (loss.py:150).
  * num_boxes = total gt count over the global batch, clamped min 1
    (loss.py:135-140; the all_reduce/world_size is implicit here because the
    loss runs inside the pjit'd step over the globally sharded batch).

TPU-first: the Hungarian assignment runs INSIDE jit via
optax.assignment.hungarian_algorithm on a fixed-size padded cost matrix;
invalid GT columns carry a constant large cost, which leaves the real
columns' optimum unchanged (Q >> G), and are dropped from the losses by the
validity mask.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from optax import assignment

from mqdet_tpu.core import boxes as box_ops
from mqdet_tpu.ops.focal_loss import token_sigmoid_binary_focal_loss

BIG = 1e6
NEG_INF_SUB = -1e4  # finite stand-in for ContrastiveEmbed's -inf padding


def _pairwise_giou_cxcywh(a_cxcywh, b_cxcywh):
    a = box_ops.cxcywh_to_xyxy(a_cxcywh)
    b = box_ops.cxcywh_to_xyxy(b_cxcywh)
    q, g = a.shape[0], b.shape[0]
    aa = jnp.broadcast_to(a[:, None], (q, g, 4)).reshape(-1, 4)
    bb = jnp.broadcast_to(b[None], (q, g, 4)).reshape(-1, 4)
    return box_ops.giou(aa, bb).reshape(q, g)


def hungarian_match(
    pred_logits,    # (Q, T) token logits (may contain -inf padding)
    pred_boxes,     # (Q, 4) cxcywh
    gt_token_map,   # (G, T) positive map (binary/normalized)
    gt_boxes,       # (G, 4) cxcywh, normalized
    gt_valid,       # (G,)
    cost_class: float = 1.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    alpha: float = 0.25,
    gamma: float = 2.0,
):
    """matcher.py HungarianMatcher.forward for one image.

    Returns (row_ind (G,), valid (G,)): the query assigned to each gt.
    """
    logits = jnp.where(jnp.isfinite(pred_logits), pred_logits, NEG_INF_SUB)
    prob = jax.nn.sigmoid(logits)
    # matcher.py:63-66 (1e-8 inside the log, exact)
    pos_cost = alpha * ((1 - prob) ** gamma) * (-jnp.log(prob + 1e-8))
    neg_cost = (1 - alpha) * (prob**gamma) * (-jnp.log(1 - prob + 1e-8))
    tok = (gt_token_map > 0).astype(jnp.float32)  # (G, T)
    denom = jnp.maximum(tok.sum(-1), 1.0)
    cost_cls = (
        (pos_cost - neg_cost) @ tok.T
    ) / denom[None, :]  # (Q, G), mean over the gt's tokens (matcher.py:69-72)

    cost_l1 = jnp.abs(pred_boxes[:, None] - gt_boxes[None]).sum(-1)
    cost_g = -_pairwise_giou_cxcywh(pred_boxes, gt_boxes)

    cost = cost_class * cost_cls + cost_bbox * cost_l1 + cost_giou * cost_g
    cost = jnp.where(gt_valid[None, :], cost, BIG)
    cost = jnp.where(jnp.isfinite(cost), cost, BIG)

    # hungarian over (G, Q) so every gt gets a distinct query (G <= Q)
    gt_ind, q_ind = assignment.hungarian_algorithm(cost.T)
    order = jnp.argsort(gt_ind)
    return q_ind[order], gt_valid


def gdino_set_loss(
    outputs: Dict,
    gt_boxes,        # (B, G, 4) cxcywh normalized
    gt_valid,        # (B, G)
    gt_token_map,    # (B, G, T)
    text_masks,      # (B, T)
    cost_class: float = 1.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    loss_ce_coef: float = 2.0,
    loss_bbox_coef: float = 5.0,
    loss_giou_coef: float = 2.0,
    alpha: float = 0.25,
    gamma: float = 2.0,
    aux: bool = True,
) -> Dict[str, jnp.ndarray]:
    """SetCriterion (loss.py:18-180) over final + auxiliary decoder layers."""
    # num_boxes = len(positive_map) over the whole (global) batch, min 1
    num_boxes = jnp.maximum(gt_valid.sum().astype(jnp.float32), 1.0)

    def single_layer(pred_logits, pred_boxes):
        def per_image(pl, pb, gtm, gbx, gv):
            q_ind, valid = hungarian_match(
                pl, pb, gtm, gbx, gv, cost_class, cost_bbox, cost_giou,
                alpha, gamma,
            )
            # target rows (loss.py:56-63): matched queries get the gt's
            # BINARIZED positive-map row (groundingdino.py:613-614), then any
            # zero-sum row becomes the [no-obj] last-token one-hot
            t_len = pl.shape[-1]
            tgt_rows = (gtm > 0).astype(jnp.float32)
            targets = jnp.zeros((pl.shape[0], t_len))
            targets = targets.at[q_ind].set(
                jnp.where(valid[:, None], tgt_rows, targets[q_ind])
            )
            noobj = jnp.zeros((t_len,)).at[-1].set(1.0)
            targets = jnp.where(
                (targets.sum(-1) == 0)[:, None], noobj[None], targets
            )

            matched_boxes = pb[q_ind]
            l1 = jnp.where(
                valid[:, None], jnp.abs(matched_boxes - gbx), 0.0
            ).sum()
            g = box_ops.giou(
                box_ops.cxcywh_to_xyxy(matched_boxes),
                box_ops.cxcywh_to_xyxy(gbx),
            )
            loss_giou_v = jnp.where(valid, 1.0 - g, 0.0).sum()
            return targets, l1, loss_giou_v

        targets, l1, gi = jax.vmap(per_image)(
            pred_logits, pred_boxes, gt_token_map, gt_boxes, gt_valid
        )
        # binary token focal, masked to real text tokens, SUM reduction
        # (sigmoid_focal_loss.py:131-172; the [no-obj] token only contributes
        # when it falls inside the attended text — exactly the reference's
        # masked_select behavior)
        logits = jnp.where(
            jnp.isfinite(pred_logits), pred_logits, NEG_INF_SUB
        ).astype(jnp.float32)
        tmask = text_masks
        if tmask.shape[-1] < logits.shape[-1]:  # pad mask to max_text_len
            tmask = jnp.pad(
                tmask, ((0, 0), (0, logits.shape[-1] - tmask.shape[-1]))
            )
        ce = token_sigmoid_binary_focal_loss(
            logits, targets, tmask, alpha=alpha, gamma=gamma
        )
        return {
            "loss_ce": ce / num_boxes,
            "loss_bbox": l1.sum() / num_boxes,
            "loss_giou": gi.sum() / num_boxes,
        }

    losses = single_layer(outputs["pred_logits"], outputs["pred_boxes"])
    if aux:
        for i, (al, ab) in enumerate(zip(outputs["aux_logits"], outputs["aux_boxes"])):
            for k, v in single_layer(al, ab).items():
                losses[f"{k}_{i}"] = v
    # weight_dict multipliers (loss.py:172-177): applied to final AND aux
    weights = {
        "loss_ce": loss_ce_coef,
        "loss_bbox": loss_bbox_coef,
        "loss_giou": loss_giou_coef,
    }
    out = {}
    for k, v in losses.items():
        for name, w in weights.items():
            if k.startswith(name):
                out[k] = v * w
    return out
