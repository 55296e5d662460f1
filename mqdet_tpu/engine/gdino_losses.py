"""GroundingDINO training losses: Hungarian matching + set criterion.

Capability twin of groundingdino_new/models/GroundingDINO/loss.py:18-180 and
matcher.py:8-181: bipartite matching with focal class cost + L1 + GIoU box
costs, then per-match losses — token sigmoid focal CE against positive-map
targets (with the [no-obj] last-token convention), L1 and GIoU box losses,
auxiliary losses per decoder layer.

TPU-first: the Hungarian assignment runs INSIDE jit via
optax.assignment.hungarian_algorithm on a fixed-size padded cost matrix
(invalid GT columns carry a large cost and are dropped afterwards).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from optax import assignment

from mqdet_tpu.core import boxes as box_ops

BIG = 1e6


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
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    alpha: float = 0.25,
    gamma: float = 2.0,
):
    """matcher.py HungarianMatcher.forward for one image.

    Returns (row_ind (G,), valid (G,)): the query assigned to each gt.
    """
    logits = jnp.where(jnp.isfinite(pred_logits), pred_logits, -30.0)
    prob = jax.nn.sigmoid(logits)
    pos_cost = alpha * ((1 - prob) ** gamma) * (-jnp.log(prob + 1e-8))
    neg_cost = (1 - alpha) * (prob**gamma) * (-jnp.log(1 - prob + 1e-8))
    tok = (gt_token_map > 0).astype(jnp.float32)  # (G, T)
    denom = jnp.maximum(tok.sum(-1), 1.0)
    cost_cls = (
        pos_cost @ tok.T - neg_cost @ tok.T
    ) / denom[None, :]  # (Q, G), mean over the gt's tokens

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
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    alpha: float = 0.25,
    gamma: float = 2.0,
    aux: bool = True,
) -> Dict[str, jnp.ndarray]:
    """SetCriterion (loss.py:18-180) over final + auxiliary decoder layers."""

    def single_layer(pred_logits, pred_boxes):
        def per_image(pl, pb, gtm, gbx, gv, tm):
            q_ind, valid = hungarian_match(
                pl, pb, gtm, gbx, gv, cost_class, cost_bbox, cost_giou,
                alpha, gamma,
            )
            # token focal CE: matched queries get their gt's token targets,
            # unmatched queries get the [no-obj] last-token target
            t_len = pl.shape[-1]
            targets = jnp.zeros((pl.shape[0], t_len))
            targets = targets.at[:, -1].set(1.0)  # no-obj
            tgt_rows = (gtm > 0).astype(jnp.float32)
            targets = targets.at[q_ind].set(
                jnp.where(valid[:, None], tgt_rows, targets[q_ind])
            )
            logits = jnp.where(jnp.isfinite(pl), pl, -30.0)
            p = jax.nn.sigmoid(logits)
            ce = (
                jnp.maximum(logits, 0) - logits * targets
                + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            )
            p_t = p * targets + (1 - p) * (1 - targets)
            focal = ce * (1 - p_t) ** gamma
            a_t = alpha * targets + (1 - alpha) * (1 - targets)
            # mask to valid tokens + forced last token (loss.py text_mask)
            tmask = tm.astype(jnp.float32).at[-1].set(1.0)
            loss_ce = (a_t * focal * tmask[None]).sum()

            matched_boxes = pb[q_ind]
            l1 = jnp.where(
                valid[:, None], jnp.abs(matched_boxes - gbx), 0.0
            ).sum()
            g = box_ops.giou(
                box_ops.cxcywh_to_xyxy(matched_boxes),
                box_ops.cxcywh_to_xyxy(gbx),
            )
            loss_giou_v = jnp.where(valid, 1.0 - g, 0.0).sum()
            return loss_ce, l1, loss_giou_v

        ce, l1, gi = jax.vmap(per_image)(
            pred_logits, pred_boxes, gt_token_map, gt_boxes, gt_valid, text_masks
        )
        num_boxes = jnp.maximum(gt_valid.sum(), 1.0)
        return {
            "loss_ce": ce.sum() / num_boxes,
            "loss_bbox": l1.sum() / num_boxes,
            "loss_giou": gi.sum() / num_boxes,
        }

    losses = single_layer(outputs["pred_logits"], outputs["pred_boxes"])
    if aux:
        for i, (al, ab) in enumerate(zip(outputs["aux_logits"], outputs["aux_boxes"])):
            for k, v in single_layer(al, ab).items():
                losses[f"{k}_aux{i}"] = v
    return losses
