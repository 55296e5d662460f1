"""Training step: pjit-able, frozen-aware, bf16, data-parallel.

Capability twin of engine/trainer.py do_train's inner loop
(maskrcnn_benchmark/engine/trainer.py:119-214): forward + loss sum, AMP
(bf16 — no GradScaler needed on TPU), NaN/Inf loss zeroing (:150-152,
186-187), full-model grad clip, per-group LRs, EMA update (:212-214), and
MQ-Det's vision-conditioned text dropout
(generalized_vl_rcnn_new.py:397-407) executed on-device with JAX PRNG.

Parallelism: the caller jits `train_step` with the batch sharded over the
1-D `data` mesh axis and params replicated; XLA inserts the gradient
all-reduce (the reference's DDP/NCCL equivalent) from these annotations.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import chex
import jax
import jax.numpy as jnp

from mqdet_tpu.engine import losses as L
from mqdet_tpu.engine import optim as O

MASK_TOKEN_ID = 103  # bert-base-uncased [MASK]
PAD_TOKEN_ID = 0     # bert-base-uncased [PAD]


@chex.dataclass
class TrainState:
    step: jnp.ndarray
    trainable: Any          # flat {path: array}
    frozen: Any             # flat {path: array}
    opt_state: Any
    ema: Any                # EMA of trainable (or None)
    lr_scale: Any           # autostep plateau multiplier (scalar)


def init_train_state(params, cfg, trainable_patterns, frozen_patterns=()):
    trainable, frozen, merge = O.partition_params(
        params, trainable_patterns, frozen_patterns
    )
    tx, _ = O.make_optimizer(cfg, trainable, trainable_patterns)
    opt_state = tx.init(trainable)
    ema = jax.tree.map(lambda x: x, trainable) if cfg.SOLVER.MODEL_EMA > 0 else None
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        frozen=frozen,
        opt_state=opt_state,
        ema=ema,
        lr_scale=jnp.ones((), jnp.float32),
    )
    return state, tx, merge


def apply_text_dropout(
    rng: jax.Array,
    input_ids: jnp.ndarray,       # (B, T)
    pos_category_map: jnp.ndarray,  # (B, L, T) binary: label slot -> tokens
    has_query: jnp.ndarray,       # (B, L) 1 if that label has vision queries
    dropout: float,
    mask_token_id: int = MASK_TOKEN_ID,
) -> jnp.ndarray:
    """Vision-conditioned masked language prediction: class-name tokens whose
    class has >= 1 vision query are replaced by [MASK] with prob `dropout`."""
    if dropout <= 0:
        return input_ids
    b, l, t = pos_category_map.shape
    drop = jax.random.bernoulli(rng, dropout, (b, l)) & (has_query > 0)
    token_masked = jnp.einsum("bl,blt->bt", drop.astype(jnp.float32), pos_category_map)
    return jnp.where(token_masked > 0, mask_token_id, input_ids)


def random_word_mask(
    rng: jax.Array,
    input_ids: jnp.ndarray,     # (B, T)
    greenlight: jnp.ndarray,    # (B, T) reference greenlight_map semantics
    vocab_size: int,
    mask_token_id: int = MASK_TOKEN_ID,
    pad_token_id: int = PAD_TOKEN_ID,
    prob: float = 0.15,
):
    """GLIP random_word (generalized_vl_rcnn_new.py:53-87).

    Greenlight semantics per the reference docstring: 1 = maskable AND counts
    in the MLM loss; 0 = still corrupted in the input but excluded from the
    loss; -1 = never masked, excluded from the loss. The mask condition is
    `non-pad AND prob<0.15 AND greenlight!=-1`; the label condition is
    `masked AND greenlight==1`. Pass an all-ones greenlight for the
    greenlight_map=None case (MLM_LOSS_FOR_ONLY_POSITIVES=False).
    """
    r1, r2, r3 = jax.random.split(rng, 3)
    pick = (
        (jax.random.uniform(r1, input_ids.shape) < prob)
        & (input_ids != pad_token_id)
        & (greenlight != -1)
    )
    action = jax.random.uniform(r2, input_ids.shape)
    random_ids = jax.random.randint(r3, input_ids.shape, 0, vocab_size)
    masked = jnp.where(action < 0.8, mask_token_id,
                       jnp.where(action < 0.9, random_ids, input_ids))
    new_ids = jnp.where(pick, masked, input_ids)
    labels = jnp.where(pick & (greenlight == 1), input_ids, -100)
    return new_ids, labels


def make_train_step(
    model_apply: Callable,
    merge: Callable,
    tx,
    anchors: jnp.ndarray,
    level_sizes: tuple,
    cfg,
):
    """Returns train_step(state, batch, rng) -> (state, metrics)."""
    ema_decay = cfg.SOLVER.MODEL_EMA
    text_dropout = cfg.VISION_QUERY.TEXT_DROPOUT
    gate_scale = cfg.VISION_QUERY.GATE_REGULARIZATION_SCALE
    gate_reg = cfg.VISION_QUERY.GATE_REGULARIZATION
    topk = cfg.MODEL.ATSS.TOPK
    reg_w = cfg.MODEL.ATSS.REG_LOSS_WEIGHT
    use_queries = cfg.VISION_QUERY.ENABLED
    use_mlm = cfg.MODEL.DYHEAD.FUSE_CONFIG.MLM_LOSS
    mlm_coef = cfg.MODEL.DYHEAD.FUSE_CONFIG.MLM_LOSS_COEF
    mlm_only_pos = cfg.MODEL.DYHEAD.FUSE_CONFIG.MLM_LOSS_FOR_ONLY_POSITIVES
    vocab_size = cfg.MODEL.LANGUAGE_BACKBONE.VOCAB_SIZE

    def loss_fn(trainable, frozen, batch, rng):
        params = merge(trainable, jax.lax.stop_gradient(frozen))
        input_ids = batch["input_ids"]
        # Ordering matches generalized_vl_rcnn_new.py:384-410: random_word runs
        # on the RAW tokenized ids (MLM labels capture original ids), and
        # vision-query text dropout is applied afterwards to the masked ids.
        mlm_labels = None
        if use_mlm:
            # greenlight (generalized_vl_rcnn_new.py:384-395): with
            # MLM_LOSS_FOR_ONLY_POSITIVES only positive-class tokens carry a
            # label (all non-pad tokens are still corrupted); otherwise
            # greenlight_map is None -> every non-pad token is labelable.
            pcm = batch.get("pos_category_map")
            if mlm_only_pos and pcm is not None:
                greenlight = (jnp.sum(pcm, axis=1) > 0).astype(jnp.int32)
            else:
                greenlight = jnp.ones_like(input_ids)
            input_ids, mlm_labels = random_word_mask(
                jax.random.fold_in(rng, 2), input_ids, greenlight, vocab_size
            )
        if use_queries and text_dropout > 0:
            input_ids = apply_text_dropout(
                rng, input_ids, batch["pos_category_map"], batch["has_query"],
                text_dropout,
            )
        head_out = model_apply(
            params,
            batch["images"],
            input_ids,
            batch["attention_mask"],
            batch.get("queries") if use_queries else None,
            batch.get("query_mask") if use_queries else None,
            deterministic=False,
            rngs={"dropout": jax.random.fold_in(rng, 1)},
        )
        losses = L.glip_losses(
            head_out,
            anchors,
            level_sizes,
            batch["gt_boxes"],
            batch["gt_labels"],
            batch["gt_valid"],
            batch["gt_token_map"],
            batch["attention_mask"],
            topk=topk,
            reg_loss_weight=reg_w,
        )
        losses["loss_gate"] = L.gate_loss_from_params(
            trainable, scale=gate_scale, regularize=gate_reg
        )
        if use_mlm:
            losses["loss_mlm"] = mlm_coef * L.mlm_loss(
                head_out["mlm_logits"], mlm_labels
            )
        total = sum(losses.values())
        # NaN/Inf zeroing (trainer.py:150-152): zero the step, keep training
        total = jnp.where(jnp.isfinite(total), total, 0.0)
        return total, losses

    return _finish_train_step(loss_fn, tx, ema_decay)


def make_gdino_train_step(model_apply: Callable, merge: Callable, tx, cfg):
    """MQ-GroundingDINO train step: Hungarian set criterion + gate loss.

    Capability twin of the reference GDINO training branch
    (groundingdino.py:608-641: SetCriterion over final + aux decoder layers,
    plus the GCP gate loss) inside the same TrainState/pjit machinery as the
    GLIP step. Vision-conditioned text dropout
    (generalized_vl_rcnn_new.py:397-407) applies identically — the GDINO
    forward path shares the QVBert GCP encoder.

    Batch ABI adds `image_sizes` (B, 2) true (h, w): gt boxes arrive as
    pixel xyxy in the resized frame and are normalized to the reference's
    `normed_cxcy_boxes` convention here.
    """
    ema_decay = cfg.SOLVER.MODEL_EMA
    text_dropout = cfg.VISION_QUERY.TEXT_DROPOUT
    gate_scale = cfg.VISION_QUERY.GATE_REGULARIZATION_SCALE
    gate_reg = cfg.VISION_QUERY.GATE_REGULARIZATION
    use_queries = cfg.VISION_QUERY.ENABLED
    g = cfg.GROUNDINGDINO

    def loss_fn(trainable, frozen, batch, rng):
        params = merge(trainable, jax.lax.stop_gradient(frozen))
        input_ids = batch["input_ids"]
        if use_queries and text_dropout > 0:
            input_ids = apply_text_dropout(
                rng, input_ids, batch["pos_category_map"], batch["has_query"],
                text_dropout,
            )
        out = model_apply(
            params,
            batch["images"],
            input_ids,
            batch["attention_mask"],
            batch.get("queries") if use_queries else None,
            batch.get("query_mask") if use_queries else None,
            deterministic=False,
            rngs={"dropout": jax.random.fold_in(rng, 1)},
        )
        # xyxy pixels -> normalized cxcywh (reference normed_cxcy_boxes)
        sizes = batch["image_sizes"]  # (B, 2) = (h, w)
        wh = jnp.stack([sizes[:, 1], sizes[:, 0]], -1)[:, None, :]  # (B,1,2)
        b = batch["gt_boxes"]
        cx = (b[..., 0] + b[..., 2]) / 2
        cy = (b[..., 1] + b[..., 3]) / 2
        bw = b[..., 2] - b[..., 0]
        bh = b[..., 3] - b[..., 1]
        gt_cxcywh = jnp.stack([cx, cy, bw, bh], -1) / jnp.concatenate(
            [wh, wh], -1
        )
        # 1-to-1 matching needs G <= num_queries (the reference's ragged
        # targets always satisfy this; our fixed max_gt padding may not, so
        # drop overflow slots — with 900 queries this never bites in prod)
        gt_valid = batch["gt_valid"]
        gt_token_map = batch["gt_token_map"]
        nq = g.num_queries
        if gt_cxcywh.shape[1] > nq:
            gt_cxcywh = gt_cxcywh[:, :nq]
            gt_valid = gt_valid[:, :nq]
            gt_token_map = gt_token_map[:, :nq]
        from mqdet_tpu.engine.gdino_losses import gdino_set_loss

        losses = gdino_set_loss(
            out,
            gt_cxcywh,
            gt_valid,
            gt_token_map,
            batch["attention_mask"],
            cost_class=g.matcher.set_cost_class,
            cost_bbox=g.matcher.set_cost_bbox,
            cost_giou=g.matcher.set_cost_giou,
            loss_ce_coef=g.loss_ce_coef,
            loss_bbox_coef=g.loss_bbox_coef,
            loss_giou_coef=g.loss_giou_coef,
            alpha=g.matcher.focal_alpha,
        )
        losses["loss_gate"] = L.gate_loss_from_params(
            trainable, scale=gate_scale, regularize=gate_reg
        )
        total = sum(losses.values())
        total = jnp.where(jnp.isfinite(total), total, 0.0)
        return total, losses

    return _finish_train_step(loss_fn, tx, ema_decay)


def _finish_train_step(loss_fn, tx, ema_decay):
    """Shared optimizer/EMA/NaN-guard tail of both train-step builders."""

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable, state.frozen, batch, rng
        )
        grads = jax.tree.map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        # autostep plateau decay multiplier (WarmupReduceLROnPlateau twin)
        trainable = jax.tree.map(
            lambda p, u: p + state.lr_scale * u, state.trainable, updates
        )
        ema = (
            O.ema_update(state.ema, trainable, ema_decay)
            if state.ema is not None
            else None
        )
        new_state = TrainState(
            step=state.step + 1,
            trainable=trainable,
            frozen=state.frozen,
            opt_state=opt_state,
            ema=ema,
            lr_scale=state.lr_scale,
        )
        metrics = dict(losses)
        metrics["loss_total"] = total
        return new_state, metrics

    return train_step
