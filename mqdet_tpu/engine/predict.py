"""Inference: ONE compiled forward from pixels to final detections.

Replaces the reference eval loop's per-image, per-chunk python orchestration
(maskrcnn_benchmark/engine/inference.py:577-648 — 31 sequential forwards per
LVIS image, batch size 1, host NMS) with a single jit containing backbone +
GCP-BERT + VLDyHead + decode + class-aware NMS. Prompt chunks ride the batch
axis: a (chunks x images) grid is flattened into the leading dimension, so
one forward evaluates several class chunks of several images at once — the
single biggest throughput win over the reference on TPU.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mqdet_tpu.core.detections import Detections
from mqdet_tpu.models.postprocess import PostprocessParams, atss_postprocess
from mqdet_tpu.ops.anchors import anchors_for_fpn


def _make_gdino_split_fns(model, cfg):
    """GDINO counterpart of make_split_predict_fns, same signatures.

    encode_fn(params, images) -> srcs (tuple of 4 NHWC maps, strides 8..64)
    head_fn(params, srcs, input_ids, attention_mask, queries, query_mask,
            agg_map, image_sizes) -> Detections

    Mirrors the reference eval path (tools/test_grounding_net.py ->
    GroundingDINO.forward eval branch, groundingdino.py:438-647): forward +
    convert_groundingdino_to_glip_output. The same ChunkedEvaluationPlan /
    Detections contract as GLIP, so run_inference/online_update work
    unchanged for MQ-GroundingDINO.
    """
    from mqdet_tpu.models.gdino import MQGroundingDINO, gdino_postprocess

    use_queries = cfg.VISION_QUERY.ENABLED
    box_threshold = cfg.GROUNDINGDINO.box_threshold
    model_cls = type(model)

    @jax.jit
    def encode_fn(params, images):
        return tuple(
            model.apply(params, images, method=model_cls.encode_image)
        )

    @jax.jit
    def head_fn(
        params, feats, input_ids, attention_mask, queries, query_mask,
        agg_map, image_sizes,
    ) -> Detections:
        out = model.apply(
            params,
            list(feats),
            input_ids,
            attention_mask,
            queries if use_queries else None,
            query_mask if use_queries else None,
            method=model_cls.forward_head,
        )
        return gdino_postprocess(
            out["pred_logits"], out["pred_boxes"], agg_map, image_sizes,
            box_threshold,
        )

    return encode_fn, head_fn


def _is_gdino(model) -> bool:
    from mqdet_tpu.models.gdino import MQGroundingDINO

    return isinstance(model, MQGroundingDINO)


def make_predict_fn(
    model_apply: Callable,
    image_hw: Tuple[int, int],
    cfg,
) -> Callable:
    """Build the jitted end-to-end predict function for one image bucket.

    Returned signature:
      predict(params, images, input_ids, attention_mask, queries, query_mask,
              agg_map, image_sizes) -> Detections (batched)

      agg_map: (B, C, T) per-item class-token aggregation matrices
      image_sizes: (B, 2) true (h, w) before padding, for box clipping
    """
    anchors_np = anchors_for_fpn(
        image_hw,
        strides=tuple(cfg.MODEL.RPN.ANCHOR_STRIDE),
        sizes=tuple(cfg.MODEL.RPN.ANCHOR_SIZES),
        aspect_ratios=tuple(cfg.MODEL.RPN.ASPECT_RATIOS),
    )
    anchors_levels = [jnp.asarray(a) for a in anchors_np]
    p = PostprocessParams(
        pre_nms_thresh=cfg.MODEL.ATSS.INFERENCE_TH,
        pre_nms_top_n=cfg.MODEL.ATSS.PRE_NMS_TOP_N,
        nms_thresh=cfg.MODEL.ATSS.NMS_TH,
        detections_per_img=cfg.MODEL.ATSS.DETECTIONS_PER_IMG,
        min_size=0.0,
        score_agg=cfg.MODEL.DYHEAD.SCORE_AGG,
    )

    use_queries = cfg.VISION_QUERY.ENABLED

    @jax.jit
    def predict(
        params,
        images,
        input_ids,
        attention_mask,
        queries,
        query_mask,
        agg_map,
        image_sizes,
    ) -> Detections:
        head_out = model_apply(
            params,
            images,
            input_ids,
            attention_mask,
            queries if use_queries else None,
            query_mask if use_queries else None,
            deterministic=True,
        )
        return atss_postprocess(head_out, anchors_levels, agg_map, image_sizes, p)

    return predict


def pad_image_to_bucket(
    image: np.ndarray, bucket_hw: Tuple[int, int]
) -> np.ndarray:
    """Host-side: zero-pad an (H, W, 3) image to the static bucket size."""
    h, w = bucket_hw
    out = np.zeros((h, w, image.shape[-1]), image.dtype)
    out[: image.shape[0], : image.shape[1]] = image
    return out


def make_split_predict_fns(model, image_hw: Tuple[int, int], cfg):
    """Backbone-once / head-per-chunk split for chunked evaluation.

    Returns (encode_fn, head_fn):
      encode_fn(params, images (1,H,W,3)) -> fpn_feats (tuple of 5 NHWC maps)
      head_fn(params, fpn_feats, input_ids (C,T), attention_mask, queries,
              query_mask, agg_map (C,Cls,T), image_sizes (C,2)) -> Detections

    The image tower runs once per image; only the text-conditioned head
    (GCP-BERT + fusion + VLDyHead + NMS) runs per class chunk. The reference
    recomputes everything for each of its 31 sequential chunk forwards.

    Dispatches on the model family: MQGroundingDINO gets the deformable-DETR
    head + gdino_postprocess behind the same signatures.
    """
    if _is_gdino(model):
        return _make_gdino_split_fns(model, cfg)
    anchors_np = anchors_for_fpn(
        image_hw,
        strides=tuple(cfg.MODEL.RPN.ANCHOR_STRIDE),
        sizes=tuple(cfg.MODEL.RPN.ANCHOR_SIZES),
        aspect_ratios=tuple(cfg.MODEL.RPN.ASPECT_RATIOS),
    )
    anchors_levels = [jnp.asarray(a) for a in anchors_np]
    p = PostprocessParams(
        pre_nms_thresh=cfg.MODEL.ATSS.INFERENCE_TH,
        pre_nms_top_n=cfg.MODEL.ATSS.PRE_NMS_TOP_N,
        nms_thresh=cfg.MODEL.ATSS.NMS_TH,
        detections_per_img=cfg.MODEL.ATSS.DETECTIONS_PER_IMG,
        min_size=0.0,
        score_agg=cfg.MODEL.DYHEAD.SCORE_AGG,
    )
    use_queries = cfg.VISION_QUERY.ENABLED
    model_cls = type(model)

    @jax.jit
    def encode_fn(params, images):
        return tuple(
            model.apply(params, images, method=model_cls.encode_image)
        )

    @jax.jit
    def head_fn(
        params, fpn_feats, input_ids, attention_mask, queries, query_mask,
        agg_map, image_sizes,
    ) -> Detections:
        head_out = model.apply(
            params,
            list(fpn_feats),
            input_ids,
            attention_mask,
            queries if use_queries else None,
            query_mask if use_queries else None,
            method=model_cls.forward_head,
        )
        return atss_postprocess(head_out, anchors_levels, agg_map, image_sizes, p)

    return encode_fn, head_fn


def make_protocol_fn(model, image_hw: Tuple[int, int], cfg):
    """Whole-protocol single dispatch: encode ONE image + lax.map the head
    over all chunk groups inside one jit.

    protocol_fn(params, image (1,H,W,3),
                input_ids (G, CP, T), attention_mask (G, CP, T),
                queries (G, CP, V, C), query_mask (G, CP, V, T),
                agg_map (G, CP, Cls, T), image_sizes (G, CP, 2))
      -> Detections with leading (G, CP) batch dims.

    vs make_split_predict_fns this removes the per-chunk-group dispatch
    (25-60 ms host round-trip each through a remote runtime; still one
    enqueue+sync per group locally) and lets XLA overlap groups.
    """
    encode_fn, head_fn = make_split_predict_fns(model, image_hw, cfg)
    # reuse the head inner (unjitted) by re-deriving it: head_fn is jitted but
    # calling it inside jit re-traces the underlying function — acceptable.

    @jax.jit
    def protocol_fn(params, image, input_ids, attention_mask, queries,
                    query_mask, agg_map, image_sizes):
        feats = tuple(
            model.apply(params, image, method=type(model).encode_image)
        )

        def one_group(args):
            ii, am, q, qm, ag, sz = args
            return head_fn(params, feats, ii, am, q, qm, ag, sz)

        return jax.lax.map(
            one_group,
            (input_ids, attention_mask, queries, query_mask, agg_map,
             image_sizes),
        )

    return protocol_fn


def make_batched_protocol_fn(
    model, image_hw: Tuple[int, int], cfg, image_batch: int
):
    """Image-batched whole-protocol dispatch: B images x G chunk groups.

    The LVIS protocol scores every image against the same class-chunk
    prompts, so the (image, chunk) grid is a cross product: the backbone
    runs once per image (batch B), and each chunk group's head runs at
    batch B*CP with features repeated image-major and text tiled.

    protocol_fn(params, images (B,H,W,3), image_sizes (B,2),
                input_ids (G, CP, T), attention_mask (G, CP, T),
                queries (G, CP, V, C), query_mask (G, CP, V, T),
                agg_map (G, CP, Cls, T))
      -> Detections with leading (G, B*CP) dims; within a group, entry
         i*CP + c is image i scored against chunk c (image-major).

    The reference counterpart is 31*B sequential batch-1 GPU forwards
    (maskrcnn_benchmark/engine/inference.py:577-648). Batching images as
    well as chunks raises MXU utilization of the text-conditioned head and
    amortizes the backbone dispatch.
    """
    _, head_fn = make_split_predict_fns(model, image_hw, cfg)
    B = int(image_batch)

    @jax.jit
    def protocol_fn(params, images, image_sizes, input_ids, attention_mask,
                    queries, query_mask, agg_map):
        feats = tuple(
            model.apply(params, images, method=type(model).encode_image)
        )

        def one_group(args):
            ii, am, q, qm, ag = args
            cp = ii.shape[0]
            f_rep = tuple(jnp.repeat(f, cp, axis=0) for f in feats)

            def tile_text(x):
                return jnp.tile(x, (B,) + (1,) * (x.ndim - 1))

            sz = jnp.repeat(image_sizes, cp, axis=0)
            return head_fn(
                params, f_rep, tile_text(ii), tile_text(am), tile_text(q),
                tile_text(qm), tile_text(ag), sz,
            )

        return jax.lax.map(
            one_group,
            (input_ids, attention_mask, queries, query_mask, agg_map),
        )

    return protocol_fn
