"""Vision-query extraction: GT boxes -> pooled FPN features -> bank.

Capability twin of GeneralizedVLRCNN_New.extract_query
(maskrcnn_benchmark/modeling/detector/generalized_vl_rcnn_new.py:232-288) and
the extraction loop (tools/train_net.py:256-336):
  * GT boxes expanded x EXPAND_RATIO about their center (expand_bbox, :32-49)
  * ROIAlign-pooled 7x7 from the FPN — level-mapped Pooler when
    SELECT_FPN_LEVEL else all-level CustomPooler (poolers.py:11-168)
  * spatially mean-pooled to (num_boxes, num_scales, C)
  * accumulated per label with a MAX_QUERY_NUMBER cap, optional
    cosine-similarity dedup (threshold 0.85)

TPU-first: the backbone + pooling runs as ONE jit with a fixed box capacity;
per-label accumulation happens host-side into the QueryBank. In a multi-host
setting each host extracts its shard and banks are merged with
QueryBank.merge (the reference leaves per-rank files unmerged).
"""
from __future__ import annotations

import functools
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mqdet_tpu.core.boxes import expand_boxes
from mqdet_tpu.mq.bank import QueryBank
from mqdet_tpu.ops.roi_align import all_level_roi_align, multi_level_roi_align


def make_extract_fn(
    model,
    image_hw: Tuple[int, int],
    cfg,
    max_boxes: int = 64,
):
    """Returns jit'd extract(params, images (1,H,W,3), boxes (N,4), valid (N,))
    -> (N, S, C) pooled query features (S=1 level-mapped, 5 all-level)."""
    scales = tuple(cfg.MODEL.ROI_BOX_HEAD.POOLER_SCALES)
    resolution = cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION
    select_level = cfg.VISION_QUERY.SELECT_FPN_LEVEL
    expand_ratio = cfg.VISION_QUERY.EXPAND_RATIO
    model_cls = type(model)

    @jax.jit
    def extract(params, images, boxes, image_h, image_w):
        feats = model.apply(params, images, method=model_cls.encode_image)
        boxes = expand_boxes(boxes, expand_ratio, image_h, image_w)
        feats0 = [f[0].astype(jnp.float32) for f in feats]
        if select_level:
            pooled = multi_level_roi_align(
                feats0, boxes, scales, output_size=resolution
            )  # (N, P, P, C)
            pooled = pooled.mean(axis=(1, 2))[:, None, :]  # (N, 1, C)
        else:
            pooled = all_level_roi_align(
                feats0, boxes, scales, output_size=resolution
            )  # (L, N, P, P, C)
            pooled = pooled.mean(axis=(2, 3)).transpose(1, 0, 2)  # (N, L, C)
        return pooled

    return extract


def extract_queries_into_bank(
    extract_fn: Callable,
    params,
    data_iter,
    bank: QueryBank,
    max_query_number: int = 5000,
    exclude_similar: bool = False,
) -> QueryBank:
    """Drive extraction over a dataset iterator.

    data_iter yields dicts with: image (1, H, W, 3) padded+normalized,
    boxes (N, 4), labels (N,), image_size (h, w).
    """
    for batch in data_iter:
        needed = [
            bank.count(int(l)) < max_query_number for l in batch["labels"]
        ]
        if not any(needed):
            continue
        pooled = np.asarray(
            extract_fn(
                params,
                batch["image"],
                jnp.asarray(batch["boxes"], jnp.float32),
                batch["image_size"][0],
                batch["image_size"][1],
            )
        )
        for feat, label, ok in zip(pooled, batch["labels"], needed):
            if not ok:
                continue
            bank.add(
                int(label), feat[None],
                exclude_similar=exclude_similar,
                capacity=max_query_number,
            )
    return bank
