"""Single-image demo predictor.

Capability twin of GLIPDemo (maskrcnn_benchmark/engine/predictor_glip.py:28):
give it an RGB numpy image and a caption (or list of category names) and get
final detections, with optional vision queries from a bank.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np

from mqdet_tpu.core.detections import to_numpy_dict
from mqdet_tpu.data import grounding as G
from mqdet_tpu.data.tokenizer import get_tokenizer
from mqdet_tpu.data.transforms import EvalTransform
from mqdet_tpu.engine.predict import make_split_predict_fns
from mqdet_tpu.mq.selector import QuerySelector


class MQDetDemo:
    def __init__(self, cfg, model, params, selector: Optional[QuerySelector] = None,
                 confidence_threshold: float = 0.5):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.selector = selector
        self.threshold = confidence_threshold
        self.tokenizer = get_tokenizer(cfg.MODEL.LANGUAGE_BACKBONE.TOKENIZER_TYPE)
        self.transform = EvalTransform(cfg)
        bucket = tuple(cfg.TPU.IMAGE_BUCKETS[0])
        self.encode_fn, self.head_fn = make_split_predict_fns(model, bucket, cfg)

    def __call__(self, image: np.ndarray, categories: Sequence[str]):
        """image: (H, W, 3) uint8 RGB; categories: list of class names.

        Returns dict with boxes (N, 4) xyxy in original image coords,
        scores (N,), labels (N,) 1-based into `categories`.
        """
        ind_to_class = {i + 1: name for i, name in enumerate(categories)}
        bundle = G.build_prompt(
            sorted(ind_to_class.keys()), ind_to_class, self.tokenizer,
            max_text_len=self.cfg.MODEL.LANGUAGE_BACKBONE.MAX_QUERY_LEN,
            separation_tokens=self.cfg.DATASETS.SEPARATION_TOKENS,
        )
        max_labels = self.cfg.VISION_QUERY.MAX_CLASSES_PER_PROMPT
        all_map, agg_map, _ = G.pad_prompt_maps(bundle, max_labels)

        padded, (oh, ow), (sy, sx) = self.transform(image)
        images = jnp.asarray(padded[None])
        feats = self.encode_fn(self.params, images)

        if self.selector is not None and self.selector.bank is not None:
            q, qm, _ = self.selector.select(bundle.label_ids, bundle.all_map, False)
            queries = jnp.asarray(q[None])
            query_mask = jnp.asarray(qm[None])
        else:
            queries = jnp.zeros((1, 1, self.cfg.MODEL.BACKBONE.OUT_CHANNELS))
            query_mask = jnp.zeros(
                (1, 1, self.cfg.MODEL.LANGUAGE_BACKBONE.MAX_QUERY_LEN)
            )

        dets = self.head_fn(
            self.params, feats,
            jnp.asarray(bundle.input_ids[None]),
            jnp.asarray(bundle.attention_mask[None]),
            queries, query_mask,
            jnp.asarray(agg_map[None]),
            jnp.asarray([[oh, ow]], jnp.float32),
        )
        out = to_numpy_dict(
            type(dets)(
                boxes=dets.boxes[0], scores=dets.scores[0],
                labels=dets.labels[0], valid=dets.valid[0],
            )
        )
        keep = out["scores"] >= self.threshold
        boxes = out["boxes"][keep] * np.array([sx, sy, sx, sy], np.float32)
        return {
            "boxes": boxes,
            "scores": out["scores"][keep],
            "labels": out["labels"][keep],
            "names": [ind_to_class[int(l)] for l in out["labels"][keep]],
        }
