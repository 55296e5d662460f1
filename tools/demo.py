#!/usr/bin/env python
"""Single-image demo CLI.

Capability twin of the reference GLIPDemo usage (predictor_glip.py:28 +
demo notebooks): run one image + a list of category names (or a caption)
through the model and print/save the detections.

Usage:
  python tools/demo.py --config-file configs/pretrain/mq-glip-t.yaml \
      --weight MODEL/mq-glip-t.pth --image cat.jpg \
      --categories "cat. remote control" [--threshold 0.5] [--output out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mqdet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

import numpy as np


def main():
    p = argparse.ArgumentParser(description="MQ-Det TPU single-image demo")
    p.add_argument("--config-file", required=True)
    p.add_argument("--weight", default=None)
    p.add_argument("--image", required=True, help="path to an RGB image")
    p.add_argument(
        "--categories", required=True,
        help="'. '-separated category names, e.g. 'cat. remote control'",
    )
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--output", default=None, help="write detections json here")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()
    args.task_config = None
    args.additional_model_config = None

    from PIL import Image

    from tools.train import load_config

    cfg = load_config(args)
    if args.weight:
        cfg.MODEL.WEIGHT = args.weight

    import jax
    import jax.numpy as jnp

    from mqdet_tpu.engine.demo import MQDetDemo
    from mqdet_tpu.io.checkpoints import load_params_npz
    from mqdet_tpu.io.torch_import import import_glip_checkpoint, load_torch_state_dict
    from mqdet_tpu.mq.bank import QueryBank
    from mqdet_tpu.mq.selector import QuerySelector
    from mqdet_tpu.utils.builders import build_model, synthetic_batch

    model = build_model(cfg)
    bucket = tuple(cfg.TPU.IMAGE_BUCKETS[0])
    b0 = synthetic_batch(
        cfg, 1, bucket, num_labels=2, k_shot=cfg.VISION_QUERY.NUM_QUERY_PER_CLASS
    )
    init_args = tuple(
        jnp.asarray(b0[k])
        for k in ["images", "input_ids", "attention_mask", "queries", "query_mask"]
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *init_args)
    if cfg.MODEL.WEIGHT:
        if cfg.MODEL.WEIGHT.endswith(".npz"):
            params = load_params_npz(cfg.MODEL.WEIGHT, params)
        else:
            params, _ = import_glip_checkpoint(
                params, load_torch_state_dict(cfg.MODEL.WEIGHT)
            )

    selector = None
    if cfg.VISION_QUERY.ENABLED and cfg.VISION_QUERY.QUERY_BANK_PATH:
        path = cfg.VISION_QUERY.QUERY_BANK_PATH
        bank = (
            QueryBank.from_torch_pth(path) if path.endswith(".pth")
            else QueryBank.load(path)
        )
        selector = QuerySelector(
            bank, num_query_per_class=cfg.VISION_QUERY.NUM_QUERY_PER_CLASS,
            max_labels=cfg.VISION_QUERY.MAX_CLASSES_PER_PROMPT,
        )

    demo = MQDetDemo(
        cfg, model, params, selector, confidence_threshold=args.threshold
    )
    image = np.asarray(Image.open(args.image).convert("RGB"))
    categories = [c.strip() for c in args.categories.split(".") if c.strip()]
    out = demo(image, categories)

    dets = [
        {"box": [float(v) for v in b], "score": float(s), "label": n}
        for b, s, n in zip(out["boxes"], out["scores"], out["names"])
    ]
    print(json.dumps(dets, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(dets, f)


if __name__ == "__main__":
    main()
