#!/usr/bin/env python
"""Finetuning-free evaluation CLI.

Capability twin of tools/test_grounding_net.py: build model, load weights,
optional online query update (--online-update / VISION_QUERY.ONLINE_UPDATE),
chunked evaluation over the TEST dataset, COCO/LVIS metrics + bbox.csv.

Usage:
  python tools/eval.py --config-file configs/vision_query_5shot/lvis_minival.yaml \
      --weight MODEL/mq-glip-t.pth [OPTS ...]
"""
from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mqdet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

import numpy as np


def main():
    p = argparse.ArgumentParser(description="MQ-Det TPU evaluation")
    p.add_argument("--config-file", required=True)
    p.add_argument("--weight", default=None)
    p.add_argument("--task-config", default=None)
    p.add_argument("--additional-model-config", default=None)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--lvis", action="store_true", help="use LVIS fixed-AP protocol")
    p.add_argument(
        "--profile-dir", default=None,
        help="capture a jax.profiler trace of the eval loop into this dir",
    )
    p.add_argument(
        "--calibrate-deform", action="store_true",
        help="measure the checkpoint's DCN offset range on one batch and "
             "raise TPU.DEFORM_RADIUS / fall back to the exact gather impl "
             "if the clipped window formulation would diverge",
    )
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    from tools.train import build_dataset, load_config

    cfg = load_config(args)
    if args.weight:
        cfg.MODEL.WEIGHT = args.weight

    import jax
    import jax.numpy as jnp

    from mqdet_tpu.data.tokenizer import get_tokenizer
    from mqdet_tpu.engine.evaluator import check_expected_results
    from mqdet_tpu.engine.eval_dispatch import run_evaluation
    from mqdet_tpu.io.torch_import import import_glip_checkpoint, load_torch_state_dict
    from mqdet_tpu.io.checkpoints import load_params_npz
    from mqdet_tpu.mq.bank import QueryBank
    from mqdet_tpu.mq.selector import QuerySelector
    from mqdet_tpu.utils.builders import build_model, synthetic_batch

    model = build_model(cfg)
    tokenizer = get_tokenizer(cfg.MODEL.LANGUAGE_BACKBONE.TOKENIZER_TYPE)
    dataset = build_dataset(cfg, cfg.DATASETS.TEST[0], train=False)

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
        elif cfg.GROUNDINGDINO.enabled:
            from mqdet_tpu.io.torch_import import import_gdino_checkpoint

            params, report = import_gdino_checkpoint(
                params, load_torch_state_dict(cfg.MODEL.WEIGHT),
                enc_layers=cfg.GROUNDINGDINO.enc_layers,
                dec_layers=cfg.GROUNDINGDINO.dec_layers,
            )
            print(
                f"imported {len(report['matched'])}; missing {len(report['missing'])}"
            )
        else:
            params, report = import_glip_checkpoint(
                params, load_torch_state_dict(cfg.MODEL.WEIGHT)
            )
            print(
                f"imported {len(report['matched'])}; missing {len(report['missing'])}"
            )

    if args.calibrate_deform and cfg.MODEL.DYHEAD.USE_DFCONV:
        from mqdet_tpu.utils.calibrate import (
            apply_calibration,
            calibrate_deform_radius,
        )

        calib = calibrate_deform_radius(cfg, model, params, init_args)
        print(
            f"deform calibration: max|offset|={calib.max_offset:.2f}px -> "
            f"radius={calib.radius} impl={calib.impl}"
        )
        if apply_calibration(cfg, calib):
            # radius is baked in at module construction: rebuild and re-graft
            # the already-loaded params (tree structure is radius-invariant)
            model = build_model(cfg)

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

    if cfg.VISION_QUERY.ONLINE_UPDATE and selector is not None:
        from mqdet_tpu.engine.inference import online_update
        from mqdet_tpu.mq.extract import make_extract_fn

        extract_fn = make_extract_fn(model, bucket, cfg)
        selector = online_update(
            cfg, model, params, dataset, tokenizer, selector, extract_fn,
            max_images=args.max_images,
        )

    import contextlib

    from mqdet_tpu.utils.profiling import trace

    prof = trace(args.profile_dir) if args.profile_dir else contextlib.nullcontext()
    with prof:
        # protocol dispatch by dataset type (COCO / LVIS-fixed / VOC /
        # phrase grounding), reference data/datasets/evaluation/__init__.py
        results = run_evaluation(
            cfg, model, params, dataset, tokenizer, selector,
            max_images=args.max_images, dataset_name=cfg.DATASETS.TEST[0],
            force_lvis=args.lvis,
        )
    print({k: v for k, v in results.items() if not isinstance(v, dict)})

    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    with open(os.path.join(cfg.OUTPUT_DIR, "bbox.csv"), "w", newline="") as f:
        w = csv.writer(f)
        preferred = ("AP", "AP50", "AP75", "APr", "APc", "APf", "mAP",
                     "recall@1", "recall@5", "recall@10")
        keys = [k for k in preferred if k in results]
        w.writerow(keys)
        w.writerow([f"{results[k]:.4f}" for k in keys])

    if cfg.TEST.EXPECTED_RESULTS:
        check_expected_results(
            results, cfg.TEST.EXPECTED_RESULTS, cfg.TEST.EXPECTED_RESULTS_SIGMA_TOL
        )
        print("expected-results check passed")


if __name__ == "__main__":
    main()
