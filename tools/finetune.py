#!/usr/bin/env python
"""Few-shot fine-tuning over ODinW-style task configs.

Capability twin of tools/finetune.py: per task config and shuffle seed,
apply the tuning recipe (TUNING_HIGHLEVEL_OVERRIDE, 16 named freeze recipes
in the reference — the MQ-relevant ones live in core/config.py
TUNING_RECIPES), auto-extract a temporary query bank from the few-shot train
split when QUERY_BANK_PATH is empty (tools/finetune.py:54-97), train with
eval-per-epoch + autostep + early stop, then test.

Usage:
  python tools/finetune.py --ft-tasks configs/odinw_13/Aquarium.yaml \
      --custom_shot_and_epoch_and_general_copy 3_200_4 [OPTS ...]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mqdet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True, help="base model config")
    p.add_argument("--ft-tasks", required=True, help="comma-separated task yamls")
    p.add_argument(
        "--custom_shot_and_epoch_and_general_copy", default="3_200_4",
        help="shot_epoch_generalcopy",
    )
    p.add_argument("--weight", default=None)
    p.add_argument("--seeds", default="0", help="comma-separated shuffle seeds")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    shot, epoch, copies = (int(x) for x in
                           args.custom_shot_and_epoch_and_general_copy.split("_"))

    from tools.train import build_dataset, load_config

    import jax
    import jax.numpy as jnp

    from mqdet_tpu.core.config import default_config, frozen_patterns, trainable_patterns
    from mqdet_tpu.data.loader import GroundingTrainLoader
    from mqdet_tpu.data.tokenizer import get_tokenizer
    from mqdet_tpu.data.transforms import EvalTransform
    from mqdet_tpu.engine.inference import run_inference
    from mqdet_tpu.engine.train import init_train_state, make_train_step
    from mqdet_tpu.engine.trainer import do_train
    from mqdet_tpu.io.torch_import import import_glip_checkpoint, load_torch_state_dict
    from mqdet_tpu.mq.bank import QueryBank
    from mqdet_tpu.mq.extract import extract_queries_into_bank, make_extract_fn
    from mqdet_tpu.mq.selector import QuerySelector
    from mqdet_tpu.ops.anchors import anchors_for_fpn
    from mqdet_tpu.parallel.mesh import make_mesh
    from mqdet_tpu.utils.builders import build_model, synthetic_batch

    results = {}
    for task in args.ft_tasks.split(","):
        for seed in (int(s) for s in args.seeds.split(",")):
            cfg = default_config()
            cfg.merge_from_file(args.config_file)
            cfg.merge_from_file(task)
            if args.opts:
                cfg.merge_from_list(args.opts)
            cfg.DATASETS.FEW_SHOT = shot
            cfg.DATASETS.SHUFFLE_SEED = seed
            cfg.DATASETS.GENERAL_COPY = copies
            cfg.SOLVER.MAX_EPOCH = epoch if epoch else cfg.SOLVER.MAX_EPOCH
            if not cfg.SOLVER.TUNING_HIGHLEVEL_OVERRIDE:
                cfg.SOLVER.TUNING_HIGHLEVEL_OVERRIDE = "vision_query_v3"
            if args.weight:
                cfg.MODEL.WEIGHT = args.weight

            model = build_model(cfg)
            tokenizer = get_tokenizer(cfg.MODEL.LANGUAGE_BACKBONE.TOKENIZER_TYPE)
            train_ds = build_dataset(cfg, cfg.DATASETS.TRAIN[0], train=True)
            test_ds = build_dataset(cfg, cfg.DATASETS.TEST[0], train=False)

            bucket = tuple(cfg.TPU.IMAGE_BUCKETS[0])
            b0 = synthetic_batch(
                cfg, 1, bucket, num_labels=2,
                k_shot=cfg.VISION_QUERY.NUM_QUERY_PER_CLASS,
            )
            init_args = tuple(
                jnp.asarray(b0[k]) for k in
                ["images", "input_ids", "attention_mask", "queries", "query_mask"]
            )
            params = jax.jit(model.init)(jax.random.PRNGKey(seed), *init_args)
            if cfg.MODEL.WEIGHT:
                params, _ = import_glip_checkpoint(
                    params, load_torch_state_dict(cfg.MODEL.WEIGHT)
                )

            # auto-extract a temporary bank from the few-shot split
            # (tools/finetune.py:54-97)
            if cfg.VISION_QUERY.ENABLED and not cfg.VISION_QUERY.QUERY_BANK_PATH:
                extract_fn = make_extract_fn(model, bucket, cfg)
                transform = EvalTransform(cfg)

                def data_iter():
                    for img_id in train_ds.ids:
                        img = train_ds.load_image(img_id)
                        padded, (oh, ow), (sy, sx) = transform(img)
                        boxes, labels = train_ds.annotations(img_id)
                        boxes = boxes / np.array([sx, sy, sx, sy], np.float32)
                        yield {
                            "image": jnp.asarray(padded[None]),
                            "boxes": boxes, "labels": labels,
                            "image_size": (float(oh), float(ow)),
                        }

                bank = QueryBank(
                    channels=cfg.MODEL.BACKBONE.OUT_CHANNELS,
                    num_scales=cfg.VISION_QUERY.NUM_SCALES,
                )
                extract_queries_into_bank(
                    extract_fn, params, data_iter(), bank,
                    max_query_number=cfg.VISION_QUERY.NUM_QUERY_PER_CLASS,
                )
            elif cfg.VISION_QUERY.ENABLED:
                path = cfg.VISION_QUERY.QUERY_BANK_PATH
                bank = (
                    QueryBank.from_torch_pth(path) if path.endswith(".pth")
                    else QueryBank.load(path)
                )
            else:
                bank = None
            selector = QuerySelector(
                bank, num_query_per_class=cfg.VISION_QUERY.NUM_QUERY_PER_CLASS,
                pure_text_rate=cfg.VISION_QUERY.PURE_TEXT_RATE,
                max_labels=cfg.VISION_QUERY.MAX_CLASSES_PER_PROMPT,
            )

            loader = GroundingTrainLoader(train_ds, cfg, tokenizer, selector, seed=seed)
            cfg.SOLVER.MAX_ITER = cfg.SOLVER.MAX_EPOCH * loader.steps_per_epoch()
            state, tx, merge = init_train_state(params, cfg, trainable_patterns(cfg), frozen_patterns(cfg))

            anchors_l = anchors_for_fpn(
                bucket, strides=tuple(cfg.MODEL.RPN.ANCHOR_STRIDE),
                sizes=tuple(cfg.MODEL.RPN.ANCHOR_SIZES),
                aspect_ratios=tuple(cfg.MODEL.RPN.ASPECT_RATIOS),
            )
            anchors = jnp.asarray(np.concatenate(anchors_l))
            level_sizes = tuple(a.shape[0] for a in anchors_l)
            train_step = make_train_step(
                lambda p, *a, **kw: model.apply(p, *a, **kw),
                merge, tx, anchors, level_sizes, cfg,
            )

            def eval_fn(st):
                merged = merge(st.trainable, st.frozen)
                r = run_inference(
                    cfg, model, merged, test_ds, tokenizer, selector, verbose=False
                )
                return r["AP"]

            mesh = make_mesh(tuple(cfg.TPU.MESH_SHAPE), tuple(cfg.TPU.MESH_AXIS_NAMES))
            state, best = do_train(
                cfg, train_step, state, loader, mesh=mesh, eval_fn=eval_fn
            )
            final = eval_fn(state)
            results[(task, seed)] = max(best, final)
            print(f"[finetune] {task} seed={seed}: AP={results[(task, seed)]:.4f}")

    if results:
        avg = sum(results.values()) / len(results)
        print(f"[finetune] average AP over {len(results)} runs: {avg:.4f}")


if __name__ == "__main__":
    main()
