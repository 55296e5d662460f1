#!/usr/bin/env python
"""Modulated pre-training / training CLI.

Capability twin of tools/train_net.py (reference): config layering
(--config-file + dotted opts + TUNING_HIGHLEVEL_OVERRIDE recipes), model
build, frozen-parameter partition, data-parallel training over the TPU mesh,
checkpoint/resume, and --extract-query mode (tools/train_net.py:256-336).

Usage:
  python tools/train.py --config-file configs/pretrain/mq-glip-t.yaml \
      [--extract-query] [OPTS ...]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mqdet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="MQ-Det TPU training")
    p.add_argument("--config-file", required=True)
    p.add_argument("--task-config", default=None)
    p.add_argument("--additional-model-config", default=None)
    p.add_argument("--extract-query", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--profile-dir", default=None,
        help="capture a jax.profiler trace of the train loop into this dir",
    )
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return p.parse_args()


def load_config(args):
    from mqdet_tpu.core.config import frozen_patterns, default_config

    cfg = default_config()
    cfg.merge_from_file(args.config_file)
    # reference override layering (tools/train_net.py:422-432): base yaml ->
    # --task-config -> --additional-model-config -> positional KEY VALUE opts
    if getattr(args, "task_config", None):
        cfg.merge_from_file(args.task_config)
    if getattr(args, "additional_model_config", None):
        cfg.merge_from_file(args.additional_model_config)
    if getattr(args, "opts", None):
        cfg.merge_from_list(args.opts)
    return cfg


def build_dataset(cfg, name: str, train: bool):
    """Dataset factory dispatch (reference: paths_catalog factory field +
    data/datasets/__init__.py registry). The REGISTER block may carry a
    `factory` key; default is the COCO-format reader used by every MQ-Det
    config."""
    from mqdet_tpu.data import datasets_extra as DE
    from mqdet_tpu.data.coco import CocoDetectionDataset
    from mqdet_tpu.data.tsv import ODTSVDataset

    reg = cfg.DATASETS.REGISTER.get(name)
    assert reg is not None, (
        f"dataset {name!r} not in DATASETS.REGISTER — register it with "
        "img_dir/ann_file in the config"
    )
    root = cfg.DATASETS.DATA_ROOT
    factory = reg.get("factory", "CocoDetectionDataset")

    if factory in ("TSVDataset", "ODTSVDataset"):
        return ODTSVDataset(os.path.join(root, reg["ann_file"]))
    if factory in ("CaptionTSV", "CaptionTSVDataset"):
        return DE.CaptionTSVDataset(os.path.join(root, reg["ann_file"]))
    if factory in ("CocoDetectionTSV", "CocoDetectionTSVDataset"):
        return DE.CocoDetectionTSVDataset(
            os.path.join(root, reg["ann_file"]),
            categories=reg.get("categories"),
        )
    if factory in ("PseudoData", "PseudoDataDataset"):
        return DE.PseudoDataDataset(
            os.path.join(root, reg["ann_file"]),
            caption_format_version=reg.get("caption_format_version", "v1"),
        )
    if factory in ("ImageNet", "ImageNetDataset"):
        return DE.ImageNetDataset(reg["ann_file"], os.path.join(root, reg.get("img_dir", "")))
    if factory == "Background":
        return DE.BackgroundDataset(
            os.path.join(root, reg["ann_file"]), os.path.join(root, reg["img_dir"])
        )
    if factory == "PascalVOCDataset":
        return DE.PascalVOCDataset(
            os.path.join(root, reg["data_dir"]), reg.get("split", "train")
        )
    if factory == "MixedDataset":
        return DE.MixedDataset(
            os.path.join(root, reg["ann_file"]),
            os.path.join(root, reg["img_dir_coco"]),
            os.path.join(root, reg["img_dir_vg"]),
        )
    grounding = {
        "ModulatedDataset": DE.GroundingCaptionDataset,
        "FlickrDataset": DE.FlickrDataset,
        "RefExpDataset": DE.RefExpDataset,
        "GQADataset": DE.GQADataset,
        "PhrasecutDetection": DE.PhrasecutDetection,
    }
    if factory in grounding:
        return grounding[factory](
            os.path.join(root, reg["ann_file"]), os.path.join(root, reg["img_dir"])
        )

    override = None
    if cfg.DATASETS.USE_OVERRIDE_CATEGORY and cfg.DATASETS.OVERRIDE_CATEGORY:
        # ODinW configs carry the corrected category list as a JSON string
        # (reference DATASETS.OVERRIDE_CATEGORY, tools/finetune.py:567-575)
        import json as _json

        override = _json.loads(cfg.DATASETS.OVERRIDE_CATEGORY)
    return CocoDetectionDataset(
        os.path.join(root, reg["ann_file"]),
        os.path.join(root, reg["img_dir"]),
        exclude_crowd=cfg.DATASETS.EXCLUDE_CROWD,
        few_shot=cfg.DATASETS.FEW_SHOT if train else 0,
        shuffle_seed=cfg.DATASETS.SHUFFLE_SEED,
        override_category=override,
    )


def main():
    args = parse_args()
    cfg = load_config(args)
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    with open(os.path.join(cfg.OUTPUT_DIR, "config.yml"), "w") as f:
        f.write(cfg.dump_yaml())

    import jax
    import jax.numpy as jnp

    from mqdet_tpu.core.config import frozen_patterns, trainable_patterns
    from mqdet_tpu.data.loader import GroundingTrainLoader
    from mqdet_tpu.data.tokenizer import get_tokenizer
    from mqdet_tpu.engine.train import init_train_state, make_train_step
    from mqdet_tpu.engine.trainer import do_train
    from mqdet_tpu.io.checkpoints import Checkpointer
    from mqdet_tpu.io.torch_import import import_glip_checkpoint, load_torch_state_dict
    from mqdet_tpu.mq.bank import QueryBank
    from mqdet_tpu.mq.selector import QuerySelector
    from mqdet_tpu.ops.anchors import anchors_for_fpn
    from mqdet_tpu.parallel.mesh import make_mesh
    from mqdet_tpu.utils.builders import build_model, synthetic_batch

    model = build_model(cfg)
    tokenizer = get_tokenizer(cfg.MODEL.LANGUAGE_BACKBONE.TOKENIZER_TYPE)
    dataset = build_dataset(cfg, cfg.DATASETS.TRAIN[0], train=True)

    bank = None
    if cfg.VISION_QUERY.ENABLED and cfg.VISION_QUERY.QUERY_BANK_PATH:
        path = cfg.VISION_QUERY.QUERY_BANK_PATH
        bank = (
            QueryBank.from_torch_pth(path) if path.endswith(".pth")
            else QueryBank.load(path)
        )
    selector = QuerySelector(
        bank,
        num_query_per_class=cfg.VISION_QUERY.NUM_QUERY_PER_CLASS,
        pure_text_rate=cfg.VISION_QUERY.PURE_TEXT_RATE,
        random_kshot=cfg.VISION_QUERY.RANDOM_KSHOT,
        max_labels=cfg.VISION_QUERY.MAX_CLASSES_PER_PROMPT,
    )

    bucket = tuple(cfg.TPU.IMAGE_BUCKETS[0])
    b0 = synthetic_batch(
        cfg, 1, bucket, num_labels=2,
        k_shot=cfg.VISION_QUERY.NUM_QUERY_PER_CLASS,
    )
    init_args = tuple(
        jnp.asarray(b0[k])
        for k in ["images", "input_ids", "attention_mask", "queries", "query_mask"]
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(cfg.SOLVER.SEED), *init_args)

    if cfg.MODEL.WEIGHT:
        state_dict = load_torch_state_dict(cfg.MODEL.WEIGHT)
        if cfg.GROUNDINGDINO.enabled:
            from mqdet_tpu.io.torch_import import import_gdino_checkpoint

            params, report = import_gdino_checkpoint(
                params, state_dict,
                enc_layers=cfg.GROUNDINGDINO.enc_layers,
                dec_layers=cfg.GROUNDINGDINO.dec_layers,
            )
        else:
            params, report = import_glip_checkpoint(params, state_dict)
        print(
            f"imported {len(report['matched'])} params; "
            f"{len(report['missing'])} missing; {len(report['unused'])} unused"
        )

    if args.extract_query:
        from mqdet_tpu.data.transforms import EvalTransform
        from mqdet_tpu.mq.extract import extract_queries_into_bank, make_extract_fn

        extract_fn = make_extract_fn(model, bucket, cfg)
        transform = EvalTransform(cfg)

        # host-sharded extraction (reference: DDP-wrapped extract,
        # tools/train_net.py:287-336, which left per-rank UNMERGED bank
        # files; here ranks merge below and rank 0 saves one bank)
        import jax as _jax

        ext_ids = dataset.ids[_jax.process_index() :: _jax.process_count()]

        def data_iter():
            for img_id in ext_ids:
                img = dataset.load_image(img_id)
                padded, (oh, ow), (sy, sx) = transform(img)
                boxes, labels = dataset.annotations(img_id)
                boxes = boxes / np.array([sx, sy, sx, sy], np.float32)
                yield {
                    "image": jnp.asarray(padded[None]),
                    "boxes": boxes,
                    "labels": labels,
                    "image_size": (float(oh), float(ow)),
                }

        out_bank = QueryBank(
            channels=cfg.MODEL.BACKBONE.OUT_CHANNELS,
            num_scales=cfg.VISION_QUERY.NUM_SCALES,
        )
        extract_queries_into_bank(
            extract_fn, params, data_iter(), out_bank,
            max_query_number=cfg.VISION_QUERY.MAX_QUERY_NUMBER,
        )
        out_bank.allgather_merge(
            capacity=cfg.VISION_QUERY.MAX_QUERY_NUMBER
        )
        save_path = cfg.VISION_QUERY.QUERY_BANK_SAVE_PATH or os.path.join(
            cfg.OUTPUT_DIR, "query_bank.npz"
        )
        if _jax.process_index() == 0:
            out_bank.save(save_path)
        print(f"saved query bank ({len(out_bank)} classes) to {save_path}")
        return

    loader = GroundingTrainLoader(dataset, cfg, tokenizer, selector)
    if cfg.SOLVER.MAX_ITER <= 0:
        cfg.SOLVER.MAX_ITER = cfg.SOLVER.MAX_EPOCH * loader.steps_per_epoch()

    state, tx, merge = init_train_state(params, cfg, trainable_patterns(cfg), frozen_patterns(cfg))

    def apply_fn(p, *a, **kw):
        return model.apply(p, *a, **kw)

    if cfg.GROUNDINGDINO.enabled:
        # MQ-GroundingDINO branch: Hungarian set criterion, no anchors
        # (reference: one engine serves both stacks,
        # groundingdino.py:608-641 for the training criterion)
        from mqdet_tpu.engine.train import make_gdino_train_step

        train_step = make_gdino_train_step(apply_fn, merge, tx, cfg)
    else:
        anchors_l = anchors_for_fpn(
            bucket,
            strides=tuple(cfg.MODEL.RPN.ANCHOR_STRIDE),
            sizes=tuple(cfg.MODEL.RPN.ANCHOR_SIZES),
            aspect_ratios=tuple(cfg.MODEL.RPN.ASPECT_RATIOS),
        )
        anchors = jnp.asarray(np.concatenate(anchors_l))
        level_sizes = tuple(a.shape[0] for a in anchors_l)
        train_step = make_train_step(apply_fn, merge, tx, anchors, level_sizes, cfg)
    mesh = make_mesh(tuple(cfg.TPU.MESH_SHAPE), tuple(cfg.TPU.MESH_AXIS_NAMES))
    checkpointer = Checkpointer(cfg.OUTPUT_DIR, cfg.SOLVER.MAX_TO_KEEP)

    start_iter = 0
    if args.resume and checkpointer.has_checkpoint():
        state, start_iter = checkpointer.restore(state)
        print(f"resumed from iteration {start_iter}")

    import contextlib

    from mqdet_tpu.utils.profiling import trace

    prof = trace(args.profile_dir) if args.profile_dir else contextlib.nullcontext()
    with prof:
        state, best = do_train(
            cfg, train_step, state, loader, mesh=mesh,
            checkpointer=checkpointer, start_iter=start_iter,
        )
    print(f"training done; best eval result: {best}")


if __name__ == "__main__":
    main()
