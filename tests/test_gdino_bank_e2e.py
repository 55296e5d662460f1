"""GDINO bank extraction + eval + online update, end to end (verdict ask #6).

The reference extracts GDINO banks through the GDINO twin of extract_query
(groundingdino_new/models/GroundingDINO/groundingdino.py:340-420) and feeds
them to the same QuerySelector. Here the model-generic pipeline
(mq/extract.make_extract_fn over MQGroundingDINO.encode_image ->
QueryBank -> run_inference -> engine.inference.online_update) is proven on
the GDINO family: extract a bank from GT boxes of a synthetic COCO set,
evaluate with it, then run one online-update turn feeding detections back
into the bank.
"""
import json
import os

import numpy as np
import pytest

from mqdet_tpu.data.coco import CocoDetectionDataset
from mqdet_tpu.data.tokenizer import get_tokenizer
from mqdet_tpu.mq.bank import QueryBank
from mqdet_tpu.mq.selector import QuerySelector
from mqdet_tpu.utils.builders import build_model, tiny_gdino_config

pytestmark = pytest.mark.slow  # tiny-GDINO jit x3 (extract/encode/head)

BUCKET = (64, 96)


@pytest.fixture(scope="module")
def synthetic_coco(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("gdino_coco")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(3)
    images, annotations = [], []
    ann_id = 1
    for i in range(3):
        arr = (rng.uniform(0, 255, (60, 80, 3))).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i}.png")
        images.append(
            {"id": i, "file_name": f"{i}.png", "height": 60, "width": 80}
        )
        for j in range(2):
            annotations.append(
                {
                    "id": ann_id, "image_id": i,
                    "category_id": (j % 3) + 1,
                    "bbox": [5.0 + 12 * j, 6.0, 22.0, 24.0],
                    "area": 528.0, "iscrowd": 0,
                }
            )
            ann_id += 1
    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": 1, "name": "cat"}, {"id": 2, "name": "dog"},
            {"id": 3, "name": "bird"},
        ],
    }
    ann_file = root / "ann.json"
    ann_file.write_text(json.dumps(ann))
    return str(ann_file), str(img_dir)


def _cfg():
    cfg = tiny_gdino_config()
    cfg.TPU.IMAGE_BUCKETS = (BUCKET,)
    cfg.INPUT.MIN_SIZE_TEST = 48
    cfg.INPUT.MAX_SIZE_TEST = 80
    cfg.TPU.COMPUTE_DTYPE = "float32"
    # GDINO feeds 4 pyramid levels (strides 8..64) to the pooler — the
    # reference GDINO configs carry 4 POOLER_SCALES
    # (configs/pretrain/mq-groundingdino-t.yaml ROI_BOX_HEAD block)
    cfg.MODEL.ROI_BOX_HEAD.POOLER_SCALES = (0.125, 0.0625, 0.03125, 0.015625)
    cfg.TEST.CHUNKED_EVALUATION = 2
    cfg.TEST.CHUNK_PARALLELISM = 2
    cfg.VISION_QUERY.MAX_CLASSES_PER_PROMPT = 2
    return cfg


@pytest.fixture(scope="module")
def gdino_setup(synthetic_coco):
    import jax
    import jax.numpy as jnp

    from mqdet_tpu.utils.builders import synthetic_batch

    ann_file, img_dir = synthetic_coco
    cfg = _cfg()
    model = build_model(cfg)
    ds = CocoDetectionDataset(ann_file, img_dir)
    b = synthetic_batch(cfg, 1, BUCKET, num_labels=2, k_shot=2)
    args = tuple(
        jnp.asarray(b[k]) for k in
        ["images", "input_ids", "attention_mask", "queries", "query_mask"]
    )
    params = model.init(jax.random.PRNGKey(0), *args)
    return cfg, model, ds, params


def test_gdino_bank_extraction_e2e(gdino_setup):
    """Extract a bank through MQGroundingDINO.encode_image from GT boxes."""
    from mqdet_tpu.data.transforms import EvalTransform
    from mqdet_tpu.mq.extract import (
        extract_queries_into_bank,
        make_extract_fn,
    )

    cfg, model, ds, params = gdino_setup
    import jax.numpy as jnp

    extract_fn = make_extract_fn(model, BUCKET, cfg)
    transform = EvalTransform(cfg)

    def data_iter():
        for img_id in ds.ids:
            img = ds.load_image(img_id)
            padded, (oh, ow), (sy, sx) = transform(img)
            boxes, labels = ds.annotations(img_id)
            boxes = boxes / np.array([sx, sy, sx, sy], np.float32)
            yield {
                "image": jnp.asarray(padded[None]),
                "boxes": boxes,
                "labels": labels,
                "image_size": (float(oh), float(ow)),
            }

    bank = QueryBank(
        channels=cfg.MODEL.BACKBONE.OUT_CHANNELS,
        num_scales=cfg.VISION_QUERY.NUM_SCALES,
    )
    extract_queries_into_bank(
        extract_fn, params, data_iter(), bank, max_query_number=5
    )
    assert sorted(bank.labels) == [1, 2]  # only labels with GT boxes
    for lab in (1, 2):
        feats = bank.get(lab)
        assert feats.shape[-1] == cfg.MODEL.BACKBONE.OUT_CHANNELS
        assert np.isfinite(feats).all() and np.abs(feats).sum() > 0


def test_gdino_eval_and_online_update_with_extracted_bank(gdino_setup):
    """Evaluate with the extracted bank, then one online-update turn grows
    it from above-threshold detections (engine/inference.py:383-499)."""
    from mqdet_tpu.data.transforms import EvalTransform
    from mqdet_tpu.engine.inference import online_update, run_inference
    from mqdet_tpu.mq.extract import (
        extract_queries_into_bank,
        make_extract_fn,
    )

    cfg, model, ds, params = gdino_setup
    import jax.numpy as jnp

    extract_fn = make_extract_fn(model, BUCKET, cfg)
    transform = EvalTransform(cfg)

    def data_iter():
        for img_id in ds.ids:
            img = ds.load_image(img_id)
            padded, (oh, ow), (sy, sx) = transform(img)
            boxes, labels = ds.annotations(img_id)
            boxes = boxes / np.array([sx, sy, sx, sy], np.float32)
            yield {
                "image": jnp.asarray(padded[None]),
                "boxes": boxes,
                "labels": labels,
                "image_size": (float(oh), float(ow)),
            }

    bank = QueryBank(
        channels=cfg.MODEL.BACKBONE.OUT_CHANNELS,
        num_scales=cfg.VISION_QUERY.NUM_SCALES,
    )
    extract_queries_into_bank(
        extract_fn, params, data_iter(), bank, max_query_number=5
    )
    selector = QuerySelector(bank, num_query_per_class=2, max_labels=2)

    tok = get_tokenizer()
    results = run_inference(
        cfg, model, params, ds, tok, selector, verbose=False
    )
    assert "AP" in results and np.isfinite(results["AP"])

    # Online update against a FRESH empty bank: with the GT-extracted bank,
    # exclude_similar correctly dedups the pooled detection features (same
    # images, cosine > 0.85) and the bank legitimately may not grow. An
    # empty bank isolates the feedback loop itself: any above-threshold
    # detection MUST be pooled back in. Thresholds at 0 so random-weight
    # scores pass (reference defaults assume trained calibration).
    cfg.VISION_QUERY.SCORE_THRESHOLD = 0.0
    cfg.GROUNDINGDINO.box_threshold = 0.0
    cfg.VISION_QUERY.MAX_TEST_QUERY_NUMBER = 50
    fresh = QueryBank(
        channels=cfg.MODEL.BACKBONE.OUT_CHANNELS,
        num_scales=cfg.VISION_QUERY.NUM_SCALES,
    )
    selector2 = QuerySelector(fresh, num_query_per_class=2, max_labels=2)
    online_update(
        cfg, model, params, ds, tok, selector2, extract_fn, num_turns=1
    )
    grown = {lab: fresh.count(lab) for lab in fresh.labels}
    assert sum(grown.values()) > 0, (
        f"online update fed nothing back into an empty bank: {grown}"
    )
