"""Golden end-to-end test: synthetic COCO dataset -> full eval pipeline (CPU)."""
import json
import os

import numpy as np
import pytest

from mqdet_tpu.data.coco import CocoDetectionDataset
from mqdet_tpu.data.tokenizer import get_tokenizer
from mqdet_tpu.mq.bank import QueryBank
from mqdet_tpu.mq.selector import QuerySelector
from mqdet_tpu.utils.builders import build_model, tiny_test_config


@pytest.fixture(scope="module")
def synthetic_coco(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    ann_id = 1
    for i in range(4):
        arr = (rng.uniform(0, 255, (60, 80, 3))).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i}.png")
        images.append({"id": i, "file_name": f"{i}.png", "height": 60, "width": 80})
        for j in range(2):
            annotations.append(
                {
                    "id": ann_id, "image_id": i,
                    "category_id": (j % 3) + 1,
                    "bbox": [5.0 + 10 * j, 5.0, 20.0, 25.0],
                    "area": 500.0, "iscrowd": 0,
                }
            )
            ann_id += 1
    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": 1, "name": "cat"}, {"id": 2, "name": "dog"},
            {"id": 3, "name": "hot_dog"},
        ],
    }
    ann_file = root / "ann.json"
    ann_file.write_text(json.dumps(ann))
    return str(ann_file), str(img_dir)


def test_dataset_reader(synthetic_coco):
    ann_file, img_dir = synthetic_coco
    ds = CocoDetectionDataset(ann_file, img_dir)
    assert len(ds) == 4
    assert ds.ind_to_class == {1: "cat", 2: "dog", 3: "hot_dog"}
    boxes, labels = ds.annotations(0)
    assert boxes.shape == (2, 4)
    img = ds.load_image(0)
    assert img.shape == (60, 80, 3)


def test_few_shot_subsample(synthetic_coco):
    ann_file, img_dir = synthetic_coco
    ds = CocoDetectionDataset(ann_file, img_dir, few_shot=1)
    assert 1 <= len(ds) <= 4


@pytest.mark.slow
def test_run_inference_e2e(synthetic_coco):
    import jax

    ann_file, img_dir = synthetic_coco
    cfg = tiny_test_config()
    cfg.TEST.CHUNKED_EVALUATION = 2
    cfg.TEST.CHUNK_PARALLELISM = 2
    cfg.VISION_QUERY.MAX_CLASSES_PER_PROMPT = 2
    cfg.MODEL.ATSS.DETECTIONS_PER_IMG = 10
    cfg.TPU.IMAGE_BUCKETS = ((64, 96),)
    cfg.INPUT.MIN_SIZE_TEST = 48
    cfg.INPUT.MAX_SIZE_TEST = 80
    cfg.TPU.COMPUTE_DTYPE = "float32"

    model = build_model(cfg)
    ds = CocoDetectionDataset(ann_file, img_dir)
    tok = get_tokenizer()

    bank = QueryBank(channels=cfg.MODEL.BACKBONE.OUT_CHANNELS)
    r = np.random.default_rng(0)
    for lab in (1, 2, 3):
        bank.add(lab, r.standard_normal((5, 1, cfg.MODEL.BACKBONE.OUT_CHANNELS)).astype(np.float32))
    selector = QuerySelector(bank, num_query_per_class=2, max_labels=2)

    # init params via a fake forward
    import jax.numpy as jnp
    from mqdet_tpu.utils.builders import synthetic_batch

    b = synthetic_batch(cfg, 1, (64, 96), num_labels=2, k_shot=2)
    args = tuple(jnp.asarray(b[k]) for k in
                 ["images", "input_ids", "attention_mask", "queries", "query_mask"])
    params = model.init(jax.random.PRNGKey(0), *args)

    from mqdet_tpu.engine.inference import run_inference

    results = run_inference(cfg, model, params, ds, tok, selector, verbose=False)
    assert "AP" in results and np.isfinite(results["AP"])
    assert results["images_per_second"] > 0


@pytest.mark.slow
def test_extract_and_online_update(synthetic_coco):
    import jax
    import jax.numpy as jnp

    ann_file, img_dir = synthetic_coco
    cfg = tiny_test_config()
    cfg.TPU.IMAGE_BUCKETS = ((64, 96),)
    cfg.INPUT.MIN_SIZE_TEST = 48
    cfg.INPUT.MAX_SIZE_TEST = 80
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    ds = CocoDetectionDataset(ann_file, img_dir)

    from mqdet_tpu.data.transforms import EvalTransform
    from mqdet_tpu.mq.extract import extract_queries_into_bank, make_extract_fn
    from mqdet_tpu.utils.builders import synthetic_batch

    b = synthetic_batch(cfg, 1, (64, 96), num_labels=2, k_shot=2)
    args = tuple(jnp.asarray(b[k]) for k in
                 ["images", "input_ids", "attention_mask", "queries", "query_mask"])
    params = model.init(jax.random.PRNGKey(0), *args)

    extract_fn = make_extract_fn(model, (64, 96), cfg)
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

    bank = QueryBank(channels=cfg.MODEL.BACKBONE.OUT_CHANNELS, num_scales=1)
    bank = extract_queries_into_bank(extract_fn, params, data_iter(), bank)
    # annotations only cover categories 1 and 2 (j % 3 + 1 for j in 0..1)
    assert set(bank.labels) == {1, 2}
    assert all(bank.count(l) > 0 for l in (1, 2))
    feats = bank.get(1)
    assert feats.shape[-1] == cfg.MODEL.BACKBONE.OUT_CHANNELS
    assert np.isfinite(feats).all()
