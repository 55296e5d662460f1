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


def _fake_fns_factory(net_dets_by_bucket):
    """A make_split_predict_fns stand-in whose head emits fixed detections
    (network-frame) for chunk slot row 0, regardless of features."""
    import jax.numpy as jnp

    from mqdet_tpu.core.detections import Detections

    created = []

    def fake_make(model, bucket, cfg):
        created.append(tuple(bucket))
        boxes, scores, labels = net_dets_by_bucket(tuple(bucket))
        n = len(scores)
        cp = max(1, cfg.TEST.CHUNK_PARALLELISM)

        def encode_fn(params, images):
            return (jnp.zeros((1, 1, 1, 1)),)

        def head_fn(params, feats, ii, am, q, qm, agg, sizes):
            z = np.zeros((cp, n), np.float32)
            b = np.zeros((cp, n, 4), np.float32)
            l = np.zeros((cp, n), np.int32)
            v = np.zeros((cp, n), bool)
            b[0], z[0], l[0], v[0] = boxes, scores, labels, True
            return Detections(
                boxes=jnp.asarray(b), scores=jnp.asarray(z),
                labels=jnp.asarray(l), valid=jnp.asarray(v),
            )

        return encode_fn, head_fn

    return fake_make, created


def test_run_inference_perfect_detector(synthetic_coco, monkeypatch):
    """A detector that emits exactly the GT boxes (in network coords) must
    come out of the FULL pipeline — plan, chunk groups, scale-back to image
    coords, slot->label mapping, COCO evaluator — with AP == 1.0."""
    from mqdet_tpu.data.transforms import get_resize_size
    from mqdet_tpu.engine import inference as I

    cfg = tiny_test_config()
    cfg.TPU.IMAGE_BUCKETS = ((64, 96),)
    cfg.INPUT.MIN_SIZE_TEST = 48
    cfg.INPUT.MAX_SIZE_TEST = 80
    cfg.MODEL.ATSS.DETECTIONS_PER_IMG = 10

    ann_file, img_dir = synthetic_coco
    ds = CocoDetectionDataset(ann_file, img_dir)

    # every image is 80x60 with the same GT layout: cat @ [5,5,25,30],
    # dog @ [15,5,35,30] (bbox xywh [5+10j, 5, 20, 25], category j%3+1)
    oh, ow = get_resize_size(60, 80, 48, 80)
    sy, sx = oh / 60.0, ow / 80.0
    gt_img = np.asarray(
        [[5.0, 5.0, 25.0, 30.0], [15.0, 5.0, 35.0, 30.0]], np.float32
    )
    net_boxes = gt_img * np.asarray([sx, sy, sx, sy], np.float32)

    def dets_for(bucket):
        # single chunk of 3 classes: slots 1..3 == contiguous labels 1..3
        return net_boxes, np.asarray([0.9, 0.8], np.float32), np.asarray([1, 2], np.int32)

    fake_make, created = _fake_fns_factory(dets_for)
    monkeypatch.setattr(I, "make_split_predict_fns", fake_make)

    results = I.run_inference(
        cfg, model=None, params=None, dataset=ds,
        tokenizer=get_tokenizer(), selector=None, verbose=False,
    )
    assert results["AP"] == pytest.approx(1.0)
    assert results["AP50"] == pytest.approx(1.0)
    assert created  # the pipeline actually went through our fns


def test_run_inference_multibucket(synthetic_coco, monkeypatch):
    """With two buckets, images resolve to the best-fit bucket and the
    pipeline builds compiled fns for exactly the buckets used."""
    from mqdet_tpu.engine import inference as I

    cfg = tiny_test_config()
    # 80x60 at min48/max80 resizes to (48, 64): fits the SECOND bucket
    cfg.TPU.IMAGE_BUCKETS = ((96, 128), (48, 64))
    cfg.INPUT.MIN_SIZE_TEST = 48
    cfg.INPUT.MAX_SIZE_TEST = 80
    cfg.MODEL.ATSS.DETECTIONS_PER_IMG = 10

    ann_file, img_dir = synthetic_coco
    ds = CocoDetectionDataset(ann_file, img_dir)

    def dets_for(bucket):
        return (
            np.zeros((1, 4), np.float32),
            np.asarray([0.5], np.float32),
            np.asarray([1], np.int32),
        )

    fake_make, created = _fake_fns_factory(dets_for)
    monkeypatch.setattr(I, "make_split_predict_fns", fake_make)

    I.run_inference(
        cfg, model=None, params=None, dataset=ds,
        tokenizer=get_tokenizer(), selector=None, verbose=False,
    )
    # default bucket is built eagerly; the image bucket (48, 64) lazily
    assert (48, 64) in created
    assert created.count((48, 64)) == 1  # cached, not rebuilt per image


def test_bucket_orientation_and_portrait_padding():
    """A declared (H, W) bucket also serves portrait images transposed
    (one bucket entry, two compiled geometries), and EvalTransform pads a
    portrait image without cropping. Regression: the old pick_bucket fell
    back to the largest bucket as-declared, so any portrait LVIS image
    (e.g. 640x480 original -> 1066x800 resized vs the (800, 1344) default
    bucket) crashed pad_to_bucket."""
    from mqdet_tpu.data.transforms import EvalTransform, pick_bucket

    assert pick_bucket(48, 64, ((48, 64),)) == (48, 64)
    assert pick_bucket(64, 48, ((48, 64),)) == (64, 48)
    with pytest.raises(ValueError):
        pick_bucket(100, 100, ((48, 64),))

    cfg = tiny_test_config()
    cfg.TPU.IMAGE_BUCKETS = ((800, 1344),)
    cfg.INPUT.MIN_SIZE_TEST = 800
    cfg.INPUT.MAX_SIZE_TEST = 1333
    tfm = EvalTransform(cfg)
    portrait = np.zeros((640, 480, 3), np.uint8)  # resizes to (1066, 800)
    padded, (oh, ow), _ = tfm(portrait)
    assert (oh, ow) == (1066, 800)
    assert padded.shape[:2] == (1344, 800)
