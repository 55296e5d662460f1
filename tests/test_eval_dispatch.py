"""Evaluation dispatch (engine/eval_dispatch.py) — the router the reference
implements in data/datasets/evaluation/__init__.py:10-36."""
import json

import numpy as np
import pytest

from mqdet_tpu.engine.eval_dispatch import (
    VOCEvaluator,
    build_evaluator,
    dataset_eval_style,
)
from mqdet_tpu.utils.builders import build_model, tiny_test_config


@pytest.fixture
def flickr_dataset(tmp_path):
    from PIL import Image

    from mqdet_tpu.data.datasets_extra import FlickrDataset

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(3)
    caption = "a man rides a red bicycle"
    ann = {
        "images": [
            {
                "id": 0, "file_name": "0.png", "height": 60, "width": 80,
                "caption": caption, "sentence_id": 7, "original_img_id": 42,
                # phrases: "a man" [0,5), "a red bicycle" [12,25)
                "tokens_positive_eval": [[[0, 5]], [[12, 25]]],
            }
        ],
        "annotations": [
            {"id": 1, "image_id": 0, "bbox": [5, 5, 20, 30], "area": 600,
             "iscrowd": 0, "tokens_positive": [[0, 5]]},
            {"id": 2, "image_id": 0, "bbox": [40, 20, 30, 25], "area": 750,
             "iscrowd": 0, "tokens_positive": [[12, 25]]},
        ],
        "categories": [{"id": 1, "name": "object"}],
    }
    (tmp_path / "ann.json").write_text(json.dumps(ann))
    Image.fromarray(
        (rng.uniform(0, 255, (60, 80, 3))).astype(np.uint8)
    ).save(img_dir / "0.png")
    return FlickrDataset(str(tmp_path / "ann.json"), str(img_dir))


@pytest.fixture
def voc_dataset(tmp_path):
    from PIL import Image

    from mqdet_tpu.data.datasets_extra import PascalVOCDataset

    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        (tmp_path / sub).mkdir(parents=True)
    (tmp_path / "ImageSets/Main/test.txt").write_text("000001\n")
    (tmp_path / "Annotations/000001.xml").write_text(
        """<annotation><object><name>dog</name><difficult>0</difficult>
        <bndbox><xmin>11</xmin><ymin>11</ymin><xmax>41</xmax><ymax>51</ymax></bndbox>
        </object></annotation>"""
    )
    rng = np.random.default_rng(0)
    Image.fromarray(
        (rng.uniform(0, 255, (60, 80, 3))).astype(np.uint8)
    ).save(tmp_path / "JPEGImages/000001.jpg")
    return PascalVOCDataset(str(tmp_path), "test")


def test_style_dispatch(flickr_dataset, voc_dataset):
    cfg = tiny_test_config()
    assert dataset_eval_style(cfg, flickr_dataset, "flickr30k_test") == "grounding"
    assert dataset_eval_style(cfg, voc_dataset, "voc_2007_test") == "voc"
    assert dataset_eval_style(cfg, object(), "lvis_minival") == "lvis_fixed"
    assert dataset_eval_style(cfg, object(), "coco_2017_val") == "coco"
    assert dataset_eval_style(cfg, object(), "odinw_x", force_lvis=True) == "lvis_fixed"
    assert isinstance(build_evaluator(cfg, "voc"), VOCEvaluator)


def test_voc_evaluator_perfect_and_miss():
    ev = VOCEvaluator()
    ev.register_categories([1, 2])
    gt = np.asarray([[10.0, 10.0, 40.0, 50.0]], np.float32)
    # image 1: perfect hit; image 2: localization miss for class 2
    ev.add_image("a", gt, np.asarray([1]), gt, np.asarray([0.9]), np.asarray([1]))
    ev.add_image(
        "b", gt, np.asarray([2]),
        np.asarray([[100.0, 100.0, 120.0, 130.0]], np.float32),
        np.asarray([0.8]), np.asarray([2]),
    )
    res = ev.summarize()
    assert res["AP_cls1"] == 1.0
    assert res["AP_cls2"] == 0.0
    assert res["mAP"] == 0.5 and res["AP"] == 0.5


def test_voc_dataset_run_inference_surface(voc_dataset):
    assert voc_dataset.cat_id_to_contiguous[3] == 3
    assert voc_dataset.img_neg_cats.get("000001", ()) == ()
    boxes, labels = voc_dataset.annotations("000001")
    np.testing.assert_allclose(boxes, [[10.0, 10.0, 40.0, 50.0]])
    assert voc_dataset.ind_to_class[int(labels[0])] == "dog"


@pytest.mark.slow
def test_run_grounding_inference_e2e(flickr_dataset):
    """Full phrase-grounding eval on the tiny model: the pipeline must
    produce recall metrics and a headline AP without error."""
    import jax
    import jax.numpy as jnp

    from mqdet_tpu.data.tokenizer import get_tokenizer
    from mqdet_tpu.engine.eval_dispatch import run_evaluation
    from mqdet_tpu.utils.builders import init_params_fast, synthetic_batch

    cfg = tiny_test_config()
    cfg.INPUT.MIN_SIZE_TEST = 48
    cfg.INPUT.MAX_SIZE_TEST = 64
    model = build_model(cfg)
    b = synthetic_batch(cfg, 1, tuple(cfg.TPU.IMAGE_BUCKETS[0]), num_labels=2, k_shot=2)
    args = tuple(
        jnp.asarray(b[k])
        for k in ["images", "input_ids", "attention_mask", "queries", "query_mask"]
    )
    params = init_params_fast(model, *args)
    res = run_evaluation(
        cfg, model, params, flickr_dataset, get_tokenizer(),
        dataset_name="flickr30k_test", verbose=False,
    )
    assert "recall@1" in res and "upper_bound" in res
    assert 0.0 <= res["recall@1"] <= 1.0
    assert res["AP"] == res["recall@1"]
