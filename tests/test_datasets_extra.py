"""Grounding-caption / caption-TSV / background / VOC dataset readers."""
import base64
import io
import json
import os
import random

import numpy as np
import pytest

from mqdet_tpu.data.datasets_extra import (
    BackgroundDataset,
    CaptionTSVDataset,
    FlickrDataset,
    GroundingCaptionDataset,
    MixedDataset,
    PascalVOCDataset,
    nms_screen,
    pack_caption,
)


def _png_b64(w=8, h=8):
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (w, h), (10, 20, 30)).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _write_png(path, w=8, h=8):
    from PIL import Image

    Image.new("RGB", (w, h), (1, 2, 3)).save(path)


def _grounding_json(tmp_path, data_source=None):
    imgs = []
    anns = []
    for i in range(3):
        im = {
            "id": i, "file_name": f"im{i}.png", "height": 8, "width": 8,
            "caption": f"a red ball and a blue cube {i}",
        }
        if data_source:
            im["data_source"] = data_source[i]
        imgs.append(im)
        anns.append({
            "id": 10 + i, "image_id": i, "bbox": [1, 1, 4, 4], "iscrowd": 0,
            "tokens_positive": [[2, 10]],
        })
    # image 2 gets a zero-area box only -> filtered out
    anns[-1]["bbox"] = [1, 1, 0, 4]
    p = tmp_path / "ann.json"
    p.write_text(json.dumps({"images": imgs, "annotations": anns}))
    return str(p)


def test_grounding_caption_dataset(tmp_path):
    ann = _grounding_json(tmp_path)
    for i in range(3):
        _write_png(tmp_path / f"im{i}.png")
    ds = GroundingCaptionDataset(ann, str(tmp_path))
    # image 2 has only an invalid box -> dropped (has_valid_annotation)
    assert ds.ids == [0, 1]
    assert ds.caption(0) == "a red ball and a blue cube 0"
    boxes, spans = ds.annotations(0)
    np.testing.assert_allclose(boxes, [[1, 1, 5, 5]])
    assert spans == [[(2, 10)]]
    assert ds.load_image(0).shape == (8, 8, 3)


def test_flickr_subclass_meta(tmp_path):
    ann = _grounding_json(tmp_path)
    ds = FlickrDataset(ann, str(tmp_path))
    assert ds.dataset_name == "flickr"
    assert ds.sentence_meta(0) == {}


def test_mixed_dataset_two_roots(tmp_path):
    coco_dir = tmp_path / "coco"; coco_dir.mkdir()
    vg_dir = tmp_path / "vg"; vg_dir.mkdir()
    ann = _grounding_json(tmp_path, data_source=["coco", "vg", "coco"])
    _write_png(coco_dir / "im0.png")
    _write_png(vg_dir / "im1.png")
    ds = MixedDataset(ann, str(coco_dir), str(vg_dir))
    assert ds.image_path(0).startswith(str(coco_dir))
    assert ds.image_path(1).startswith(str(vg_dir))
    assert ds.load_image(1).shape == (8, 8, 3)


def test_pack_caption_shifts_spans():
    rng = random.Random(3)
    cap, spans, green = pack_caption(
        "a cat sits", ["dogs run", "birds fly"], [[(2, 5)]], rng
    )
    (b, e) = green[0]
    assert cap[b:e] == "a cat sits"
    (sb, se) = spans[0][0]
    assert cap[sb:se] == "cat"


def test_caption_tsv_screening(tmp_path):
    rows = []
    for i in range(4):
        meta = {
            "caption": f"caption number {i} with a thing",
            "bboxes": [[0, 0, 4, 4], [0.5, 0.5, 4.2, 4.2], [5, 5, 7, 7]],
            "tokens_positive": [[[0, 7]], [[8, 14]], [[15, 20]]],
            "scores": [0.9, 0.55, 0.2],
        }
        rows.append(f"k{i}\t{json.dumps(meta)}\t{_png_b64()}")
    p = tmp_path / "cap.tsv"
    p.write_text("\n".join(rows) + "\n")

    ds = CaptionTSVDataset(
        str(p), further_screen=True, caption_conf=0.5, caption_nms=0.5
    )
    ex = ds.example(0)
    # conf screen drops score 0.2; nms drops the overlapping 0.55 box
    assert len(ex["boxes"]) == 1
    np.testing.assert_allclose(ex["boxes"][0], [0, 0, 4, 4])
    assert ex["tokens_positive"] == [[(0, 7)]]
    assert ds.load_image(0).shape == (8, 8, 3)

    # min-box filter
    ds2 = CaptionTSVDataset(str(p), caption_min_box=5)
    assert ds2.example(0) is None

    # packing keeps the positive span pointing at the same text
    ds3 = CaptionTSVDataset(str(p), pack_random_caption_number=2, seed=1)
    ex3 = ds3.example(1)
    (b, e) = ex3["tokens_positive"][0][0]
    assert ex3["caption"][b:e] == "caption"


def test_nms_screen_basic():
    boxes = np.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]], np.float32)
    scores = np.asarray([0.9, 0.8, 0.7], np.float32)
    keep = nms_screen(boxes, scores, 0.5)
    assert keep == [0, 2]


def test_background_dataset(tmp_path):
    imgs = [{"id": 5, "file_name": "bg.png"}]
    p = tmp_path / "bg.json"
    p.write_text(json.dumps({"images": imgs}))
    _write_png(tmp_path / "bg.png")
    ds = BackgroundDataset(str(p), str(tmp_path))
    assert ds.ids == [5]
    boxes, labels = ds.annotations(5)
    assert boxes.shape == (0, 4) and labels.shape == (0,)
    assert ds.load_image(5).shape == (8, 8, 3)


def test_voc_dataset(tmp_path):
    (tmp_path / "Annotations").mkdir()
    (tmp_path / "JPEGImages").mkdir()
    main = tmp_path / "ImageSets" / "Main"
    main.mkdir(parents=True)
    (main / "train.txt").write_text("000001\n")
    xml = """<annotation>
      <object><name>dog</name><difficult>0</difficult>
        <bndbox><xmin>2</xmin><ymin>3</ymin><xmax>6</xmax><ymax>7</ymax></bndbox>
      </object>
      <object><name>cat</name><difficult>1</difficult>
        <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>2</xmax><ymax>2</ymax></bndbox>
      </object>
    </annotation>"""
    (tmp_path / "Annotations" / "000001.xml").write_text(xml)
    _write_png(tmp_path / "JPEGImages" / "000001.jpg")

    ds = PascalVOCDataset(str(tmp_path), "train")
    assert ds.ids == ["000001"]
    boxes, labels = ds.annotations("000001")
    # difficult cat skipped; 1-based -> 0-based conversion
    np.testing.assert_allclose(boxes, [[1, 2, 5, 6]])
    assert list(labels) == [ds.class_to_ind["dog"]]

    ds2 = PascalVOCDataset(str(tmp_path), "train", use_difficult=True)
    boxes2, _ = ds2.annotations("000001")
    assert len(boxes2) == 2


def test_build_dataset_factory_dispatch(tmp_path):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from train import build_dataset
    from mqdet_tpu.core.config import default_config

    ann = _grounding_json(tmp_path)
    cfg = default_config()
    cfg.DATASETS.DATA_ROOT = str(tmp_path)
    cfg.DATASETS.REGISTER = {
        "flickr_train": {
            "factory": "FlickrDataset", "ann_file": "ann.json", "img_dir": ".",
        },
        "bg": {"factory": "Background", "ann_file": "bg.json", "img_dir": "."},
    }
    (tmp_path / "bg.json").write_text(json.dumps({"images": []}))
    ds = build_dataset(cfg, "flickr_train", train=True)
    assert isinstance(ds, FlickrDataset) and len(ds) == 2
    bg = build_dataset(cfg, "bg", train=True)
    assert isinstance(bg, BackgroundDataset)


def test_imagenet_dataset(tmp_path):
    from mqdet_tpu.data.datasets_extra import ImageNetDataset

    _write_png(tmp_path / "img0.png")
    _write_png(tmp_path / "img1.png")
    meta = {
        "classes": ["cat", "dog"],
        "class_to_idx": {"cat": 0, "dog": 1},
        "samples": [["img0.png", 0], ["img1.png", 1]],
    }
    (tmp_path / "meta.json").write_text(json.dumps(meta))
    ds = ImageNetDataset("meta.json", str(tmp_path))
    assert len(ds) == 2
    img, target, idx = ds[1]
    assert img.shape == (8, 8, 3) and target == 1 and idx == 1
    ds.select_class({0})  # imagenet.py:42-45 class filter
    assert len(ds) == 1 and ds.target(0) == 0


def test_coco_detection_tsv_dataset(tmp_path):
    from mqdet_tpu.data.datasets_extra import CocoDetectionTSVDataset

    rows = []
    for i in range(3):
        labels = [
            {"rect": [0, 0, 4, 4], "class": "cat"},
            {"rect": [1, 1, 6, 6], "class": "dog"},
        ]
        rows.append(f"k{i}\t{json.dumps(labels)}\t{_png_b64()}")
    p = tmp_path / "od.tsv"
    p.write_text("\n".join(rows) + "\n")

    ds = CocoDetectionTSVDataset(str(p))
    assert len(ds) == 3
    # scanned class map: sorted contiguous 1-based
    assert ds.class_to_ind == {"cat": 1, "dog": 2}
    boxes, labels = ds.annotations(0)
    np.testing.assert_allclose(boxes, [[0, 0, 4, 4], [1, 1, 6, 6]])
    assert list(labels) == [1, 2]
    assert ds.load_image(0).shape == (8, 8, 3)

    # explicit categories map restricts + remaps
    ds2 = CocoDetectionTSVDataset(str(p), categories={"dog": 7})
    b2, l2 = ds2.annotations(0)
    assert list(l2) == [7] and len(b2) == 1


def test_pseudo_data_dataset_v2_and_screening(tmp_path):
    from mqdet_tpu.data.datasets_extra import PseudoDataDataset

    # v2 nested-per-entity format (pseudo_data.py convert_anno_from_yiling)
    meta = {
        "caption": "a red ball near a box",
        "bboxes": [[[0, 0, 4, 4], [0.2, 0.2, 4.1, 4.1]], [[5, 5, 7, 7]]],
        "tokens_positive": [[[2, 10]], [[16, 21]]],
        "scores": [[0.9, 0.55], [0.4]],
        "img_w": 8, "img_h": 8,
    }
    p = tmp_path / "pseudo.tsv"
    p.write_text(f"k0\t{json.dumps(meta)}\t{_png_b64()}\n")

    ds = PseudoDataDataset(
        str(p), caption_format_version="v2", further_screen=True,
        caption_conf=0.5, caption_nms=0.5,
    )
    ex = ds.example(0)
    # flatten -> 3 boxes; strict conf (>0.5) drops 0.4; nms drops the dup
    assert len(ex["boxes"]) == 1
    np.testing.assert_allclose(ex["boxes"][0], [0, 0, 4, 4])
    assert ex["tokens_positive"] == [[(2, 10)]]
    # greenlight covers the whole caption (pseudo_data.py:167)
    assert ex["greenlight_span"] == [(0, len(meta["caption"]))]

    # strictness: score == conf is dropped (reference uses >)
    meta2 = dict(meta)
    meta2["bboxes"] = [[[0, 0, 4, 4]]]
    meta2["scores"] = [[0.5]]
    meta2["tokens_positive"] = [[[2, 10]]]
    p2 = tmp_path / "pseudo2.tsv"
    p2.write_text(f"k0\t{json.dumps(meta2)}\t{_png_b64()}\n")
    ds2 = PseudoDataDataset(
        str(p2), caption_format_version="v2", further_screen=True,
        caption_conf=0.5, caption_min_box=1,
    )
    assert ds2.example(0) is None

    # inference_caption mode: caption only, no boxes
    ds3 = PseudoDataDataset(str(p), inference_caption=True)
    ex3 = ds3.example(0)
    assert ex3["caption"] == meta["caption"] and len(ex3["boxes"]) == 0


def test_new_factories_dispatch(tmp_path):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from train import build_dataset
    from mqdet_tpu.core.config import default_config
    from mqdet_tpu.data.datasets_extra import (
        CocoDetectionTSVDataset,
        ImageNetDataset,
        PseudoDataDataset,
    )

    labels = [{"rect": [0, 0, 4, 4], "class": "cat"}]
    (tmp_path / "od.tsv").write_text(f"k0\t{json.dumps(labels)}\t{_png_b64()}\n")
    meta = {"caption": "x", "bboxes": [[0, 0, 4, 4]],
            "tokens_positive": [[[0, 1]]], "scores": [1.0]}
    (tmp_path / "ps.tsv").write_text(f"k0\t{json.dumps(meta)}\t{_png_b64()}\n")
    _write_png(tmp_path / "i.png")
    (tmp_path / "meta.json").write_text(json.dumps(
        {"classes": ["c"], "class_to_idx": {"c": 0},
         "samples": [["i.png", 0]]}
    ))

    cfg = default_config()
    cfg.DATASETS.DATA_ROOT = str(tmp_path)
    cfg.DATASETS.REGISTER = {
        "odtsv": {"factory": "CocoDetectionTSV", "ann_file": "od.tsv"},
        "ps": {"factory": "PseudoData", "ann_file": "ps.tsv"},
        "inet": {"factory": "ImageNet", "ann_file": "meta.json", "img_dir": "."},
    }
    assert isinstance(build_dataset(cfg, "odtsv", True), CocoDetectionTSVDataset)
    assert isinstance(build_dataset(cfg, "ps", True), PseudoDataDataset)
    assert isinstance(build_dataset(cfg, "inet", True), ImageNetDataset)
