"""TTA merge + Flickr recall + VOC AP evaluators."""
import numpy as np

from mqdet_tpu.engine.box_aug import (
    bbox_vote,
    im_detect_bbox_aug,
    merge_multi_scale,
    nms_numpy,
    soft_nms_numpy,
)
from mqdet_tpu.engine.flickr_eval import (
    FlickrEvaluator,
    voc_ap,
    voc_detection_ap,
)


def test_nms_numpy_suppresses_overlaps():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = nms_numpy(boxes, scores, 0.5)
    assert keep.tolist() == [0, 2]


def test_soft_nms_decays_scores():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    keep, new_scores = soft_nms_numpy(boxes, scores, 0.5)
    assert 0 in keep.tolist()
    assert new_scores[keep.tolist().index(1)] < 0.8 if 1 in keep.tolist() else True


def test_bbox_vote_merges_cluster():
    boxes = np.array([[0, 0, 10, 10], [2, 2, 12, 12], [50, 50, 60, 60]], np.float32)
    scores = np.array([0.9, 0.9, 0.5], np.float32)
    b, s = bbox_vote(boxes, scores, 0.3)
    assert len(b) == 2
    np.testing.assert_allclose(b[0], [1, 1, 11, 11], atol=1e-5)


def test_merge_multi_scale_per_class():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    labels = np.array([1, 1, 2], np.int64)
    out = merge_multi_scale(boxes, scores, labels, thresh=0.5)
    # same-class duplicates suppressed; different class survives
    assert len(out["boxes"]) == 2
    assert set(out["labels"].tolist()) == {1, 2}


def test_im_detect_bbox_aug_merges_scales():
    calls = []

    def predict(image, min_size, max_size, hflip):
        calls.append((min_size, hflip))
        return {
            "boxes": np.array([[0, 0, 10, 10]], np.float32),
            "scores": np.array([0.5 + 0.1 * len(calls)], np.float32),
            "labels": np.array([1], np.int64),
        }

    out = im_detect_bbox_aug(
        predict, np.zeros((20, 20, 3), np.uint8), scales=[400, 800],
        max_size=1333, flip=True, thresh=0.5,
    )
    assert len(calls) == 4  # 2 scales x (plain + flip)
    assert len(out["boxes"]) == 1  # all duplicates merged


def test_flickr_recall():
    ev = FlickrEvaluator(topk=(1, 5))
    gt = [{"boxes": np.array([[0, 0, 10, 10]]), "category": "people"}]
    # top-1 misses, top-5 hits
    preds = [np.array([[50, 50, 60, 60], [0, 0, 10, 10]], np.float32)]
    ev.add(preds, gt)
    res = ev.summarize()
    assert res["recall@1"] == 0.0
    assert res["recall@5"] == 1.0
    assert res["upper_bound"] == 1.0


def test_voc_ap_perfect_detector():
    preds = {0: {"boxes": np.array([[0, 0, 10, 10]], np.float32),
                 "scores": np.array([0.9], np.float32),
                 "labels": np.array([1], np.int64)}}
    gts = {0: {"boxes": np.array([[0, 0, 10, 10]], np.float32),
               "labels": np.array([1], np.int64)}}
    res = voc_detection_ap(preds, gts, num_classes=1)
    assert res["mAP"] == 1.0
    assert voc_ap(np.array([1.0]), np.array([1.0]), use_07_metric=True) > 0.99
