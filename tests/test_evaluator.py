"""Evaluator sanity tests: perfect predictions -> AP 1; misses lower AP."""
import numpy as np
import pytest

from mqdet_tpu.engine.evaluator import (
    DetectionEvaluator,
    average_precision,
    box_iou_xyxy,
    check_expected_results,
    IOU_THRESHOLDS,
)


def test_iou_basic():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 0, 15, 10], [20, 20, 30, 30]], np.float32)
    iou = box_iou_xyxy(a, b)[0]
    np.testing.assert_allclose(iou, [1.0, 1 / 3, 0.0], atol=1e-6)


def test_perfect_predictions_ap1():
    ev = DetectionEvaluator(style="coco")
    r = np.random.default_rng(0)
    for img in range(5):
        boxes = r.uniform(0, 100, (3, 2))
        boxes = np.concatenate([boxes, boxes + r.uniform(20, 50, (3, 2))], 1).astype(np.float32)
        labels = np.array([1, 2, 3], np.int32)
        ev.add_image(img, boxes, labels, boxes, np.full(3, 0.9, np.float32), labels)
    res = ev.summarize()
    assert res["AP"] == pytest.approx(1.0, abs=1e-6)
    assert res["AP50"] == pytest.approx(1.0, abs=1e-6)


def test_missed_and_false_positives():
    ev = DetectionEvaluator(style="coco")
    gt = np.array([[0, 0, 10, 10], [50, 50, 80, 80]], np.float32)
    labels = np.array([1, 1], np.int32)
    # detect only the first box, plus a false positive with lower score
    det = np.array([[0, 0, 10, 10], [200, 200, 240, 240]], np.float32)
    ev.add_image(0, gt, labels, det, np.array([0.9, 0.3], np.float32),
                 np.array([1, 1], np.int32))
    res = ev.summarize()
    assert 0.0 < res["AP"] < 1.0
    assert res["AP50"] == pytest.approx(0.5, abs=0.01)


def test_localization_quality_affects_high_iou():
    ev = DetectionEvaluator(style="coco")
    gt = np.array([[0, 0, 100, 100]], np.float32)
    det = np.array([[0, 0, 90, 100]], np.float32)  # IoU 0.9
    ev.add_image(0, gt, np.array([1]), det, np.array([0.9], np.float32), np.array([1]))
    res = ev.summarize()
    assert res["AP50"] == pytest.approx(1.0, abs=1e-6)
    # fails at IoU >= 0.95
    assert res["AP"] < 1.0


def test_lvis_federated_drops_unannotated_images():
    ev = DetectionEvaluator(style="lvis_fixed")
    gt = np.array([[0, 0, 10, 10]], np.float32)
    ev.add_image(0, gt, np.array([1]), gt, np.array([0.9], np.float32), np.array([1]))
    # image 1 has no annotation info for cat 1 -> detection there is ignored
    ev.add_image(
        1, np.zeros((0, 4), np.float32), np.zeros((0,), np.int32),
        np.array([[0, 0, 10, 10]], np.float32), np.array([0.95], np.float32),
        np.array([1], np.int32),
    )
    res = ev.summarize()
    assert res["AP"] == pytest.approx(1.0, abs=1e-6)
    # coco style would count it as FP (outscores the TP)
    ev2 = DetectionEvaluator(style="coco")
    ev2.add_image(0, gt, np.array([1]), gt, np.array([0.9], np.float32), np.array([1]))
    ev2.add_image(
        1, np.zeros((0, 4), np.float32), np.zeros((0,), np.int32),
        np.array([[0, 0, 10, 10]], np.float32), np.array([0.95], np.float32),
        np.array([1], np.int32),
    )
    assert ev2.summarize()["AP"] < 1.0


def test_lvis_negative_images_count_fps():
    ev = DetectionEvaluator(style="lvis_fixed")
    gt = np.array([[0, 0, 10, 10]], np.float32)
    ev.add_image(0, gt, np.array([1]), gt, np.array([0.9], np.float32), np.array([1]))
    ev.add_image(
        1, np.zeros((0, 4), np.float32), np.zeros((0,), np.int32),
        np.array([[0, 0, 10, 10]], np.float32), np.array([0.95], np.float32),
        np.array([1], np.int32), neg_category_ids=[1],
    )
    assert ev.summarize()["AP"] < 1.0


def test_frequency_splits():
    ev = DetectionEvaluator(style="lvis_fixed", category_frequency={1: "r", 2: "f"})
    gt1 = np.array([[0, 0, 10, 10]], np.float32)
    ev.add_image(0, gt1, np.array([1]), gt1, np.array([0.9], np.float32), np.array([1]))
    gt2 = np.array([[20, 20, 40, 40]], np.float32)
    ev.add_image(1, gt2, np.array([2]),
                 np.zeros((0, 4), np.float32), np.zeros((0,), np.float32),
                 np.zeros((0,), np.int32))
    res = ev.summarize()
    assert res["APr"] == pytest.approx(1.0, abs=1e-6)
    assert res["APf"] == pytest.approx(0.0, abs=1e-6)


def test_check_expected_results():
    check_expected_results({"AP": 0.30}, [("AP", 0.304, 0.003)], sigma_tol=4)
    with pytest.raises(AssertionError):
        check_expected_results({"AP": 0.20}, [("AP", 0.304, 0.003)], sigma_tol=4)


def test_ap_interpolation_against_manual():
    # one category, 3 dets: TP, FP, TP; 2 gts at IoU threshold 0.5 only
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    tp = np.zeros((len(IOU_THRESHOLDS), 3), bool)
    tp[0] = [True, False, True]
    ig = np.zeros_like(tp)
    ap = average_precision(scores, tp, ig, num_gt=2)
    # recall points: p=1 until r=0.5, then 2/3 until r=1.0
    expected = (51 * 1.0 + 50 * (2 / 3)) / 101
    assert ap[0] == pytest.approx(expected, abs=1e-6)
