"""Cross-validate DetectionEvaluator against the ACTUAL vendored LVIS
evaluator from the reference (lvis/lvis_eval.py:155-766, the protocol behind
the headline LVIS MiniVal AP), run via importlib with a numpy bbox-IoU stub
for pycocotools.mask.iou.

Pins the whole AP pipeline: federated image sets, per-category det cap,
greedy matching incl. ignored-gt consumption, not-exhaustive det ignores,
precision envelope + 101-point interpolation, and rare/common/frequent
splits.
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference tree not mounted"
)


def _bbox_iou_xywh(dt, gt, iscrowd):
    """Exact numpy twin of pycocotools.mask.iou for bbox [x,y,w,h] inputs
    (maskApi.c bbIou): inter/union, union ignores crowd gts."""
    dt = np.asarray(dt, np.float64).reshape(-1, 4)
    gt = np.asarray(gt, np.float64).reshape(-1, 4)
    out = np.zeros((len(dt), len(gt)))
    for j, g in enumerate(gt):
        ga = g[2] * g[3]
        for i, d in enumerate(dt):
            da = d[2] * d[3]
            w = min(d[0] + d[2], g[0] + g[2]) - max(d[0], g[0])
            h = min(d[1] + d[3], g[1] + g[3]) - max(d[1], g[1])
            if w <= 0 or h <= 0:
                continue
            inter = w * h
            union = inter if (iscrowd and iscrowd[j]) else da + ga - inter
            out[i, j] = inter / union
    return out


def _make_dataset(rng, n_images=14, n_cats=6):
    """Synthetic LVIS-format gt + detections exercising every protocol arm."""
    freqs = ["r", "r", "c", "c", "f", "f"]
    cats = [
        {"id": c + 1, "name": f"cat{c}", "frequency": freqs[c]}
        for c in range(n_cats)
    ]
    images, anns, ann_id = [], [], 1
    for i in range(n_images):
        present = rng.choice(n_cats, size=rng.integers(1, 4), replace=False) + 1
        absent = [c + 1 for c in range(n_cats) if c + 1 not in present]
        neg = list(rng.permutation(absent)[: rng.integers(0, 3)])
        nel = [int(c) for c in present if rng.uniform() < 0.3]
        images.append(
            {
                "id": i + 1,
                "width": 200,
                "height": 200,
                "neg_category_ids": [int(c) for c in neg],
                "not_exhaustive_category_ids": nel,
            }
        )
        for c in present:
            for _ in range(rng.integers(1, 4)):
                x, y = rng.uniform(0, 150, 2)
                w, h = rng.uniform(8, 50, 2)
                anns.append(
                    {
                        "id": ann_id,
                        "image_id": i + 1,
                        "category_id": int(c),
                        "bbox": [float(x), float(y), float(w), float(h)],
                        "area": float(w * h),
                    }
                )
                ann_id += 1
    gt = {"images": images, "annotations": anns, "categories": cats}

    dets = []
    for ann in anns:
        # jittered true positive (sometimes badly off) for most gts
        if rng.uniform() < 0.85:
            x, y, w, h = ann["bbox"]
            j = rng.uniform(-8, 8, 4)
            dets.append(
                {
                    "image_id": ann["image_id"],
                    "category_id": ann["category_id"],
                    "bbox": [x + j[0], y + j[1], max(4, w + j[2]), max(4, h + j[3])],
                    "score": float(rng.uniform(0.1, 1.0)),
                }
            )
    for _ in range(60):  # random false positives on random images/cats
        dets.append(
            {
                "image_id": int(rng.integers(1, n_images + 1)),
                "category_id": int(rng.integers(1, n_cats + 1)),
                "bbox": [
                    float(rng.uniform(0, 150)),
                    float(rng.uniform(0, 150)),
                    float(rng.uniform(8, 50)),
                    float(rng.uniform(8, 50)),
                ],
                "score": float(rng.uniform(0.0, 1.0)),
            }
        )
    return gt, dets


def _ref_fixed_ap(gt_dict, dets):
    import sys

    import ref_harness as rh

    rh.install_stubs()
    sys.modules["pycocotools.mask"].iou = _bbox_iou_xywh

    import importlib

    lvis_mod = importlib.import_module(
        "maskrcnn_benchmark.data.datasets.evaluation.lvis.lvis"
    )
    eval_mod = importlib.import_module(
        "maskrcnn_benchmark.data.datasets.evaluation.lvis.lvis_eval"
    )
    gt = lvis_mod.LVIS()
    gt.dataset = gt_dict
    gt._create_index()

    # LvisEvaluatorFixedAP._summarize_fixed semantics (lvis_eval.py:849-875)
    by_cat = {}
    for ann in dets:
        by_cat.setdefault(ann["category_id"], []).append(ann)
    results = []
    for cat_anns in by_cat.values():
        results.extend(
            sorted(cat_anns, key=lambda x: x["score"], reverse=True)[:10000]
        )
    res = eval_mod.LVISResults(gt, results, max_dets=-1)
    ev = eval_mod.LVISEval(gt, res, iou_type="bbox")
    ev.params.max_dets = -1
    ev.run()
    return ev.results


@pytest.mark.slow  # ~25s; nightly tier
def test_lvis_fixed_ap_matches_vendored_evaluator():
    from mqdet_tpu.engine.evaluator import DetectionEvaluator

    rng = np.random.default_rng(7)
    gt_dict, dets = _make_dataset(rng)
    ref = _ref_fixed_ap(gt_dict, dets)

    freq = {c["id"]: c["frequency"] for c in gt_dict["categories"]}
    ours = DetectionEvaluator(style="lvis_fixed", category_frequency=freq)
    ours.register_categories(list(freq))
    det_by_img = {}
    for d in dets:
        det_by_img.setdefault(d["image_id"], []).append(d)
    gt_by_img = {}
    for a in gt_dict["annotations"]:
        gt_by_img.setdefault(a["image_id"], []).append(a)
    for img in gt_dict["images"]:
        iid = img["id"]
        g = gt_by_img.get(iid, [])
        dd = det_by_img.get(iid, [])

        def xyxy(b):
            return [b[0], b[1], b[0] + b[2], b[1] + b[3]]

        ours.add_image(
            iid,
            gt_boxes=np.array([xyxy(a["bbox"]) for a in g], np.float64).reshape(-1, 4),
            gt_labels=np.array([a["category_id"] for a in g], np.int64),
            det_boxes=np.array([xyxy(d["bbox"]) for d in dd], np.float64).reshape(-1, 4),
            det_scores=np.array([d["score"] for d in dd], np.float64),
            det_labels=np.array([d["category_id"] for d in dd], np.int64),
            neg_category_ids=img["neg_category_ids"],
            not_exhaustive_category_ids=img["not_exhaustive_category_ids"],
        )
    got = ours.summarize()

    for ref_key, our_key in [
        ("AP", "AP"),
        ("AP50", "AP50"),
        ("AP75", "AP75"),
        ("APr", "APr"),
        ("APc", "APc"),
        ("APf", "APf"),
    ]:
        assert our_key in got, our_key
        np.testing.assert_allclose(
            got[our_key], ref[ref_key], atol=1e-9,
            err_msg=f"{our_key}: ours {got[our_key]} vs vendored {ref[ref_key]}",
        )
