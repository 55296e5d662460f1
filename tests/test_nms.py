"""NMS vs a pure-python greedy reference (ml_nms.cu semantics)."""
import numpy as np
import jax.numpy as jnp

from mqdet_tpu.ops import nms as nms_ops


def greedy_ml_nms(boxes, scores, labels, thresh):
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            if labels[j] != labels[i]:
                continue
            a, b = boxes[i], boxes[j]
            area_a = (a[2] - a[0] + 1) * (a[3] - a[1] + 1)
            area_b = (b[2] - b[0] + 1) * (b[3] - b[1] + 1)
            w = max(0.0, min(a[2], b[2]) - max(a[0], b[0]) + 1)
            h = max(0.0, min(a[3], b[3]) - max(a[1], b[1]) + 1)
            inter = w * h
            iou = inter / (area_a + area_b - inter)
            if iou > thresh:
                suppressed[j] = True
    return keep


def test_class_aware_nms_matches_reference(rng):
    n = 200
    xy = rng.uniform(0, 200, (n, 2))
    wh = rng.uniform(10, 80, (n, 2))
    boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    labels = rng.integers(0, 4, n).astype(np.int32)

    ref = greedy_ml_nms(boxes, scores, labels, 0.5)

    keep_idx, keep_valid = nms_ops.class_aware_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
        jnp.ones(n, bool), 0.5, max_outputs=n,
    )
    got = np.asarray(keep_idx)[np.asarray(keep_valid)]
    assert list(got) == ref


def test_nms_respects_validity_and_cap(rng):
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    valid = np.array([True, True, False])
    keep_idx, keep_valid = nms_ops.nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5, max_outputs=2
    )
    got = np.asarray(keep_idx)[np.asarray(keep_valid)]
    assert list(got) == [0]  # box1 suppressed by overlap, box2 invalid


def test_different_labels_not_suppressed():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    labels = np.array([1, 2], np.int32)
    keep_idx, keep_valid = nms_ops.class_aware_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
        jnp.ones(2, bool), 0.5, max_outputs=2,
    )
    assert np.asarray(keep_valid).sum() == 2


def test_soft_nms_decays_scores():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep_idx, keep_score, keep_valid = nms_ops.soft_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(3, bool), max_outputs=3
    )
    ks = np.asarray(keep_score)[np.asarray(keep_valid)]
    ki = np.asarray(keep_idx)[np.asarray(keep_valid)]
    assert ki[0] == 0 and np.isclose(ks[0], 0.9)
    # overlapping box decayed below its raw score
    pos = list(ki).index(1)
    assert ks[pos] < 0.8


def test_matrix_nms_matches_greedy(rng):
    from mqdet_tpu.ops.nms import class_aware_nms_matrix

    for seed in range(3):
        r = np.random.default_rng(seed)
        n = 300
        # clustered boxes to create deep suppression chains
        centers = r.uniform(0, 100, (n, 2))
        wh = r.uniform(20, 60, (n, 2))
        boxes = np.concatenate([centers, centers + wh], 1).astype(np.float32)
        scores = r.uniform(0.01, 1.0, n).astype(np.float32)
        labels = r.integers(0, 3, n).astype(np.int32)
        valid = r.uniform(size=n) > 0.1

        order = np.argsort(-np.where(valid, scores, -np.inf), kind="stable")
        live = [i for i in order if valid[i]]
        ref_keep = greedy_ml_nms(
            boxes[live], scores[live], labels[live], 0.5
        )
        ref = [live[i] for i in ref_keep]

        keep_idx, keep_valid = class_aware_nms_matrix(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
            jnp.asarray(valid), 0.5, max_outputs=n, row_block=64,
        )
        got = list(np.asarray(keep_idx)[np.asarray(keep_valid)])
        assert got == ref, f"seed {seed}"


def test_matrix_nms_small_n():
    from mqdet_tpu.ops.nms import class_aware_nms_matrix

    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32)
    scores = jnp.asarray([0.5, 0.9, 0.7])
    labels = jnp.zeros(3, jnp.int32)
    keep_idx, keep_valid = class_aware_nms_matrix(
        boxes, scores, labels, jnp.ones(3, bool), 0.5, max_outputs=3
    )
    got = list(np.asarray(keep_idx)[np.asarray(keep_valid)])
    assert got == [1, 2]
