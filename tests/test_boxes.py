"""Unit tests for box ops against pure-numpy reference implementations."""
import numpy as np
import jax.numpy as jnp

from mqdet_tpu.core import boxes as B


def np_iou(a, b):
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt + 1, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None] - inter)


def random_boxes(rng, n, size=500):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_iou_matches_numpy(rng):
    a = random_boxes(rng, 13)
    b = random_boxes(rng, 7)
    got = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np_iou(a, b), rtol=1e-5)


def test_encode_decode_roundtrip(rng):
    anchors = random_boxes(rng, 50)
    gt = random_boxes(rng, 50)
    deltas = B.encode(jnp.asarray(gt), jnp.asarray(anchors))
    rec = B.decode(deltas, jnp.asarray(anchors))
    np.testing.assert_allclose(np.asarray(rec), gt, rtol=1e-4, atol=1e-2)


def test_decode_clamps_large_dw():
    anchors = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    preds = jnp.asarray([[0.0, 0.0, 1000.0, 1000.0]])
    out = np.asarray(B.decode(preds, anchors))
    assert np.isfinite(out).all()


def test_clip_and_small_boxes():
    boxes = jnp.asarray([[-5.0, -5.0, 10.0, 10.0], [0.0, 0.0, 0.2, 50.0]])
    clipped = B.clip_to_image(boxes, 20, 20)
    assert clipped[0, 0] == 0 and clipped[0, 1] == 0
    assert np.asarray(clipped).max() <= 19.0
    mask = np.asarray(B.remove_small_boxes_mask(clipped, 2.0))
    assert mask[0]
    assert not mask[1]  # +1 convention: 0.2 width -> ws = 1.2 < 2


def test_giou_aligned_identity(rng):
    a = random_boxes(rng, 10)
    g = np.asarray(B.giou(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(g, 1.0, atol=1e-5)


def test_cxcywh_roundtrip(rng):
    a = random_boxes(rng, 10)
    back = B.cxcywh_to_xyxy(B.xyxy_to_cxcywh(jnp.asarray(a)))
    np.testing.assert_allclose(np.asarray(back), a, rtol=1e-5)


def test_expand_boxes():
    b = jnp.asarray([[10.0, 10.0, 20.0, 20.0]])
    out = np.asarray(B.expand_boxes(b, 1.5, 100, 100))
    np.testing.assert_allclose(out, [[7.5, 7.5, 22.5, 22.5]])
