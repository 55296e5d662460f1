"""Legacy-head losses + postprocessors (engine/legacy_losses.py).

Oracles:
- fcos_match vs hand-computed assignment semantics (loss.py:397-452)
- retina_match vs a numpy brute-force of torch Matcher(0.5, 0.4,
  allow_low_quality_matches=True) (modeling/matcher.py)
- postprocessor: a perfectly confident logit must surface its decoded box
- end-to-end: one SGD step on the full LegacyDetector per architecture
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mqdet_tpu.core import boxes as box_ops
from mqdet_tpu.engine.legacy_losses import (
    atss_legacy_losses,
    build_legacy_machinery,
    fcos_decode,
    fcos_locations,
    fcos_losses,
    fcos_match,
    legacy_postprocess_single,
    make_legacy_train_step,
    retina_losses,
    retina_match,
)


def test_fcos_locations_layout():
    locs = fcos_locations((64, 64), (8, 16))
    assert locs[0].shape == (64, 2) and locs[1].shape == (16, 2)
    np.testing.assert_allclose(locs[0][0], [4.0, 4.0])   # stride//2 offset
    np.testing.assert_allclose(locs[1][0], [8.0, 8.0])
    np.testing.assert_allclose(locs[0][9], [12.0, 12.0])  # y-major, (x, y)


def test_fcos_match_semantics():
    locs = jnp.asarray(np.concatenate(fcos_locations((64, 64), (8, 16))))
    level_sizes = (64, 16)
    # big box matches only the level whose range contains max(l,t,r,b);
    # nested small box wins the tie at shared locations (min area)
    gt = jnp.asarray([[0.0, 0.0, 60.0, 60.0], [0.0, 0.0, 20.0, 20.0]])
    labels = jnp.asarray([3, 7], jnp.int32)
    valid = jnp.asarray([True, True])
    tgt = fcos_match(locs, level_sizes, gt, labels, valid)

    # location (12, 12): inside both; max reg for small box is 12 <= 64 ->
    # level-0 range, area tie-break picks the small box -> label 7
    assert int(tgt.cls_labels[9]) == 7
    np.testing.assert_allclose(
        np.asarray(tgt.reg_targets[9]), [12.0, 12.0, 8.0, 8.0]
    )
    # location (36, 36): inside only the big box, max reg 36 fits level 0
    idx36 = 4 * 8 + 4
    assert int(tgt.cls_labels[idx36]) == 3
    # centerness = sqrt(min/max(l,r) * min/max(t,b))
    l, t, r, b = np.asarray(tgt.reg_targets[idx36])
    want = np.sqrt((min(l, r) / max(l, r)) * (min(t, b) / max(t, b)))
    np.testing.assert_allclose(float(tgt.centerness[idx36]), want, rtol=1e-6)
    # outside every box -> background
    assert int(tgt.cls_labels[63]) == 0
    # invalid gt rows never match
    tgt2 = fcos_match(locs, level_sizes, gt, labels,
                      jnp.asarray([False, False]))
    assert int(jnp.sum(tgt2.cls_labels)) == 0


def _torch_matcher_oracle(ious, labels, fg=0.5, bg=0.4):
    """numpy twin of Matcher(fg, bg, allow_low_quality_matches=True)."""
    n, g = ious.shape
    best_gt = ious.argmax(1)
    best = ious.max(1)
    out = np.where(best >= fg, labels[best_gt],
                   np.where(best < bg, 0, -1))
    gt_best = ious.max(0)
    for j in range(g):
        if gt_best[j] <= 0:
            continue
        for i in np.nonzero(ious[:, j] >= gt_best[j] - 1e-7)[0]:
            out[i] = labels[best_gt[i]]  # restore PRE-threshold best match
    return out


def test_retina_match_vs_matcher_oracle():
    rng = np.random.default_rng(0)
    anchors = rng.uniform(0, 80, (64, 2))
    anchors = np.concatenate(
        [anchors, anchors + rng.uniform(8, 40, (64, 2))], 1
    ).astype(np.float32)
    gt = np.asarray(
        [[0, 0, 30, 30], [40, 40, 80, 90], [10, 50, 50, 95]], np.float32
    )
    labels = np.asarray([2, 5, 9], np.int32)
    got, _, _ = retina_match(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(labels),
        jnp.asarray([True, True, True]),
    )
    ious = np.asarray(box_ops.box_iou(jnp.asarray(anchors), jnp.asarray(gt)))
    want = _torch_matcher_oracle(ious, labels)
    np.testing.assert_array_equal(np.asarray(got), want)


def _rand_head_out(rng, levels, num_classes, with_ctr=True, na=1):
    out = {
        "cls_logits": [
            jnp.asarray(
                rng.standard_normal((2, h, w, num_classes * na)) - 4.0,
                jnp.float32,
            )
            for h, w in levels
        ],
        "bbox_reg": [
            jnp.asarray(rng.standard_normal((2, h, w, 4 * na)), jnp.float32)
            for h, w in levels
        ],
    }
    if with_ctr:
        out["centerness"] = [
            jnp.asarray(rng.standard_normal((2, h, w, na)), jnp.float32)
            for h, w in levels
        ]
    return out


_GT = (
    jnp.asarray([[[2.0, 2.0, 30.0, 30.0], [0.0] * 4]] * 2),
    jnp.asarray([[1, 0]] * 2, jnp.int32),
    jnp.asarray([[True, False]] * 2),
)


@pytest.mark.parametrize("arch", ["fcos", "retina", "atss"])
@pytest.mark.slow  # ~17s/arch, legacy arch
def test_losses_finite_with_padded_gt(arch, rng):
    levels = [(8, 8), (4, 4)]
    image_hw = (64, 64)
    strides = (8, 16)
    gt_boxes, gt_labels, gt_valid = _GT
    if arch == "fcos":
        refs = fcos_locations(image_hw, strides)
        out = _rand_head_out(rng, levels, 5)
        out["bbox_reg"] = [jnp.exp(x) for x in out["bbox_reg"]]
        fn = lambda o: fcos_losses(o, refs, gt_boxes, gt_labels, gt_valid, 5)
    else:
        from mqdet_tpu.ops.anchors import anchors_for_fpn

        refs = anchors_for_fpn(image_hw, strides, sizes=(16, 32))
        out = _rand_head_out(rng, levels, 5, with_ctr=arch == "atss")
        if arch == "retina":
            fn = lambda o: retina_losses(o, refs, gt_boxes, gt_labels,
                                         gt_valid, 5, num_anchors=1)
        else:
            fn = lambda o: atss_legacy_losses(o, refs, gt_boxes, gt_labels,
                                              gt_valid, 5)

    losses = fn(out)
    assert all(np.isfinite(float(v)) for v in losses.values()), losses
    assert float(losses["loss_cls"]) > 0

    # gradients must stay finite through the padded-gt where() masking
    grads = jax.grad(lambda o: sum(fn(o).values()))(out)
    for leaves in jax.tree_util.tree_leaves(grads):
        assert bool(jnp.all(jnp.isfinite(leaves)))

    # all-padded image (zero gts) must not produce NaNs either
    losses0 = (
        fcos_losses(out, refs, gt_boxes, gt_labels,
                    jnp.zeros_like(gt_valid), 5)
        if arch == "fcos"
        else retina_losses(out, refs, gt_boxes, gt_labels,
                           jnp.zeros_like(gt_valid), 5, num_anchors=1)
        if arch == "retina"
        else atss_legacy_losses(out, refs, gt_boxes, gt_labels,
                                jnp.zeros_like(gt_valid), 5)
    )
    assert all(np.isfinite(float(v)) for v in losses0.values())


def test_fcos_perfect_regression_zero_loss(rng):
    """Predictions == decoded targets -> GIoU reg loss == 0."""
    image_hw = (64, 64)
    refs = fcos_locations(image_hw, (8, 16))
    locs = jnp.asarray(np.concatenate(refs))
    gt_boxes, gt_labels, gt_valid = _GT
    tgt = fcos_match(locs, (64, 16), gt_boxes[0], gt_labels[0], gt_valid[0])
    reg = tgt.reg_targets
    out = {
        "cls_logits": [
            jnp.zeros((1, 8, 8, 5)) - 4.0, jnp.zeros((1, 4, 4, 5)) - 4.0
        ],
        "bbox_reg": [
            reg[:64].reshape(1, 8, 8, 4), reg[64:].reshape(1, 4, 4, 4)
        ],
        "centerness": [jnp.zeros((1, 8, 8, 1)), jnp.zeros((1, 4, 4, 1))],
    }
    losses = fcos_losses(
        out, refs, gt_boxes[:1], gt_labels[:1], gt_valid[:1], 5
    )
    np.testing.assert_allclose(float(losses["loss_reg"]), 0.0, atol=1e-5)


@pytest.mark.parametrize("kind", ["fcos", "retina", "atss"])
def test_postprocess_surfaces_confident_box(kind, rng):
    levels = [(8, 8)]
    num_classes = 5
    if kind == "fcos":
        refs = fcos_locations((64, 64), (8,))
    else:
        from mqdet_tpu.ops.anchors import anchors_for_fpn

        refs = anchors_for_fpn((64, 64), (8,), sizes=(16,))
    out = _rand_head_out(rng, levels, num_classes, with_ctr=kind != "retina")
    out["cls_logits"] = [out["cls_logits"][0] - 8.0]
    if kind == "fcos":
        out["bbox_reg"] = [jnp.exp(0.2 * out["bbox_reg"][0])]
    # location (2,3) gets class-3 logit 9 (score ~ 1)
    out["cls_logits"][0] = out["cls_logits"][0].at[0, 2, 3, 2].set(9.0)
    if "centerness" in out:
        out["centerness"] = [out["centerness"][0].at[0, 2, 3, 0].set(9.0)]

    from mqdet_tpu.models.postprocess import PostprocessParams

    p = PostprocessParams(pre_nms_thresh=0.05, pre_nms_top_n=20,
                          nms_thresh=0.6, detections_per_img=8)
    det = legacy_postprocess_single(out, refs, kind, 64, 64, p, num_classes)
    assert bool(det.valid[0])
    assert int(det.labels[0]) == 3  # 1-based class index
    flat = 2 * 8 + 3
    reg = out["bbox_reg"][0][0].reshape(-1, 4)
    ref_np = jnp.asarray(np.asarray(refs[0]))
    want = (
        fcos_decode(ref_np, reg) if kind == "fcos"
        else box_ops.decode(reg, ref_np)
    )[flat]
    want = box_ops.clip_to_image(want[None], 64, 64)[0]
    np.testing.assert_allclose(
        np.asarray(det.boxes[0]), np.asarray(want), rtol=1e-5, atol=1e-4
    )


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["FCOS", "RETINA", "ATSS"])
def test_legacy_detector_end_to_end(arch):
    """build_legacy_machinery + LegacyDetector: one SGD step runs, losses
    finite, params move; postprocess consumes the head output."""
    import optax

    from mqdet_tpu.core.config import default_config
    from mqdet_tpu.models.legacy_heads import build_legacy_detector

    cfg = default_config()
    cfg.MODEL.RPN_ARCHITECTURE = arch
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-RETINANET"
    cfg.MODEL.ATSS.NUM_CLASSES = 6
    cfg.MODEL.ATSS.DETECTIONS_PER_IMG = 10
    image_hw = (64, 64)

    model = build_legacy_detector(cfg)
    images = jnp.asarray(
        np.random.default_rng(0).standard_normal((1,) + image_hw + (3,)),
        jnp.float32,
    )
    params = model.init(jax.random.PRNGKey(0), images)
    loss_fn, postprocess_fn = build_legacy_machinery(cfg, image_hw)

    tx = optax.sgd(1e-3)
    step = make_legacy_train_step(model, loss_fn, tx)
    gt_boxes = jnp.asarray([[[4.0, 4.0, 40.0, 40.0], [0.0] * 4]])
    gt_labels = jnp.asarray([[2, 0]], jnp.int32)
    gt_valid = jnp.asarray([[True, False]])
    p2, _, loss, losses = step(
        params, tx.init(params), images, gt_boxes, gt_labels, gt_valid
    )
    assert np.isfinite(float(loss))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), params, p2
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0

    det = postprocess_fn(model.apply(p2, images), *image_hw)
    assert det.boxes.shape[0] == 10
