"""ROIAlign / focal loss / deform conv / anchors vs torch & numpy references."""
import numpy as np
import jax.numpy as jnp
import pytest

from mqdet_tpu.ops import roi_align as ra
from mqdet_tpu.ops import focal_loss as fl
from mqdet_tpu.ops import deform_conv as dc
from mqdet_tpu.ops import anchors as anch


def _roi_align_numpy_oracle(feat_chw, rois, scale, out_size, ratio):
    """torchvision.ops.roi_align(aligned=True) semantics, brute force
    (torchvision is not installed in this env; ROIAlign_cuda.cu:57-120 is
    the primary reference)."""
    c, h, w = feat_chw.shape

    def sample(y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c, np.float32)
        y = min(max(y, 0.0), h - 1)
        x = min(max(x, 0.0), w - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        ly, lx = y - y0, x - x0
        return (
            feat_chw[:, y0, x0] * (1 - ly) * (1 - lx)
            + feat_chw[:, y0, x1] * (1 - ly) * lx
            + feat_chw[:, y1, x0] * ly * (1 - lx)
            + feat_chw[:, y1, x1] * ly * lx
        )

    out = np.zeros((len(rois), c, out_size, out_size), np.float32)
    for r, (x1, y1, x2, y2) in enumerate(rois):
        sx, sy = x1 * scale - 0.5, y1 * scale - 0.5
        bw = (x2 - x1) * scale / out_size
        bh = (y2 - y1) * scale / out_size
        for i in range(out_size):
            for j in range(out_size):
                acc = np.zeros(c, np.float32)
                for iy in range(ratio):
                    for ix in range(ratio):
                        acc += sample(
                            sy + (i + (iy + 0.5) / ratio) * bh,
                            sx + (j + (ix + 0.5) / ratio) * bw,
                        )
                out[r, :, i, j] = acc / (ratio * ratio)
    return out


def test_roi_align_matches_oracle(rng):
    feat = rng.standard_normal((1, 8, 16, 16)).astype(np.float32)  # NCHW
    rois = np.array([[2.0, 2.0, 10.0, 12.0], [0.0, 0.0, 15.0, 15.0]], np.float32)
    ref = _roi_align_numpy_oracle(feat[0], rois, 0.5, 7, 2)

    got = ra.roi_align(
        jnp.asarray(feat[0].transpose(1, 2, 0)), jnp.asarray(rois),
        0.5, output_size=7, sampling_ratio=2,
    )  # (R, 7, 7, C)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_multi_level_roi_align_level_selection(rng):
    feats = [jnp.asarray(rng.standard_normal((2 ** (6 - i), 2 ** (6 - i), 4)).astype(np.float32)) for i in range(3)]
    scales = (0.125, 0.0625, 0.03125)
    rois = jnp.asarray([[0.0, 0.0, 50.0, 50.0], [0.0, 0.0, 400.0, 400.0]])
    out = ra.multi_level_roi_align(feats, rois, scales)
    assert out.shape == (2, 7, 7, 4)
    small = ra.roi_align(feats[0], rois[:1], scales[0])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(small[0]), atol=1e-5)


def test_token_focal_loss_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    logits = rng.standard_normal((2, 5, 8)).astype(np.float32)
    targets = (rng.uniform(size=(2, 5, 8)) > 0.7).astype(np.float32)
    mask = np.ones((2, 8), np.float32)
    mask[:, 6:] = 0

    t_logits = torch.from_numpy(logits)
    t_targets = torch.from_numpy(targets)
    tm = torch.from_numpy(mask).bool().unsqueeze(1).repeat(1, 5, 1)
    pl = torch.masked_select(t_logits, tm)
    tt = torch.masked_select(t_targets, tm)
    p = torch.sigmoid(pl)
    ce = F.binary_cross_entropy_with_logits(pl, tt, reduction="none")
    p_t = p * tt + (1 - p) * (1 - tt)
    loss = ce * (1 - p_t) ** 2.0
    alpha_t = 0.25 * tt + 0.75 * (1 - tt)
    ref = (alpha_t * loss).sum().item()

    got = fl.token_sigmoid_binary_focal_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(mask)
    )
    np.testing.assert_allclose(float(got), ref, rtol=1e-5)


def test_sigmoid_focal_loss_shape_and_background(rng):
    logits = jnp.asarray(rng.standard_normal((6, 4)).astype(np.float32))
    targets = jnp.asarray([0, 1, 2, 3, 4, 0])
    loss = fl.sigmoid_focal_loss(logits, targets)
    assert loss.shape == (6, 4)
    assert float(loss.sum()) > 0


def test_deform_conv_zero_offset_equals_conv(rng):
    """With zero offsets and mask=1, DCNv2 == plain 3x3 conv."""
    x = rng.standard_normal((1, 10, 12, 6)).astype(np.float32)
    w = rng.standard_normal((3, 3, 6, 8)).astype(np.float32) * 0.1
    offset = np.zeros((1, 10, 12, 18), np.float32)
    mask = np.ones((1, 10, 12, 9), np.float32)

    got = dc.modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask), jnp.asarray(w)
    )

    import jax
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)


def test_deform_conv_stride2_shape(rng):
    x = jnp.asarray(rng.standard_normal((2, 10, 14, 4)).astype(np.float32))
    offset = jnp.zeros((2, 5, 7, 18))
    mask = jnp.ones((2, 5, 7, 9))
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 4)).astype(np.float32))
    out = dc.modulated_deform_conv(x, offset, mask, w, stride=2)
    assert out.shape == (2, 5, 7, 4)


def test_deform_conv_matches_oracle(rng):
    """Moderate offsets vs the brute-force numpy oracle (the large-offset
    sweep lives in test_module_parity.py)."""
    from test_module_parity import _dcn_numpy_oracle

    x = rng.standard_normal((1, 6, 7, 4)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 4, 5)) * 0.2).astype(np.float32)
    offset = (rng.standard_normal((1, 6, 7, 18)) * 0.7).astype(np.float32)
    mask = rng.uniform(0.2, 1.0, (1, 6, 7, 9)).astype(np.float32)
    bias = np.zeros((5,), np.float32)

    ref = _dcn_numpy_oracle(x, offset, mask, w, bias)
    got = dc.modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask), jnp.asarray(w)
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-3)


def test_anchor_layout_glip():
    anchors = anch.anchors_for_fpn((64, 96))
    assert len(anchors) == 5
    assert anchors[0].shape == (8 * 12, 4)
    # cell anchor at stride 8, size 64: centered on (3.5, 3.5), side 64
    a0 = anchors[0][0]
    w = a0[2] - a0[0] + 1
    assert w == 64
    np.testing.assert_allclose((a0[0] + a0[2]) / 2, 3.5)
    # shift by one cell along x
    np.testing.assert_allclose(anchors[0][1] - anchors[0][0], [8, 0, 8, 0])


def test_window_deform_conv_matches_gather(rng):
    """Window formulation == gather formulation when |offset| <= radius."""
    from mqdet_tpu.ops.deform_conv import (
        modulated_deform_conv,
        modulated_deform_conv_window,
    )

    x = jnp.asarray(rng.standard_normal((2, 11, 13, 8)).astype(np.float32))
    offset = jnp.asarray((rng.uniform(-2.5, 2.5, (2, 11, 13, 18))).astype(np.float32))
    mask = jnp.asarray(rng.uniform(0.2, 1.0, (2, 11, 13, 9)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 4)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.standard_normal(4).astype(np.float32))

    ref = modulated_deform_conv(x, offset, mask, w, bias)
    got = modulated_deform_conv_window(x, offset, mask, w, bias, radius=3, block_rows=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_window_deform_conv_stride2(rng):
    from mqdet_tpu.ops.deform_conv import (
        modulated_deform_conv,
        modulated_deform_conv_window,
    )

    x = jnp.asarray(rng.standard_normal((1, 12, 14, 6)).astype(np.float32))
    offset = jnp.asarray((rng.uniform(-1.5, 1.5, (1, 6, 7, 18))).astype(np.float32))
    mask = jnp.ones((1, 6, 7, 9), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 5)).astype(np.float32) * 0.2)

    ref = modulated_deform_conv(x, offset, mask, w, stride=2)
    got = modulated_deform_conv_window(x, offset, mask, w, stride=2, radius=2, block_rows=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_native_host_library(rng, tmp_path, monkeypatch):
    """Native C++ helpers match the numpy/python reference paths.

    Builds libmqdet_host.so FROM SOURCE (native/Makefile) into a temp dir and
    tests that fresh build — not the committed binary — so the build recipe
    itself is exercised. g++/make are part of the supported environment; a
    build failure is a test failure, not a skip.
    """
    import os
    import shutil
    import subprocess

    from mqdet_tpu.utils import native

    src_dir = os.path.join(os.path.dirname(__file__), "..", "native")
    for f in ("mqdet_host.cpp", "Makefile"):
        shutil.copy(os.path.join(src_dir, f), tmp_path / f)
    subprocess.run(["make", "-C", str(tmp_path)], check=True, capture_output=True)
    fresh = native.load_library(str(tmp_path / "libmqdet_host.so"))
    monkeypatch.setattr(native, "_lib", fresh)
    monkeypatch.setattr(native, "_tried", True)
    assert native.available()

    # matching parity vs the pure-python evaluator path
    from mqdet_tpu.engine import evaluator as EV

    det = rng.uniform(0, 100, (20, 2))
    det = np.concatenate([det, det + rng.uniform(5, 40, (20, 2))], 1).astype(np.float32)
    order = np.argsort(-rng.uniform(size=20))
    det = det[order]
    gt = rng.uniform(0, 100, (6, 2))
    gt = np.concatenate([gt, gt + rng.uniform(5, 40, (6, 2))], 1).astype(np.float32)
    gt_ig = np.array([0, 0, 0, 0, 1, 1], bool)
    thr = EV.IOU_THRESHOLDS

    tp_n, ig_n = native.match_detections(det, gt, gt_ig, thr)

    # python reference (force fallback by calling the inner loop logic)
    t, d, g = len(thr), len(det), len(gt)
    ious = EV.box_iou_xyxy(det, gt)
    tp_p = np.zeros((t, d), bool)
    ig_p = np.zeros((t, d), bool)
    for ti, th in enumerate(thr):
        taken = np.zeros(g, bool)
        for di in range(d):
            best, best_iou = -1, th - 1e-10
            for gi in range(g):
                if taken[gi] and not gt_ig[gi]:
                    continue
                if gt_ig[gi] and best > -1 and not gt_ig[best]:
                    break
                if ious[di, gi] > best_iou:
                    best, best_iou = gi, ious[di, gi]
            if best > -1:
                if gt_ig[best]:
                    ig_p[ti, di] = True
                else:
                    taken[best] = True
                    tp_p[ti, di] = True
    np.testing.assert_array_equal(tp_n, tp_p)
    np.testing.assert_array_equal(ig_n, ig_p)

    # NMS parity vs the python greedy reference from test_nms
    from tests.test_nms import greedy_ml_nms

    boxes = rng.uniform(0, 200, (50, 2))
    boxes = np.concatenate([boxes, boxes + rng.uniform(10, 80, (50, 2))], 1).astype(np.float32)
    scores = rng.uniform(0.01, 1, 50).astype(np.float32)
    labels = rng.integers(0, 3, 50).astype(np.int32)
    ref = greedy_ml_nms(boxes, scores, labels, 0.5)
    keep = native.class_aware_nms(boxes, scores, labels, 0.5, 50)
    assert list(keep) == ref

    # resize path produces finite normalized output with padding zeroed
    img = rng.integers(0, 255, (37, 53, 3)).astype(np.uint8)
    out = native.resize_normalize_pad(
        img, 24, 36, (32, 48), [103.5, 116.3, 123.7], [57.4, 57.1, 58.4]
    )
    assert out.shape == (32, 48, 3)
    assert np.isfinite(out).all()
    assert (out[25:] == 0).all() and (out[:, 37:] == 0).all()


def test_roi_pool_block_max(rng):
    from mqdet_tpu.ops.roi_align import roi_pool

    f = jnp.asarray(rng.standard_normal((16, 16, 4)).astype(np.float32))
    rois = jnp.asarray([[0.0, 0.0, 15.0, 15.0]])
    out = np.asarray(roi_pool(f, rois, 1.0, output_size=4))[0]
    ref = np.asarray(f).reshape(4, 4, 4, 4, 4).max(axis=(1, 3))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_samplers():
    from mqdet_tpu.data.samplers import (
        distributed_shard, grouped_by_bucket, iteration_based,
    )

    shards = [distributed_shard(list(range(10)), 4, h, shuffle=False) for h in range(4)]
    assert all(len(s) == 3 for s in shards)
    assert set(shards[0]) | set(shards[1]) | set(shards[2]) | set(shards[3]) == set(range(10))

    b = grouped_by_bucket(list(range(6)), lambda i: i % 2, 2)
    for batch in b:
        assert len({i % 2 for i in batch}) == 1  # no mixed buckets
    b2 = grouped_by_bucket(list(range(6)), lambda i: i % 2, 2, drop_uneven=True)
    assert all(len(x) == 2 for x in b2)

    assert len(list(iteration_based([[1], [2]], 5))) == 5


def test_comm_single_host():
    from mqdet_tpu.parallel.comm import all_gather, get_rank, get_world_size, reduce_dict

    assert get_world_size() == 1 and get_rank() == 0
    assert all_gather({"a": 1}) == [{"a": 1}]
    out = reduce_dict({"x": jnp.asarray(2.0)})
    np.testing.assert_allclose(out["x"], 2.0)


@pytest.mark.slow  # ~13-27s; nightly tier
def test_pallas_deform_conv_matches_window(rng):
    """Interpret-mode Pallas kernel vs the XLA window composite (same
    clipped-offset semantics) — exact agreement expected."""
    from mqdet_tpu.ops.deform_conv import modulated_deform_conv_window
    from mqdet_tpu.ops.pallas.deform_conv_pallas import (
        modulated_deform_conv_pallas,
    )

    for stride, h, w_, cin, cout in [(1, 12, 20, 16, 8), (2, 13, 21, 8, 16)]:
        ho, wo = -(-h // stride), -(-w_ // stride)
        x = jnp.asarray(rng.standard_normal((2, h, w_, cin)).astype(np.float32))
        offset = jnp.asarray(
            (rng.standard_normal((2, ho, wo, 18)) * 1.5).astype(np.float32)
        )
        mask = jnp.asarray(rng.random((2, ho, wo, 9)).astype(np.float32))
        w = jnp.asarray(
            (rng.standard_normal((3, 3, cin, cout)) * 0.1).astype(np.float32)
        )
        bias = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))
        ref = modulated_deform_conv_window(
            x, offset, mask, w, bias, stride=stride, radius=2
        )
        for version in (1, 2):
            got = modulated_deform_conv_pallas(
                x, offset, mask, w, bias, stride=stride, radius=2,
                interpret=True, version=version,
            )
            assert got.shape == ref.shape
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=1e-4
            )


@pytest.mark.slow  # ~47s interpret-mode on this 1-CPU box
def test_pallas_deform_conv_v5_and_xtiles_exact(rng):
    """The v5 2x2-fast-path kernel and the x-tiling wrapper are bit-exact
    vs v2 untiled (both are measured-negative perf variants kept for
    sweeps — see PERF.md; exactness must not rot)."""
    from mqdet_tpu.ops.pallas.deform_conv_pallas import (
        modulated_deform_conv_pallas,
    )

    for stride in (1, 2):
        h, w_ = 12, 40
        ho, wo = h // stride, w_ // stride
        x = jnp.asarray(rng.standard_normal((2, h, w_, 8)).astype(np.float32))
        # half tight offsets (fast path), half wide (slow path)
        off = (rng.standard_normal((2, ho, wo, 18)) * 3.0).astype(np.float32)
        off[:, : ho // 2] *= 0.1
        offset = jnp.asarray(off)
        mask = jnp.asarray(rng.random((2, ho, wo, 9)).astype(np.float32))
        w = jnp.asarray(
            (rng.standard_normal((3, 3, 8, 16)) * 0.1).astype(np.float32)
        )
        bias = jnp.asarray(rng.standard_normal((16,)).astype(np.float32))
        ref = modulated_deform_conv_pallas(
            x, offset, mask, w, bias, stride=stride, radius=2,
            interpret=True, version=2, x_tiles=1,
        )
        for version, tiles in ((5, 1), (2, 3)):
            got = modulated_deform_conv_pallas(
                x, offset, mask, w, bias, stride=stride, radius=2,
                interpret=True, version=version, x_tiles=tiles,
            )
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_gather_deform_conv_matches_window(rng):
    """4-corner dynamic-gather kernel (interpret mode; blocked on hw by
    Mosaic single-vreg gather — see module docstring)."""
    from mqdet_tpu.ops.deform_conv import modulated_deform_conv_window
    from mqdet_tpu.ops.pallas.deform_conv_gather_pallas import (
        modulated_deform_conv_pallas_gather,
    )

    for stride in (1, 2):
        h, w_ = 12, 20
        ho, wo = -(-h // stride), -(-w_ // stride)
        x = jnp.asarray(rng.standard_normal((1, h, w_, 8)).astype(np.float32))
        offset = jnp.asarray(
            (rng.standard_normal((1, ho, wo, 18)) * 1.5).astype(np.float32)
        )
        mask = jnp.asarray(rng.random((1, ho, wo, 9)).astype(np.float32))
        w = jnp.asarray(
            (rng.standard_normal((3, 3, 8, 8)) * 0.1).astype(np.float32)
        )
        ref = modulated_deform_conv_window(x, offset, mask, w, stride=stride, radius=2)
        got = modulated_deform_conv_pallas_gather(
            x, offset, mask, w, stride=stride, radius=2, block_rows=4,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("dual_scores", [False, True])
def test_flash_bi_attention_matches_composite(rng, dual_scores):
    """Interpret-mode flash bi-attention kernel vs the plain two-softmax
    formulation (models/fusion.py BiMultiHeadAttention semantics), covering
    both score formulations (single shared matmul / recomputed s^T)."""
    import jax

    from mqdet_tpu.ops.pallas.bi_attention_pallas import flash_bi_attention

    b, n, t, e, h = 2, 700, 128, 256, 2
    d = e // h
    q = jnp.asarray((rng.standard_normal((b, n, e)) * 0.1).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, e)).astype(np.float32))
    vv = jnp.asarray(rng.standard_normal((b, n, e)).astype(np.float32))
    vl = jnp.asarray(rng.standard_normal((b, t, e)).astype(np.float32))
    mask = (rng.uniform(0, 1, (b, t)) > 0.25).astype(np.float32)
    bias = jnp.asarray(np.where(mask == 0, -9e15, 0.0).astype(np.float32))

    qh = q.reshape(b, n, h, d)
    kh = k.reshape(b, t, h, d)
    vvh = vv.reshape(b, n, h, d)
    vlh = vl.reshape(b, t, h, d)
    attn_v = jnp.einsum("bnhd,bthd->bhnt", qh, kh) + bias[:, None, None, :]
    ov_ref = jnp.einsum(
        "bhnt,bthd->bnhd", jax.nn.softmax(attn_v, -1), vlh
    ).reshape(b, n, e)
    attn_l = jnp.einsum("bthd,bnhd->bhtn", kh, qh)
    ol_ref = jnp.einsum(
        "bhtn,bnhd->bthd", jax.nn.softmax(attn_l, -1), vvh
    ).reshape(b, t, e)

    # block_n=256 forces multiple N tiles (online l-softmax) plus a padded
    # tail tile (700 = 2*256 + 188)
    ov, ol = flash_bi_attention(
        q, k, vv, vl, bias, num_heads=h, block_n=256, interpret=True,
        dual_scores=dual_scores,
    )
    np.testing.assert_allclose(np.asarray(ov), np.asarray(ov_ref), atol=2e-3)
    np.testing.assert_allclose(np.asarray(ol), np.asarray(ol_ref), atol=2e-3)

    if dual_scores:
        return  # the streaming form below is single-score only

    # streaming per-level form: splitting N across carried-state calls
    # (VLFuse's concat-free path) must match the flat result
    from mqdet_tpu.ops.pallas.bi_attention_pallas import (
        flash_bi_attention_levels,
    )

    sizes = [420, 180, 70, 30]  # sum = 700; mixed block/pad geometries
    starts = np.cumsum([0] + sizes)
    qs = [q[:, s:e_] for s, e_ in zip(starts, starts[1:])]
    vvs = [vv[:, s:e_] for s, e_ in zip(starts, starts[1:])]
    ovs, ol2 = flash_bi_attention_levels(
        qs, k, vvs, vl, bias, num_heads=h, interpret=True
    )
    np.testing.assert_allclose(
        np.concatenate([np.asarray(x) for x in ovs], axis=1),
        np.asarray(ov_ref), atol=2e-3,
    )
    np.testing.assert_allclose(np.asarray(ol2), np.asarray(ol_ref), atol=2e-3)
