"""Module-level parity vs the ACTUAL reference torch modules (CPU oracle).

Closes the VERDICT round-1 gaps: Swin block/backbone with SHIFTED windows
and non-window-divisible padding (swint.py:431-649), ATSS post-processor
semantics on random logits (rpn/inference.py:592-851), and DCNv2 against an
independent brute-force oracle with UNCLAMPED offsets up to +/-8 px
(csrc/cuda/deform_conv_kernel_cuda.cu bilinear sampling is unbounded).
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference tree not mounted"
)


# ---------------------------------------------------------------------------
# Swin backbone: shifted windows + padding
# ---------------------------------------------------------------------------


@pytest.mark.slow  # ~26s; nightly tier
def test_swin_backbone_parity_shifted_windows():
    """Full 4-stage Swin vs reference swint.SwinTransformer on a 96x80 input
    (24x20 patch grid -> window-7 padding on every stage, shift on every
    second block). Weight copy goes through the production rule table."""
    import ref_harness as rh

    import jax.numpy as jnp

    from mqdet_tpu.io.torch_import import import_glip_checkpoint
    from mqdet_tpu.models.swin import SwinTransformer

    swint = rh.ref_import("maskrcnn_benchmark.modeling.backbone.swint")
    torch.manual_seed(0)
    depths, heads = (2, 2, 2, 2), (1, 2, 4, 8)
    ref = swint.SwinTransformer(
        patch_size=4,
        in_chans=3,
        embed_dim=32,
        depths=depths,
        num_heads=heads,
        window_size=7,
        mlp_ratio=4.0,
        qkv_bias=True,
        qk_scale=None,
        drop_rate=0.0,
        attn_drop_rate=0.0,
        drop_path_rate=0.0,
        ape=False,
        patch_norm=True,
        frozen_stages=-1,
        backbone_arch="SWINT-FPN-RETINANET",
        out_features=["stage2", "stage3", "stage4", "stage5"],
    )
    # swint.py overrides train() without returning self, so .eval() chains
    # to None; call it as a statement instead
    ref.eval()
    # randomize the zero-init relative position bias tables so the
    # window-attention bias path is actually exercised
    with torch.no_grad():
        for n, p in ref.named_parameters():
            if "relative_position_bias_table" in n:
                p.normal_(std=0.5)

    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, 96, 80, 3)).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(img.transpose(0, 3, 1, 2)))

    ours = SwinTransformer(
        embed_dim=32, depths=depths, num_heads=heads, window_size=7,
        drop_path_rate=0.0, norm_stage0=False,
    )
    import jax

    params = jax.eval_shape(model_init := ours.init, jax.random.PRNGKey(0), jnp.asarray(img))
    params = jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), params)
    wrapped = {"params": {"backbone": params["params"]}}
    state = {"backbone.body." + k: v.numpy() for k, v in ref.state_dict().items()}
    wrapped, report = import_glip_checkpoint(wrapped, state)
    assert report["missing"] == [], report["missing"][:8]
    params = {"params": wrapped["params"]["backbone"]}

    outs = ours.apply(params, jnp.asarray(img))
    assert len(outs) == 4
    for i, (r, o) in enumerate(zip(ref_outs, outs)):
        o = np.asarray(o).transpose(0, 3, 1, 2)
        r = r.numpy()
        assert r.shape == o.shape, (i, r.shape, o.shape)
        np.testing.assert_allclose(
            o, r, atol=2e-4, err_msg=f"stage {i} diverges"
        )


# ---------------------------------------------------------------------------
# ATSS post-processor semantics on random logits
# ---------------------------------------------------------------------------


def _ref_postprocessor(rh, num_classes, pre_nms_thresh=0.05, top_n=100,
                       nms_th=0.6, cap=30):
    inference = rh.ref_import("maskrcnn_benchmark.modeling.rpn.inference")
    vld = rh.ref_import("maskrcnn_benchmark.modeling.rpn.vldyhead")
    cfg = rh.ref_config()
    box_coder = vld.BoxCoder(cfg)
    return inference.ATSSPostProcessor(
        pre_nms_thresh=pre_nms_thresh,
        pre_nms_top_n=top_n,
        nms_thresh=nms_th,
        fpn_post_nms_top_n=cap,
        min_size=0,
        num_classes=num_classes,
        box_coder=box_coder,
        score_agg="MEAN",
    )


@pytest.mark.slow  # ~14-31s; nightly tier
def test_atss_postprocess_parity_random_logits():
    """Threshold -> per-level topk -> decode -> ml_nms -> kthvalue cap,
    vs our masked fixed-shape program, on well-spread random logits."""
    import ref_harness as rh

    import jax
    import jax.numpy as jnp

    from mqdet_tpu.models.postprocess import (
        PostprocessParams,
        atss_postprocess,
        build_agg_map,
    )
    from mqdet_tpu.ops.anchors import anchors_for_fpn

    rh.install_stubs()
    from maskrcnn_benchmark.structures.bounding_box import BoxList

    H = W = 64
    T, C = 16, 3
    spans = [[1, 2], [4], [6, 7, 8]]
    positive_map = {j + 1: spans[j] for j in range(C)}

    anchors_np = anchors_for_fpn(
        (H, W), strides=(8, 16, 32, 64, 128),
        sizes=(64, 128, 256, 512, 1024), aspect_ratios=(1.0,),
    )
    rng = np.random.default_rng(5)
    bbox_levels, ctr_levels, dot_levels, ref_anchor_bl = [], [], [], []
    for a in anchors_np:
        hw = a.shape[0]
        side = int(np.sqrt(hw))
        bbox_levels.append(rng.standard_normal((1, side, side, 4)).astype(np.float32) * 0.3)
        ctr_levels.append(rng.standard_normal((1, side, side, 1)).astype(np.float32))
        dot_levels.append((rng.standard_normal((1, hw, T)) * 3).astype(np.float32))
        ref_anchor_bl.append(BoxList(torch.from_numpy(a), (W, H), mode="xyxy"))

    post = _ref_postprocessor(rh, num_classes=C + 1)
    with torch.no_grad():
        ref_out = post(
            box_regression=[
                torch.from_numpy(b.transpose(0, 3, 1, 2)) for b in bbox_levels
            ],
            centerness=[
                torch.from_numpy(c.transpose(0, 3, 1, 2)) for c in ctr_levels
            ],
            anchors=[ref_anchor_bl],
            # the real eval path always passes the head's cls_logits; only its
            # channel count C is consumed before dot-product scores overwrite
            # it (rpn/inference.py:771,627-667)
            box_cls=[
                torch.zeros(1, C, b.shape[1], b.shape[2]) for b in bbox_levels
            ],
            dot_product_logits=[torch.from_numpy(d) for d in dot_levels],
            positive_map=positive_map,
        )[0]

    p = PostprocessParams(
        pre_nms_thresh=0.05, pre_nms_top_n=100, nms_thresh=0.6,
        detections_per_img=30, min_size=0.0, score_agg="MEAN",
    )
    head_out = {
        "bbox_reg": [jnp.asarray(b) for b in bbox_levels],
        "centerness": [jnp.asarray(c) for c in ctr_levels],
        "dot_product_logits": [jnp.asarray(d) for d in dot_levels],
    }
    agg = build_agg_map(spans, T)
    dets = atss_postprocess(
        head_out, [jnp.asarray(a) for a in anchors_np], jnp.asarray(agg),
        jnp.asarray([[H, W]], np.float32), p,
    )
    valid = np.asarray(dets.valid[0]).astype(bool)
    boxes = np.asarray(dets.boxes[0])[valid]
    scores = np.asarray(dets.scores[0])[valid]
    labels = np.asarray(dets.labels[0])[valid]
    o = np.argsort(-scores)
    boxes, scores, labels = boxes[o], scores[o], labels[o]

    r_scores = ref_out.get_field("scores").numpy()
    r_labels = ref_out.get_field("labels").numpy()
    r_boxes = ref_out.bbox.numpy()
    ro = np.argsort(-r_scores)
    r_boxes, r_scores, r_labels = r_boxes[ro], r_scores[ro], r_labels[ro]

    assert len(scores) == len(r_scores)
    np.testing.assert_allclose(scores, r_scores, atol=1e-5)
    np.testing.assert_array_equal(labels, r_labels)
    np.testing.assert_allclose(boxes, r_boxes, atol=1e-3)


# ---------------------------------------------------------------------------
# DCNv2 vs independent brute-force oracle, unclamped offsets
# ---------------------------------------------------------------------------


def _dcn_numpy_oracle(x, offset, mask, weight, bias, stride=1):
    """Direct loop transcription of the CUDA modulated-deformable-im2col
    semantics (deform_conv_kernel_cuda.cu): for each output position and
    3x3 tap, sample input at p0 + p_k + learned offset with UNBOUNDED
    bilinear interpolation (zero outside), scale by the modulation mask,
    then contract with the conv weight."""
    b, h, w, c = x.shape
    ho, wo = offset.shape[1], offset.shape[2]
    _, _, _, cout = weight.shape
    out = np.zeros((b, ho, wo, cout), np.float64)

    def sample(img, y, xx):
        if y <= -1 or y >= h or xx <= -1 or xx >= w:
            return np.zeros(c)
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        ly, lx = y - y0, xx - x0
        v = np.zeros(c)
        for dy, wy in ((0, 1 - ly), (1, ly)):
            for dx, wx in ((0, 1 - lx), (1, lx)):
                yy, xc = y0 + dy, x0 + dx
                if 0 <= yy < h and 0 <= xc < w:
                    v += wy * wx * img[yy, xc]
        return v

    for bi in range(b):
        for i in range(ho):
            for j in range(wo):
                acc = np.zeros(cout)
                for k in range(9):
                    ky, kx = divmod(k, 3)
                    dy = offset[bi, i, j, 2 * k]
                    dx = offset[bi, i, j, 2 * k + 1]
                    y = i * stride - 1 + ky + dy
                    xx = j * stride - 1 + kx + dx
                    s = sample(x[bi], y, xx) * mask[bi, i, j, k]
                    acc += s @ weight[ky, kx]
                out[bi, i, j] = acc + bias
    return out.astype(np.float32)


def test_dcn_gather_matches_oracle_large_offsets():
    """The exact gather path must reproduce unbounded CUDA sampling for
    offsets up to +/-8 px (far beyond the window path's clip radius)."""
    import jax.numpy as jnp

    from mqdet_tpu.ops.deform_conv import modulated_deform_conv

    rng = np.random.default_rng(0)
    b, h, w, c, cout = 1, 10, 12, 4, 6
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    offset = (rng.uniform(-8, 8, (b, h, w, 18))).astype(np.float32)
    mask = rng.uniform(0, 1, (b, h, w, 9)).astype(np.float32)
    wgt = rng.standard_normal((3, 3, c, cout)).astype(np.float32) * 0.2
    bias = rng.standard_normal((cout,)).astype(np.float32)

    want = _dcn_numpy_oracle(x, offset, mask, wgt, bias)
    got = np.asarray(
        modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(wgt), jnp.asarray(bias),
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_dcn_window_matches_gather_within_radius():
    """Within the clip radius the window formulation is exact; beyond it the
    dispatcher must NOT be trusted — calibrate_deform_radius covers that."""
    import jax.numpy as jnp

    from mqdet_tpu.ops.deform_conv import (
        modulated_deform_conv,
        modulated_deform_conv_window,
    )

    rng = np.random.default_rng(1)
    b, h, w, c, cout = 1, 8, 8, 4, 4
    radius = 4
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    offset = (rng.uniform(-radius, radius, (b, h, w, 18)) * 0.99).astype(np.float32)
    mask = rng.uniform(0, 1, (b, h, w, 9)).astype(np.float32)
    wgt = rng.standard_normal((3, 3, c, cout)).astype(np.float32) * 0.2
    bias = np.zeros((cout,), np.float32)

    want = np.asarray(
        modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(wgt), jnp.asarray(bias),
        )
    )
    got = np.asarray(
        modulated_deform_conv_window(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(wgt), jnp.asarray(bias), radius=radius,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)
