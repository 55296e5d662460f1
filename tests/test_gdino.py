"""MQ-GroundingDINO stack tests (tiny config, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mqdet_tpu.models import gdino as GD


def tiny_gdino(**kw):
    args = dict(
        embed_dim=16, depths=(1, 1, 1, 1), num_heads_swin=(1, 2, 4, 8),
        window_size=4, hidden_dim=32, n_heads=4, d_ffn=64,
        enc_layers=1, dec_layers=2, num_queries=12, num_feature_levels=4,
        max_text_len=24, lang_layers=2, lang_dim=48, lang_heads=2,
        lang_intermediate=96, vocab_size=200, start_qv_layer=1,
    )
    args.update(kw)
    return GD.MQGroundingDINO(**args)


def test_sub_sentence_masks():
    # [CLS] a b . c [SEP] — reference semantics (bertwarper.py:271-320):
    # blocks span (prev_special, this_special]; positions restart at 0 at
    # each block start; [CLS] and padding are self-only with position 0.
    ids = jnp.asarray([[101, 5, 6, 1012, 7, 102, 0, 0]])
    attn, pos = GD.sub_sentence_masks(ids)
    attn = np.asarray(attn[0])
    pos = np.asarray(pos[0])
    # a<->b same phrase; the terminating '.' is part of the block
    assert attn[1, 2] and attn[2, 1] and attn[1, 3] and attn[3, 2]
    # a and c in different phrases; [CLS] attends only itself
    assert not attn[1, 4] and not attn[4, 1]
    assert attn[0, 0] and not attn[0, 1] and not attn[1, 0]
    # c and [SEP] form the second block
    assert attn[4, 5] and attn[5, 4]
    # pads: identity only
    assert attn[6, 6] and not attn[6, 7]
    np.testing.assert_array_equal(pos, [0, 0, 1, 2, 0, 1, 0, 0])


def test_sub_sentence_masks_position0_not_special():
    # Position 0 without a [CLS]: the reference's previous_col=0 init
    # (bertwarper.py:285) keeps position 0 OUT of the first block — it stays
    # identity-only with position id 0 even though a terminator follows.
    ids = jnp.asarray([[5, 6, 1012, 7, 102, 0]])
    attn, pos = GD.sub_sentence_masks(ids)
    attn = np.asarray(attn[0])
    assert attn[0, 0] and not attn[0, 1] and not attn[1, 0] and not attn[0, 2]
    # the rest of the first block still forms normally
    assert attn[1, 2] and attn[2, 1]
    np.testing.assert_array_equal(np.asarray(pos[0]), [0, 0, 1, 0, 1, 0])


def test_sub_sentence_masks_reference_parity():
    """Exact match vs the actual reference implementation on varied ids."""
    torch = pytest.importorskip("torch")
    import os

    if not os.path.isdir("/root/reference"):
        pytest.skip("reference tree not mounted")
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    import importlib.util

    import ref_harness as rh

    rh.install_stubs()  # torchvision.ops.boxes.nms stub for bertwarper
    spec = importlib.util.spec_from_file_location(
        "ref_bertwarper",
        "/root/reference/groundingdino_new/models/GroundingDINO/bertwarper.py",
    )
    bw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bw)
    rng = np.random.default_rng(3)
    specials = [101, 102, 1012, 1029]
    for trial in range(4):
        t = 16
        ids = rng.integers(3, 50, (2, t))
        ids[:, 0] = 101
        # scatter a few specials, ensure a [SEP] near the end
        for b in range(2):
            for p in sorted(rng.choice(np.arange(2, t - 2), 3, replace=False)):
                ids[b, p] = 1012
            ids[b, rng.integers(t - 3, t)] = 102
        if trial == 3:
            ids[0, -1] = 102  # special in the final slot (self-only branch)
        tok = {"input_ids": torch.from_numpy(ids)}
        ref_attn, ref_pos, _ = (
            bw.generate_masks_with_special_tokens_and_transfer_map(
                tok, specials, None
            )
        )
        attn, pos = GD.sub_sentence_masks(jnp.asarray(ids), specials)
        np.testing.assert_array_equal(np.asarray(attn), ref_attn.numpy())
        np.testing.assert_array_equal(np.asarray(pos), ref_pos.numpy())


def test_msda_sampling_matches_torch_grid_sample(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from mqdet_tpu.ops.ms_deform_attn import ms_deform_attn_sample

    b, nh, hd = 1, 2, 4
    shapes = [(6, 8), (3, 4)]
    s = sum(h * w for h, w in shapes)
    q, npnt = 5, 3
    value = rng.standard_normal((b, s, nh, hd)).astype(np.float32)
    loc = rng.uniform(0.1, 0.9, (b, q, nh, len(shapes), npnt, 2)).astype(np.float32)
    attn = rng.uniform(size=(b, q, nh, len(shapes), npnt)).astype(np.float32)
    attn = attn / attn.sum(axis=(3, 4), keepdims=True)

    got = np.asarray(
        ms_deform_attn_sample(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn))
    )

    # torch reference (ms_deform_attn.py:93-134 fallback semantics)
    tv = torch.from_numpy(value)
    out = torch.zeros((b, q, nh, hd))
    start = 0
    for lvl, (h, w) in enumerate(shapes):
        v_l = tv[:, start : start + h * w].permute(0, 2, 3, 1).reshape(b * nh, hd, h, w)
        grid = torch.from_numpy(2 * loc[:, :, :, lvl] - 1).permute(0, 2, 1, 3, 4).reshape(b * nh, q, npnt, 2)
        sampled = F.grid_sample(v_l, grid, mode="bilinear", padding_mode="zeros", align_corners=False)
        wgt = torch.from_numpy(attn[:, :, :, lvl]).permute(0, 2, 1, 3).reshape(b * nh, 1, q, npnt)
        out += (sampled * wgt).sum(-1).reshape(b, nh, hd, q).permute(0, 3, 1, 2)
        start += h * w
    ref = out.reshape(b, q, nh * hd).numpy()
    np.testing.assert_allclose(got.reshape(b, q, nh * hd), ref, atol=1e-4)


@pytest.mark.slow
def test_gdino_forward_shapes(rng):
    model = tiny_gdino()
    images = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    ids = jnp.asarray([[101] + list(rng.integers(5, 200, 10)) + [102] + [0] * 12], jnp.int32)
    mask = (ids != 0).astype(jnp.int32)
    queries = jnp.asarray(rng.standard_normal((1, 4, 32)).astype(np.float32))
    qmask = jnp.ones((1, 4, 24))
    params = model.init(jax.random.PRNGKey(0), images, ids, mask, queries, qmask)
    out = model.apply(params, images, ids, mask, queries, qmask)
    assert out["pred_logits"].shape == (1, 12, 24)
    assert out["pred_boxes"].shape == (1, 12, 4)
    assert len(out["aux_logits"]) == 1
    b = np.asarray(out["pred_boxes"])
    assert (b >= 0).all() and (b <= 1).all()
    # GCP params present (shared QVBert)
    paths = ["/".join(str(p) for p in kp) for kp, _ in
             jax.tree_util.tree_leaves_with_path(params)]
    assert any("qv_layer" in p for p in paths)


def test_gdino_postprocess(rng):
    logits = jnp.asarray(rng.standard_normal((1, 12, 24)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0.2, 0.8, (1, 12, 4)).astype(np.float32))
    agg = np.zeros((1, 3, 24), np.float32)
    agg[0, 0, 1:3] = 0.5
    agg[0, 1, 4:5] = 1.0
    agg[0, 2, 6:8] = 0.5
    sizes = jnp.asarray([[60.0, 80.0]])
    dets = GD.gdino_postprocess(logits, boxes, jnp.asarray(agg), sizes,
                                box_threshold=0.05)
    # one slot per query (reference keeps every box above box_threshold with
    # its top-1 class; no NMS — groundingdino.py:291-335)
    assert dets.boxes.shape == (1, 12, 4)
    assert np.asarray(dets.labels).min() >= 1
    assert np.asarray(dets.valid).any()
    b = np.asarray(dets.boxes)
    assert (b[..., [0, 2]] <= 79.0 + 1e-5).all()
    assert (b[..., [1, 3]] <= 59.0 + 1e-5).all()
    assert (b >= 0).all()


@pytest.mark.slow  # ~11s; nightly tier
def test_hungarian_match_prefers_overlap():
    from mqdet_tpu.engine.gdino_losses import hungarian_match

    pred_boxes = jnp.asarray(
        [[0.2, 0.2, 0.1, 0.1], [0.7, 0.7, 0.2, 0.2], [0.5, 0.5, 0.9, 0.9]]
    )
    gt_boxes = jnp.asarray([[0.7, 0.7, 0.2, 0.2], [0.2, 0.2, 0.1, 0.1]])
    t = 8
    logits = jnp.zeros((3, t))
    gtm = np.zeros((2, t), np.float32)
    gtm[:, 1] = 1
    q_ind, valid = hungarian_match(
        logits, pred_boxes, jnp.asarray(gtm), gt_boxes, jnp.asarray([True, True])
    )
    assert list(np.asarray(q_ind)) == [1, 0]


@pytest.mark.slow
def test_gdino_set_loss_finite(rng):
    from mqdet_tpu.engine.gdino_losses import gdino_set_loss

    q, t, g = 12, 24, 3
    outputs = {
        "pred_logits": jnp.asarray(rng.standard_normal((1, q, t)).astype(np.float32)),
        "pred_boxes": jnp.asarray(rng.uniform(0.2, 0.8, (1, q, 4)).astype(np.float32)),
        "aux_logits": [jnp.asarray(rng.standard_normal((1, q, t)).astype(np.float32))],
        "aux_boxes": [jnp.asarray(rng.uniform(0.2, 0.8, (1, q, 4)).astype(np.float32))],
    }
    gtm = np.zeros((1, g, t), np.float32)
    gtm[0, :, 2] = 1
    losses = gdino_set_loss(
        outputs,
        jnp.asarray(rng.uniform(0.3, 0.7, (1, g, 4)).astype(np.float32)),
        jnp.asarray([[True, True, False]]),
        jnp.asarray(gtm),
        jnp.ones((1, t)),
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert "loss_ce_0" in losses  # reference aux naming, loss.py:160
