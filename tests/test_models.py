"""Shape/behavior tests for the model stack on tiny configs (CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mqdet_tpu.models.swin import SwinTransformer
from mqdet_tpu.models.fpn import FPN
from mqdet_tpu.models.bert import (
    GatedCrossAttentionBlock,
    LanguageBackbone,
    MaskedCrossAttention,
    PreSelectModule,
)
from mqdet_tpu.models.vldyhead import VLDyHead
from mqdet_tpu.models.mq_glip import MQGLIP, flatten_fpn_features


TINY_SWIN = dict(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8), window_size=4)


@pytest.mark.slow  # ~18s; nightly tier
def test_swin_output_shapes(rng):
    m = SwinTransformer(**TINY_SWIN)
    x = jnp.asarray(rng.standard_normal((1, 64, 96, 3)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(params, x)
    assert len(outs) == 4
    assert outs[0].shape == (1, 16, 24, 16)
    assert outs[1].shape == (1, 8, 12, 32)
    assert outs[2].shape == (1, 4, 6, 64)
    assert outs[3].shape == (1, 2, 3, 128)


@pytest.mark.slow  # ~10s; nightly tier
def test_swin_nondivisible_input(rng):
    m = SwinTransformer(**TINY_SWIN)
    x = jnp.asarray(rng.standard_normal((1, 50, 70, 3)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(params, x)
    assert outs[0].shape == (1, 13, 18, 16)


def test_fpn_five_levels(rng):
    m = FPN(out_channels=32)
    feats = [
        jnp.asarray(rng.standard_normal((1, 16, 24, 32)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((1, 8, 12, 64)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((1, 4, 6, 128)).astype(np.float32)),
    ]
    params = m.init(jax.random.PRNGKey(0), feats)
    outs = m.apply(params, feats)
    assert [o.shape for o in outs] == [
        (1, 16, 24, 32), (1, 8, 12, 32), (1, 4, 6, 32), (1, 2, 3, 32), (1, 1, 2, 32),
    ]


def test_masked_cross_attention_no_query_is_zero(rng):
    m = MaskedCrossAttention(input_dim=32)
    x = jnp.asarray(rng.standard_normal((2, 5, 32)).astype(np.float32))
    vision = jnp.asarray(rng.standard_normal((2, 7, 32)).astype(np.float32))
    mask = np.zeros((2, 7, 5), np.float32)
    mask[0, :3, 1] = 1  # image 0, token 1 sees queries 0..2
    params = m.init(jax.random.PRNGKey(0), x, vision, jnp.asarray(mask))
    out = m.apply(params, x, vision, jnp.asarray(mask))
    out = np.asarray(out)
    # tokens with no queries get exactly zero output
    assert np.abs(out[0, 0]).max() == 0
    assert np.abs(out[1]).max() == 0
    assert np.abs(out[0, 1]).max() > 0


def test_gcp_block_identity_at_init(rng):
    """Gates init to 0 -> GCP block must be an exact identity."""
    m = GatedCrossAttentionBlock(dim=32)
    x = jnp.asarray(rng.standard_normal((2, 5, 32)).astype(np.float32))
    vision = jnp.asarray(rng.standard_normal((2, 4, 32)).astype(np.float32))
    mask = jnp.ones((2, 4, 5))
    params = m.init(jax.random.PRNGKey(0), x, vision, mask)
    out = m.apply(params, x, vision, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_pre_select_maps_dims(rng):
    m = PreSelectModule(dim=16, out_dim=48)
    vision = jnp.asarray(rng.standard_normal((2, 6, 16)).astype(np.float32))
    image = jnp.asarray(rng.standard_normal((2, 10, 16)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), vision, image)
    out = m.apply(params, vision, image)
    assert out.shape == (2, 6, 48)


def test_language_backbone_with_queries(rng):
    m = LanguageBackbone(
        num_layers=2, hidden_size=32, num_heads=2, intermediate_size=64,
        vocab_size=100, start_qv_layer=1, vision_dim=16,
    )
    ids = jnp.asarray(rng.integers(0, 100, (2, 12)).astype(np.int32))
    mask = jnp.ones((2, 12), jnp.int32)
    queries = jnp.asarray(rng.standard_normal((2, 6, 16)).astype(np.float32))
    qmask = jnp.ones((2, 6, 12))
    image_tokens = jnp.asarray(rng.standard_normal((2, 9, 16)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), ids, mask, queries, qmask, image_tokens)
    out = m.apply(params, ids, mask, queries, qmask, image_tokens)
    assert out["hidden"].shape == (2, 12, 32)
    assert out["embedded"].shape == (2, 12, 32)
    assert out["aggregate"].shape == (2, 32)
    # params contain qv layers and gates
    flat = jax.tree_util.tree_leaves_with_path(params)
    paths = ["/".join(str(p) for p in kp) for kp, _ in flat]
    assert any("qv_layer" in p for p in paths)
    assert any("ff_gate" in p for p in paths)
    assert any("pre_select" in p for p in paths)


def test_vldyhead_shapes(rng):
    m = VLDyHead(
        num_convs=1, channels=16, in_channels=16, lang_dim=32, lang_heads=2,
        lang_intermediate=64, num_classes=7, use_deform=True,
    )
    feats = [
        jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((1, 4, 4, 16)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((1, 2, 2, 16)).astype(np.float32)),
    ]
    lang = jnp.asarray(rng.standard_normal((1, 12, 32)).astype(np.float32))
    masks = jnp.ones((1, 12), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), feats, lang, masks)
    out = m.apply(params, feats, lang, masks)
    assert out["logits"][0].shape == (1, 8, 8, 7)
    assert out["bbox_reg"][1].shape == (1, 4, 4, 4)
    assert out["centerness"][2].shape == (1, 2, 2, 1)
    assert out["dot_product_logits"][0].shape == (1, 64, 12)
    assert out["fused_lang_hidden"].shape == (1, 12, 32)


@pytest.mark.slow
def test_mq_glip_tiny_end_to_end(rng):
    m = MQGLIP(
        embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8), window_size=4,
        out_channels=16, num_convs=1, num_classes=7,
        lang_layers=2, lang_dim=32, lang_heads=2, lang_intermediate=64,
        vocab_size=100, start_qv_layer=1,
    )
    images = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 100, (1, 16)).astype(np.int32))
    mask = jnp.ones((1, 16), jnp.int32)
    queries = jnp.asarray(rng.standard_normal((1, 5, 16)).astype(np.float32))
    qmask = jnp.ones((1, 5, 16))
    params = m.init(jax.random.PRNGKey(0), images, ids, mask, queries, qmask)
    out = m.apply(params, images, ids, mask, queries, qmask)
    assert len(out["bbox_reg"]) == 5
    assert out["dot_product_logits"][0].shape[-1] == 16


def test_flatten_fpn_features(rng):
    feats = [
        jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((2, 4, 4, 4)).astype(np.float32)),
    ]
    out = flatten_fpn_features(feats)
    assert out.shape == (2, 16 + 4, 4)


def test_swin_v2_variant(rng):
    """Swin-v2: cosine attention + log-CPB + post-norm (swint_v2.py twin)."""
    import jax

    from mqdet_tpu.models.swin import SwinTransformer

    m = SwinTransformer(
        embed_dim=16, depths=(1, 1), num_heads=(2, 4), window_size=4,
        out_indices=(0, 1), version="v2",
    )
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    from flax.traverse_util import flatten_dict
    names = {"/".join(k) for k in flatten_dict(params["params"]).keys()}
    assert any("logit_scale" in n for n in names)
    assert any("cpb_mlp_fc1" in n for n in names)
    outs = m.apply(params, x)
    assert outs[0].shape == (1, 8, 8, 16) and outs[1].shape == (1, 4, 4, 32)
    assert not np.isnan(np.asarray(outs[1])).any()


@pytest.mark.slow  # ~34s, non-default fuse variants
def test_vldyhead_fuse_type_variants(rng):
    """FUSE_CONFIG.TYPE dispatch (reference vldyhead.py:381-431): every
    variant produces the standard per-level head outputs."""
    import jax
    from mqdet_tpu.models.vldyhead import VLDyHead

    levels = [(16, 16), (8, 8), (4, 4)]
    feats = [
        jnp.asarray(rng.standard_normal((2, h, w, 32)).astype(np.float32))
        for h, w in levels
    ]
    lang = jnp.asarray(rng.standard_normal((2, 24, 48)).astype(np.float32))
    masks = jnp.ones((2, 24), jnp.int32)
    agg = jnp.asarray(rng.standard_normal((2, 48)).astype(np.float32))

    for fuse_type in ("MHA-B", "MHA-S", "SCAN", "FILM"):
        head = VLDyHead(
            num_convs=2, channels=32, in_channels=32, lang_dim=48,
            lang_heads=4, lang_intermediate=96, num_classes=5,
            use_deform=False, use_dyfuse=False, use_dyrelu=False,
            fuse_type=fuse_type, gn_groups=4,
        )
        params = head.init(
            jax.random.PRNGKey(0), feats, lang, masks, lang_aggregate=agg
        )
        out = head.apply(params, feats, lang, masks, lang_aggregate=agg)
        assert len(out["dot_product_logits"]) == 3
        for (h, w), dp, bb in zip(
            levels, out["dot_product_logits"], out["bbox_reg"]
        ):
            assert dp.shape == (2, h * w, 24)
            assert bb.shape == (2, h, w, 4)
            assert np.isfinite(np.asarray(dp)).all()
