"""Swin vl / v2_vl variants: joint image<->text last-stage window attention.

Covers swint_vl.py / swint_v2_vl.py semantics: text joins only the last
stage, both streams are updated, masked text tokens do not influence the
image stream.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mqdet_tpu.models.swin import SwinTransformer


def _tiny(version):
    return SwinTransformer(
        embed_dim=16,
        depths=(1, 1, 1, 1),
        num_heads=(1, 2, 2, 2),
        window_size=4,
        drop_path_rate=0.0,
        version=version,
    )


@pytest.mark.slow  # ~24s/variant
@pytest.mark.parametrize("version", ["vl", "v2_vl"])
def test_vl_forward_shapes(version):
    m = _tiny(version)
    x = jnp.ones((2, 32, 32, 3))
    xt = jnp.ones((2, 6, 24))
    tm = jnp.ones((2, 6), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), x, x_text=xt, text_masks=tm)
    feats, xt_out = m.apply(params, x, x_text=xt, text_masks=tm)
    assert [f.shape for f in feats] == [
        (2, 8, 8, 16), (2, 4, 4, 32), (2, 2, 2, 64), (2, 1, 1, 128)
    ]
    assert xt_out.shape == (2, 6, 24)
    # the text stream must actually be transformed
    assert not np.allclose(np.asarray(xt_out), np.asarray(xt))


def test_vl_text_params_only_in_last_stage():
    m = _tiny("vl")
    x = jnp.ones((1, 32, 32, 3))
    xt = jnp.ones((1, 6, 24))
    params = m.init(jax.random.PRNGKey(0), x, x_text=xt)
    names = {
        "/".join(str(k.key) for k in path)
        for path, _ in jax.tree_util.tree_leaves_with_path(params)
    }
    qkv_text_layers = {n for n in names if "qkv_text" in n}
    assert qkv_text_layers, "text attention params missing"
    assert all("layers_3_" in n for n in qkv_text_layers), (
        "text attention must be confined to the last stage (swint_vl.py:618-620)"
    )


def test_vl_without_text_matches_v1_structure():
    """vl with no text behaves like a plain v1 backbone (same output count)."""
    m = _tiny("vl")
    x = jnp.ones((1, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(params, x)
    assert len(feats) == 4


def test_vl_masked_text_does_not_leak_into_image():
    """Image output must be invariant to the content of masked text tokens."""
    m = _tiny("vl")
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    xt1 = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 24))
    # same first 3 tokens, wildly different masked tail
    xt2 = xt1.at[:, 3:].set(100.0)
    tm = jnp.asarray([[1, 1, 1, 0, 0, 0]], jnp.int32)
    params = m.init(jax.random.PRNGKey(0), x, x_text=xt1, text_masks=tm)
    feats1, _ = m.apply(params, x, x_text=xt1, text_masks=tm)
    feats2, _ = m.apply(params, x, x_text=xt2, text_masks=tm)
    for f1, f2 in zip(feats1, feats2):
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)
