"""Round-trip test of the GroundingDINO checkpoint importer
(groundingdino_swint_ogc.pth naming: groundingdino.py:130-288,
transformer.py:157-845, bertwarper.py:26-46) on the tiny MQ-GDINO model."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mqdet_tpu.io import torch_import as TI


def _fabricate(ref_key: str, leaf_shape) -> tuple:
    """Torch-layout shape for a reference key given our flax leaf shape."""
    if ref_key.endswith("in_proj_weight"):
        return (3 * leaf_shape[1], leaf_shape[1])
    if ref_key.endswith("in_proj_bias"):
        return (3 * leaf_shape[0],)
    if len(leaf_shape) == 4:  # conv kernel HWIO -> OIHW
        return (leaf_shape[3], leaf_shape[2], leaf_shape[0], leaf_shape[1])
    if ref_key.endswith(".weight") and len(leaf_shape) == 2 and not (
        "embeddings" in ref_key or ref_key.endswith("tgt_embed.weight")
    ):
        return (leaf_shape[1], leaf_shape[0])  # linear
    return tuple(leaf_shape)


@pytest.mark.slow  # ~74s
def test_gdino_import_round_trip():
    from test_gdino import tiny_gdino

    model = tiny_gdino()
    b, h, w, t = 1, 64, 64, 24
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((b, h, w, 3)),
        jnp.concatenate(
            [jnp.asarray([[101]]), jnp.full((b, t - 2), 7), jnp.asarray([[102]])], 1
        ).astype(jnp.int32),
        jnp.ones((b, t), jnp.int32),
        jnp.zeros((b, 3, 32)),
        jnp.ones((b, 3, t), jnp.float32),
    )

    rules = TI.build_gdino_rule_table(enc_layers=1, dec_layers=2)
    rng = np.random.default_rng(0)
    state = {}
    expected = []
    not_covered = []

    def visit(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        name = name.replace("params/", "", 1)
        rule = rules.get(name)
        if rule is None:
            not_covered.append(name)
            return leaf
        ref_keys, tf = rule
        ref_key = ref_keys if isinstance(ref_keys, str) else ref_keys[0]
        if ref_key not in state:
            state[ref_key] = rng.standard_normal(
                _fabricate(ref_key, leaf.shape)
            ).astype(np.float32)
        expected.append((name, ref_key, tf(state[ref_key])))
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    assert not not_covered, f"params without import rule: {not_covered[:20]}"

    new_params, report = TI.import_gdino_checkpoint(
        params, state, enc_layers=1, dec_layers=2
    )
    assert not report["missing"], report["missing"][:10]
    assert not report["unused"], report["unused"][:10]

    flat = {
        "/".join(str(getattr(k, "key", k)) for k in p).replace("params/", "", 1): v
        for p, v in jax.tree_util.tree_leaves_with_path(new_params)
    }
    for name, ref_key, want in expected:
        np.testing.assert_allclose(
            flat[name], want, rtol=1e-6,
            err_msg=f"{name} <- {ref_key} not round-tripped",
        )


def test_gdino_bbox_embed_share_fallback():
    """dec_pred_bbox_embed_share=True checkpoints may only materialize
    bbox_embed.0 — every decoder layer's box MLP must fall back to it."""
    rules = TI.build_gdino_rule_table(dec_layers=3)
    ref, _ = rules["bbox_embed_2/layers_0/kernel"]
    assert ref[0] == "bbox_embed.2.layers.0.weight"
    assert ref[1] == "bbox_embed.0.layers.0.weight"
