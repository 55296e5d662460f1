"""Round-trip test of the GLIP checkpoint importer on the tiny model."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mqdet_tpu.io import torch_import as TI
from mqdet_tpu.utils.builders import build_model, synthetic_batch, tiny_test_config


def _inverse(name: str, val: np.ndarray) -> np.ndarray:
    """Map a flax leaf back to torch layout to fabricate a reference ckpt."""
    if name.endswith("/kernel") and val.ndim == 4:
        return np.transpose(val, (3, 2, 0, 1))  # HWIO -> OIHW
    if name.endswith("/kernel") and val.ndim == 2:
        return np.transpose(val, (1, 0))
    return val


def test_import_round_trip():
    cfg = tiny_test_config()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.DYHEAD.FUSE_CONFIG.MLM_LOSS = True  # cover mlm_head rules too
    model = build_model(cfg)
    b = synthetic_batch(cfg, 1, (64, 64), num_labels=2, k_shot=2)
    args = tuple(
        jnp.asarray(b[k])
        for k in ["images", "input_ids", "attention_mask", "queries", "query_mask"]
    )
    params = model.init(jax.random.PRNGKey(0), *args)

    rules = TI.build_rule_table()
    rng = np.random.default_rng(0)
    state = {}
    covered = []
    not_covered = []

    def visit(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        name = name.replace("params/", "", 1)
        rule = rules.get(name)
        if rule is None:
            not_covered.append(name)
            return leaf
        ref_key, _ = rule
        fake = rng.standard_normal(leaf.shape).astype(np.float32)
        state["module." + ref_key] = _inverse(name, fake)
        covered.append((name, ref_key, fake))
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)

    # Everything except non-reference params (pallas/dcn internals etc.)
    # should be covered by the rule table.
    allowed_missing = [n for n in not_covered]
    assert not allowed_missing, f"params without import rule: {allowed_missing[:20]}"

    new_params, report = TI.import_glip_checkpoint(params, state)
    assert not report["missing"], report["missing"][:10]
    assert not report["unused"], report["unused"][:10]

    flat = {
        "/".join(str(getattr(k, "key", k)) for k in p).replace("params/", "", 1): v
        for p, v in jax.tree_util.tree_leaves_with_path(new_params)
    }
    for name, ref_key, fake in covered:
        np.testing.assert_allclose(
            flat[name], fake, rtol=1e-6,
            err_msg=f"{name} <- {ref_key} not round-tripped",
        )


def test_strip_prefixes_prefers_ema():
    state = {
        "module.backbone.x": np.ones(2),
        "model_ema.backbone.x": np.zeros(2),
    }
    out = TI.strip_prefixes(state)
    np.testing.assert_array_equal(out["backbone.x"], np.zeros(2))
