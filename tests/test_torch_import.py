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


def test_released_checkpoint_layout_fixture(tmp_path):
    """End-to-end import of a .pth mimicking the RELEASED artifact layout
    (reference utils/checkpoint.py:190-205 DetectronCheckpointer.save +
    trainer.py:214): a dict with "model" (module.-prefixed, stale weights),
    a top-level SIBLING "model_ema" (the weights eval actually uses,
    utils/ema.py:23-31), plus optimizer/scheduler/iteration entries. The
    importer must resolve it identically to importing the plain EMA state
    dict directly."""
    import torch

    rules = TI.build_rule_table()
    # a representative subset of real reference keys from the rule table
    some = [ref for (ref, _tf) in list(rules.values())[:12]]
    rng = np.random.default_rng(1)
    ema, stale = {}, {}
    for k in some:
        ema[k] = torch.from_numpy(rng.standard_normal(4).astype(np.float32))
        stale["module." + k] = torch.from_numpy(
            np.full(4, 7.0, np.float32)
        )
    ckpt = {
        "model": stale,
        "model_ema": {"module." + k: v for k, v in ema.items()},
        "optimizer": {"state": {}, "param_groups": []},
        "scheduler": {"last_epoch": 3},
        "iteration": 90000,
    }
    path = tmp_path / "released_layout.pth"
    torch.save(ckpt, path)

    loaded = TI.strip_prefixes(TI.load_torch_state_dict(str(path)))
    want = {k: v.numpy() for k, v in ema.items()}
    assert set(loaded) == set(want)
    for k in want:
        np.testing.assert_array_equal(loaded[k], want[k])

    # without model_ema, the model entry (module.-stripped) must be used
    ckpt2 = {"model": stale, "iteration": 1}
    path2 = tmp_path / "plain_layout.pth"
    torch.save(ckpt2, path2)
    loaded2 = TI.strip_prefixes(TI.load_torch_state_dict(str(path2)))
    assert set(loaded2) == set(want)
    for k in want:
        np.testing.assert_array_equal(loaded2[k], np.full(4, 7.0, np.float32))
