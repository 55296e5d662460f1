"""MLM path wiring: FUSE_CONFIG.MLM_LOSS puts a vocab head on the fused text
embedding (reference vldyhead.py:760-765,790-792) and adds loss_mlm with
random_word masking to the train step (generalized_vl_rcnn_new.py:384-395,
vldyhead.py:977-978)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mqdet_tpu.core.config import trainable_patterns
from mqdet_tpu.engine.train import init_train_state, make_train_step
from mqdet_tpu.ops.anchors import anchors_for_fpn
from mqdet_tpu.utils.builders import (
    build_model,
    init_params_fast,
    synthetic_batch,
    tiny_test_config,
)


def _mlm_cfg():
    cfg = tiny_test_config()
    cfg.MODEL.DYHEAD.FUSE_CONFIG.MLM_LOSS = True
    cfg.MODEL.DYHEAD.FUSE_CONFIG.MLM_LOSS_COEF = 0.5
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_random_word_mask_reference_semantics():
    """Pin generalized_vl_rcnn_new.py:53-87 semantics: mask = non-pad AND
    prob<0.15 AND greenlight!=-1 (greenlight==0 tokens ARE corrupted);
    label = masked AND greenlight==1."""
    from mqdet_tpu.engine.train import random_word_mask

    rng = jax.random.PRNGKey(0)
    t = 4096
    ids = jnp.full((1, t), 2000, jnp.int32)
    # thirds: greenlight 1 / 0 / -1; plus a pad tail
    gl = np.zeros((1, t), np.int32)
    gl[0, : t // 3] = 1
    gl[0, 2 * t // 3 :] = -1
    ids = ids.at[0, -64:].set(0)  # pad tokens
    gl[0, -64:] = 1
    new_ids, labels = random_word_mask(rng, ids, jnp.asarray(gl), 30522)
    new_ids, labels = np.asarray(new_ids), np.asarray(labels)
    changed = new_ids != np.asarray(ids)
    # greenlight==0 region IS corrupted in the input (~15% * 90%)
    assert changed[0, t // 3 : 2 * t // 3].mean() > 0.05
    # but carries no labels
    assert (labels[0, t // 3 : 2 * t // 3] == -100).all()
    # greenlight==-1 region is never masked, never labeled
    assert not changed[0, 2 * t // 3 : -64].any()
    assert (labels[0, 2 * t // 3 : -64] == -100).all()
    # pad tokens never masked even with greenlight 1
    assert not changed[0, -64:].any()
    # greenlight==1 region: labels exactly at picked positions, original ids
    lab_region = labels[0, : t // 3]
    assert (lab_region[lab_region != -100] == 2000).all()
    assert (lab_region != -100).sum() > 0


def test_forward_emits_mlm_logits():
    cfg = _mlm_cfg()
    model = build_model(cfg)
    hw = tuple(cfg.TPU.IMAGE_BUCKETS[0])
    b = synthetic_batch(cfg, 1, hw, num_labels=3, k_shot=2)
    args = tuple(
        jnp.asarray(b[k])
        for k in ["images", "input_ids", "attention_mask", "queries",
                  "query_mask"]
    )
    params = init_params_fast(model, *args)
    out = model.apply(params, *args)
    t = cfg.MODEL.LANGUAGE_BACKBONE.MAX_QUERY_LEN
    v = cfg.MODEL.LANGUAGE_BACKBONE.VOCAB_SIZE
    assert out["mlm_logits"].shape == (1, t, v)
    assert np.isfinite(np.asarray(out["mlm_logits"])).all()
    # the head must exist as a parameter subtree (importable from torch ckpts)
    assert "mlm_head" in params["params"]["rpn"]


@pytest.mark.slow
def test_train_step_carries_mlm_loss():
    cfg = _mlm_cfg()
    cfg.SOLVER.TUNING_HIGHLEVEL_OVERRIDE = "full"
    hw = cfg.TPU.IMAGE_BUCKETS[0]
    model = build_model(cfg)
    b = synthetic_batch(cfg, batch=1, image_hw=hw, num_labels=3, k_shot=2,
                        max_gt=2)
    init_args = tuple(
        jnp.asarray(b[k])
        for k in ["images", "input_ids", "attention_mask", "queries",
                  "query_mask"]
    )
    params = init_params_fast(model, *init_args)
    state, tx, merge = init_train_state(params, cfg, trainable_patterns(cfg))

    anchors_l = anchors_for_fpn(hw)
    anchors = jnp.asarray(np.concatenate(anchors_l))
    level_sizes = tuple(a.shape[0] for a in anchors_l)
    step = make_train_step(model.apply, merge, tx, anchors, level_sizes, cfg)
    batch = {k: jnp.asarray(v) for k, v in b.items()
             if k not in ("agg_map", "image_sizes")}
    new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))

    assert "loss_mlm" in metrics
    assert np.isfinite(float(metrics["loss_mlm"]))
    assert float(metrics["loss_mlm"]) > 0.0
    # mlm head received gradient
    mlm_keys = [k for k in state.trainable if "mlm_head" in k]
    assert mlm_keys
    assert any(
        not np.array_equal(np.asarray(state.trainable[k]),
                           np.asarray(new_state.trainable[k]))
        for k in mlm_keys
    )
