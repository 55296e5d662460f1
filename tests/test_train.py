"""Training-path tests: ATSS matching, losses, optimizer groups, train step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mqdet_tpu.core.config import trainable_patterns
from mqdet_tpu.engine import losses as L
from mqdet_tpu.engine import optim as O
from mqdet_tpu.engine.train import apply_text_dropout, init_train_state, make_train_step
from mqdet_tpu.ops.anchors import anchors_for_fpn
from mqdet_tpu.utils.builders import build_model, synthetic_batch, tiny_test_config


def test_atss_match_assigns_obvious_anchor():
    # one gt exactly equal to one anchor -> that anchor must be positive
    anchors = np.array(
        [[0, 0, 63, 63], [100, 100, 163, 163], [300, 300, 363, 363], [40, 40, 103, 103]],
        np.float32,
    )
    gt = np.array([[100, 100, 163, 163]], np.float32)
    tgt = L.atss_match(
        jnp.asarray(anchors), (4,), jnp.asarray(gt), jnp.asarray([5]),
        jnp.asarray([True]), jnp.ones((1, 8)) / 8.0, topk=4,
    )
    labels = np.asarray(tgt.cls_labels)
    assert labels[1] == 5
    assert labels[0] == 0 and labels[2] == 0


def test_atss_match_ignores_invalid_gt():
    anchors = np.array(
        [[0, 0, 63, 63], [100, 100, 163, 163], [300, 300, 363, 363]], np.float32
    )
    gt = np.array([[0, 0, 63, 63], [100, 100, 163, 163]], np.float32)
    tgt = L.atss_match(
        jnp.asarray(anchors), (3,), jnp.asarray(gt), jnp.asarray([3, 7]),
        jnp.asarray([True, False]), jnp.ones((2, 8)) / 8.0, topk=3,
    )
    labels = np.asarray(tgt.cls_labels)
    assert labels[0] == 3
    assert labels[1] == 0  # its gt is invalid -> no assignment
    assert labels[2] == 0


def test_centerness_targets_center_is_one():
    anchors = jnp.asarray([[0.0, 0.0, 64.0, 64.0]])
    reg = jnp.zeros((1, 4))  # target == anchor -> centered
    ctr = np.asarray(L.centerness_targets(reg, anchors))
    np.testing.assert_allclose(ctr, 1.0, atol=1e-5)


def test_gate_loss_from_params():
    params = {
        "a": {"ff_gate": jnp.asarray(0.5)},
        "b": {"attn_gate": jnp.asarray(0.0)},
        "c": {"kernel": jnp.ones((2, 2))},
    }
    loss = L.gate_loss_from_params(params, scale=2.0, regularize=True)
    np.testing.assert_allclose(float(loss), 2.0 * ((1 - 0.5) + 1.0) / 2)


def test_mlm_loss_ignore_index():
    logits = jnp.zeros((2, 3, 5))
    labels = jnp.asarray([[1, -100, 2], [-100, -100, -100]])
    loss = L.mlm_loss(logits, labels)
    np.testing.assert_allclose(float(loss), np.log(5.0), rtol=1e-5)


def test_lr_groups():
    cfg = tiny_test_config()
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.LANG_LR = 1e-5
    cfg.SOLVER.GATE_LR = 5e-3
    cfg.SOLVER.QUERY_LR = 1e-6
    assert O.lr_group_for("params/rpn/cls_logits/kernel", cfg) == 1e-4
    assert O.lr_group_for("params/language_backbone/bert/layer_0/kernel", cfg) == 1e-5
    # reference quirk (solver/build.py:49-52): the qv_layer rule runs AFTER
    # the gate rule, so gates inside qv_layer modules get QUERY_LR
    assert O.lr_group_for("params/language_backbone/bert/qv_layer_0/ff_gate", cfg) == 1e-6
    assert O.lr_group_for("params/language_backbone/bert/qv_layer_0/attn/to_q/kernel", cfg) == 1e-6
    # a gate OUTSIDE qv_layer/pre_select would get GATE_LR
    assert O.lr_group_for("params/some_module/attn_gate/linear2/kernel", cfg) == 5e-3
    assert O.lr_group_for("params/rpn/cls_logits/bias", cfg) == 2e-4


def test_warmup_multistep_schedule():
    cfg = tiny_test_config()
    cfg.SOLVER.MAX_ITER = 1000
    cfg.SOLVER.WARMUP_ITERS = 100
    cfg.SOLVER.WARMUP_FACTOR = 0.1
    cfg.SOLVER.STEPS = (0.5, 0.9)
    f = O.warmup_multistep_schedule(cfg)
    np.testing.assert_allclose(float(f(0)), 0.1)
    np.testing.assert_allclose(float(f(100)), 1.0)
    np.testing.assert_allclose(float(f(499)), 1.0)
    np.testing.assert_allclose(float(f(501)), 0.1)
    np.testing.assert_allclose(float(f(901)), 0.01)


def test_partition_params_and_merge():
    cfg = tiny_test_config()
    params = {"params": {"rpn": {"kernel": jnp.ones(3)},
                         "language_backbone": {"qv_layer_0": {"w": jnp.zeros(2)}}}}
    tr, fz, merge = O.partition_params(params, ["qv_layer", "pre_select"])
    assert len(tr) == 1 and "qv_layer_0" in list(tr)[0]
    merged = merge(tr, fz)
    assert jax.tree.structure(merged) == jax.tree.structure(params)


def test_text_dropout_masks_spans():
    ids = jnp.asarray([[5, 6, 7, 8]])
    pos_map = jnp.asarray([[[0, 1, 1, 0]]], jnp.float32)  # one label, tokens 1-2
    has_q = jnp.asarray([[1]])
    out = apply_text_dropout(jax.random.PRNGKey(0), ids, pos_map, has_q, 1.0)
    out = np.asarray(out)
    assert out[0, 1] == 103 and out[0, 2] == 103
    assert out[0, 0] == 5 and out[0, 3] == 8
    # dropout 0 -> unchanged
    out2 = apply_text_dropout(jax.random.PRNGKey(0), ids, pos_map, has_q, 0.0)
    assert (np.asarray(out2) == np.asarray(ids)).all()


@pytest.mark.slow
def test_train_step_updates_only_trainable():
    cfg = tiny_test_config()
    cfg.SOLVER.TUNING_HIGHLEVEL_OVERRIDE = "vision_query"
    cfg.SOLVER.MAX_ITER = 10
    cfg.VISION_QUERY.TEXT_DROPOUT = 0.4
    hw = cfg.TPU.IMAGE_BUCKETS[0]
    model = build_model(cfg)
    b = synthetic_batch(cfg, batch=2, image_hw=hw, num_labels=4, k_shot=2, max_gt=3)
    init_args = tuple(
        jnp.asarray(b[k][:1])
        for k in ["images", "input_ids", "attention_mask", "queries", "query_mask"]
    )
    params = model.init(jax.random.PRNGKey(0), *init_args)
    state, tx, merge = init_train_state(params, cfg, trainable_patterns(cfg))
    assert len(state.trainable) > 0 and len(state.frozen) > 0

    anchors_l = anchors_for_fpn(hw)
    anchors = jnp.asarray(np.concatenate(anchors_l))
    level_sizes = tuple(a.shape[0] for a in anchors_l)

    def apply_fn(p, *a, **kw):
        return model.apply(p, *a, **kw)

    step = make_train_step(apply_fn, merge, tx, anchors, level_sizes, cfg)
    batch = {k: jnp.asarray(v) for k, v in b.items() if k not in ("agg_map", "image_sizes")}
    new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))

    assert np.isfinite(float(metrics["loss_total"]))
    # frozen unchanged, at least one trainable param changed
    for k in state.frozen:
        np.testing.assert_array_equal(
            np.asarray(state.frozen[k]), np.asarray(new_state.frozen[k])
        )
    changed = any(
        not np.array_equal(np.asarray(state.trainable[k]), np.asarray(new_state.trainable[k]))
        for k in state.trainable
    )
    assert changed


def test_profiling_helpers(tmp_path):
    """StepTimer statistics + trace/annotate degrade gracefully."""
    import jax.numpy as jnp

    from mqdet_tpu.utils.profiling import StepTimer, annotate, trace

    timer = StepTimer(warmup=1)
    x = jnp.ones((4,))
    for _ in range(4):
        timer.tick(x * 2)
    s = timer.summary()
    assert s["steps"] == 2 and s["mean_s"] > 0 and s["rate"] > 0

    with trace(str(tmp_path / "prof")):
        with annotate("region"):
            (x + 1).block_until_ready()


@pytest.mark.slow
def test_remat_gradients_match():
    """TPU.REMAT (reference gradient checkpointing, vldyhead.py:374-377,
    modeling_bert_new.py:577-598): same forward and same gradients, less
    live-activation memory."""
    import jax
    import jax.numpy as jnp

    from mqdet_tpu.utils.builders import (
        build_model,
        synthetic_batch,
        tiny_test_config,
    )

    cfg = tiny_test_config()
    batch = synthetic_batch(
        cfg, batch=1, image_hw=tuple(cfg.TPU.IMAGE_BUCKETS[0]),
        num_labels=4, k_shot=2,
    )
    args = tuple(
        jnp.asarray(batch[k])
        for k in ("images", "input_ids", "attention_mask", "queries", "query_mask")
    )

    cfg.TPU.REMAT = False
    m0 = build_model(cfg)
    p0 = m0.init(jax.random.PRNGKey(0), *args)
    cfg.TPU.REMAT = True
    m1 = build_model(cfg)
    p1 = m1.init(jax.random.PRNGKey(0), *args)
    # identical param trees (remat is a lifted transform, not a structure change)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)

    def loss(m):
        def f(p):
            out = m.apply(p, *args, deterministic=True)
            return sum(
                jnp.sum(jnp.abs(x.astype(jnp.float32)))
                for x in out["dot_product_logits"]
            )
        return f

    l0, g0 = jax.value_and_grad(loss(m0))(p0)
    l1, g1 = jax.value_and_grad(loss(m1))(p1)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-3, atol=2e-5,
        )
