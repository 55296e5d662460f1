"""Multi-device correctness: the 8-CPU-device mesh (conftest.py) must produce
the same numerics as a single device — the property the reference relies on
DDP for (tools/train_net.py:148-155, utils/comm.py:61-102) but never tests.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


class _FakeDataset:
    """Minimal dataset surface for GroundingTrainLoader."""

    def __init__(self, n=13):
        self.ids = list(range(n))
        self.ind_to_class = {1: "cat", 2: "dog"}

    def load_image(self, i):
        rng = np.random.default_rng(i)
        return (rng.uniform(0, 255, (40, 52, 3))).astype(np.uint8)

    def annotations(self, i):
        return (
            np.array([[4.0, 4.0, 20.0, 22.0]], np.float32),
            np.array([1 + i % 2], np.int64),
        )


def _make_loader(num_hosts, host_id, n=13, batch_size=2):
    from mqdet_tpu.data.loader import GroundingTrainLoader
    from mqdet_tpu.data.tokenizer import get_tokenizer
    from mqdet_tpu.utils.builders import tiny_test_config

    cfg = tiny_test_config()
    cfg.SOLVER.IMS_PER_BATCH = batch_size
    cfg.INPUT.MIN_SIZE_TRAIN = 48
    cfg.INPUT.MAX_SIZE_TRAIN = 64
    return GroundingTrainLoader(
        _FakeDataset(n), cfg, get_tokenizer(), seed=3,
        num_hosts=num_hosts, host_id=host_id,
    )


def test_loader_host_shards_partition_epoch():
    """DistributedSampler semantics (data/samplers/distributed.py:12-72):
    host shards are equally sized, disjoint modulo the wraparound padding,
    and their union covers every id."""
    shards = []
    for h in range(4):
        loader = _make_loader(4, h)
        ids = __import__("mqdet_tpu.data.samplers", fromlist=["x"]).distributed_shard(
            loader.epoch_ids, 4, h, shuffle=True, seed=3, epoch=0
        )
        shards.append(ids)
    sizes = {len(s) for s in shards}
    assert len(sizes) == 1
    union = set().union(*map(set, shards))
    assert union == set(range(13))
    # identical permutation on every host: re-running host 2 gives same shard
    again = __import__("mqdet_tpu.data.samplers", fromlist=["x"]).distributed_shard(
        _make_loader(4, 2).epoch_ids, 4, 2, shuffle=True, seed=3, epoch=0
    )
    assert again == shards[2]


def test_loader_iterates_only_its_shard():
    loader = _make_loader(2, 1, n=8, batch_size=2)
    batches = list(loader)
    assert len(batches) == 2  # 4-id shard / batch 2
    # epoch advances -> next iteration uses a different permutation
    b2 = list(loader)
    assert len(b2) == 2


def _build_tiny_train():
    from mqdet_tpu.core.config import trainable_patterns
    from mqdet_tpu.engine.train import init_train_state, make_train_step
    from mqdet_tpu.ops.anchors import anchors_for_fpn
    from mqdet_tpu.utils.builders import build_model, synthetic_batch, tiny_test_config

    cfg = tiny_test_config()
    cfg.SOLVER.TUNING_HIGHLEVEL_OVERRIDE = "vision_query"
    cfg.SOLVER.MAX_ITER = 10
    image_hw = cfg.TPU.IMAGE_BUCKETS[0]
    model = build_model(cfg)
    batch_np = synthetic_batch(
        cfg, batch=8, image_hw=image_hw, num_labels=4, k_shot=2, max_gt=3
    )
    init_args = tuple(
        jnp.asarray(batch_np[k][:1])
        for k in ["images", "input_ids", "attention_mask", "queries", "query_mask"]
    )
    params = model.init(jax.random.PRNGKey(0), *init_args)
    state, tx, merge = init_train_state(params, cfg, trainable_patterns(cfg))

    anchors_l = anchors_for_fpn(
        image_hw,
        strides=tuple(cfg.MODEL.RPN.ANCHOR_STRIDE),
        sizes=tuple(cfg.MODEL.RPN.ANCHOR_SIZES),
        aspect_ratios=tuple(cfg.MODEL.RPN.ASPECT_RATIOS),
    )
    anchors = np.concatenate(anchors_l)
    level_sizes = tuple(a.shape[0] for a in anchors_l)

    def apply_fn(p, *a, **kw):
        return model.apply(p, *a, **kw)

    train_step = make_train_step(
        apply_fn, merge, tx, jnp.asarray(anchors), level_sizes, cfg
    )
    keys = [
        "images", "input_ids", "attention_mask", "queries", "query_mask",
        "gt_boxes", "gt_labels", "gt_valid", "gt_token_map",
        "pos_category_map", "has_query",
    ]
    batch = {k: jnp.asarray(batch_np[k]) for k in keys}
    return train_step, state, batch, keys


@pytest.mark.slow
def test_pjit_train_step_matches_single_device():
    """Two pjit train steps on the 8-device data mesh == two jit steps on one
    device (same batch): identical params and loss. This is the multi-chip
    evidence the dryrun alone doesn't give — the collective math is exercised
    and compared, not just compiled."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mqdet_tpu.parallel.mesh import make_mesh

    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    train_step, state0, batch, keys = _build_tiny_train()
    rng = jax.random.PRNGKey(7)

    # single device reference
    step1 = jax.jit(train_step)
    s_a, m_a = step1(state0, batch, rng)
    s_a, m_a = step1(s_a, batch, rng)

    # 8-device data mesh
    mesh = make_mesh((-1,), ("data",), jax.devices()[:8])
    data_s = NamedSharding(mesh, P("data"))
    rep_s = NamedSharding(mesh, P())
    step8 = jax.jit(
        train_step,
        in_shardings=(rep_s, {k: data_s for k in keys}, rep_s),
        out_shardings=(rep_s, rep_s),
    )
    sharded = {k: jax.device_put(v, data_s) for k, v in batch.items()}
    s_b, m_b = step8(jax.device_put(state0, rep_s), sharded, jax.device_put(rng, rep_s))
    s_b, m_b = step8(s_b, sharded, jax.device_put(rng, rep_s))

    np.testing.assert_allclose(
        float(m_a["loss_total"]), float(m_b["loss_total"]), rtol=1e-5
    )
    flat_a = jax.tree_util.tree_leaves(s_a.trainable)
    flat_b = jax.tree_util.tree_leaves(s_b.trainable)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6,
            err_msg="8-device pjit step diverged from single-device step",
        )


@pytest.mark.slow
def test_sharded_eval_batch_matches_single_device():
    """Chunk-parallel eval (TEST.CHUNK_PARALLELISM) sharded over the mesh ==
    the same batched head on one device (reference counterpart: per-rank eval
    + pickle all_gather, engine/inference.py:293-312)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mqdet_tpu.engine.predict import make_predict_fn
    from mqdet_tpu.parallel.mesh import make_mesh
    from mqdet_tpu.utils.builders import build_model, synthetic_batch, tiny_test_config

    cfg = tiny_test_config()
    image_hw = cfg.TPU.IMAGE_BUCKETS[0]
    model = build_model(cfg)
    b = synthetic_batch(cfg, batch=8, image_hw=image_hw, num_labels=4, k_shot=2)
    args = tuple(
        jnp.asarray(b[k])
        for k in ["images", "input_ids", "attention_mask", "queries", "query_mask"]
    )
    params = model.init(jax.random.PRNGKey(0), *tuple(a[:1] for a in args))
    agg = jnp.asarray(b["agg_map"])
    sizes = jnp.asarray(b["image_sizes"])

    predict = make_predict_fn(model.apply, image_hw, cfg)
    det_1 = predict(params, *args, agg, sizes)

    mesh = make_mesh((-1,), ("data",), jax.devices()[:8])
    data_s = NamedSharding(mesh, P("data"))
    rep_s = NamedSharding(mesh, P())
    sharded_args = tuple(jax.device_put(a, data_s) for a in args)
    det_8 = predict(
        jax.device_put(params, rep_s), *sharded_args,
        jax.device_put(agg, data_s), jax.device_put(sizes, data_s),
    )
    for field in ("boxes", "scores", "labels", "valid"):
        np.testing.assert_allclose(
            np.asarray(getattr(det_1, field)),
            np.asarray(getattr(det_8, field)),
            atol=1e-5,
            err_msg=f"sharded eval diverged on {field}",
        )
