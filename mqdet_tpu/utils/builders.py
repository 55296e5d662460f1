"""Model + input builders shared by tools, bench, and the graft entry."""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mqdet_tpu.core.config import CfgNode, default_config
from mqdet_tpu.models.mq_glip import MQGLIP


def mq_glip_t_config() -> CfgNode:
    """MQ-GLIP-T (configs/pretrain/mq-glip-t.yaml semantics)."""
    cfg = default_config()
    cfg.VISION_QUERY.ENABLED = True
    cfg.MODEL.DYHEAD.NUM_CLASSES = 81
    return cfg


def mq_glip_l_config() -> CfgNode:
    """MQ-GLIP-L (configs/pretrain/mq-glip-l.yaml SWINT block)."""
    cfg = mq_glip_t_config()
    cfg.MODEL.SWINT.EMBED_DIM = 192
    cfg.MODEL.SWINT.DEPTHS = (2, 2, 18, 2)
    cfg.MODEL.SWINT.NUM_HEADS = (6, 12, 24, 48)
    cfg.MODEL.SWINT.WINDOW_SIZE = 12
    cfg.MODEL.SWINT.OUT_CHANNELS = (192, 384, 768, 1536)
    cfg.MODEL.SWINT.DROP_PATH_RATE = 0.4
    cfg.MODEL.DYHEAD.NUM_CONVS = 8
    return cfg


def mq_groundingdino_t_config() -> CfgNode:
    """MQ-GroundingDINO-T (configs/pretrain/mq-groundingdino-t.yaml)."""
    cfg = default_config()
    cfg.MODEL.META_ARCHITECTURE = "MQGroundingDINO"
    cfg.GROUNDINGDINO.enabled = True
    cfg.VISION_QUERY.ENABLED = True
    # (832, 1408) instead of the GLIP (800, 1344) bucket: GDINO's MSDA
    # Pallas kernel needs EXACT power-of-two level ratios; 800x1344 yields
    # a 25->13 ceil at stride 64 and every pair involving that level falls
    # to the per-element XLA gather composite — measured 10.5 s/protocol
    # (round-5 trace, PERF.md). 832x1408 = divisibility 128 gives
    # 104/52/26/13 x 176/88/44/22. The 9% extra padded area is masked
    # (reference pads to SIZE_DIVISIBILITY anyway; masks carry validity).
    cfg.TPU.IMAGE_BUCKETS = ((832, 1408),)
    return cfg


def tiny_test_config() -> CfgNode:
    """Miniature config for CPU tests and the multichip dry run."""
    cfg = mq_glip_t_config()
    cfg.MODEL.SWINT.EMBED_DIM = 16
    cfg.MODEL.SWINT.DEPTHS = (1, 1, 1, 1)
    cfg.MODEL.SWINT.NUM_HEADS = (1, 2, 4, 8)
    cfg.MODEL.SWINT.WINDOW_SIZE = 4
    cfg.MODEL.BACKBONE.OUT_CHANNELS = 16
    cfg.MODEL.DYHEAD.NUM_CONVS = 1
    cfg.MODEL.DYHEAD.CHANNELS = 16
    cfg.MODEL.LANGUAGE_BACKBONE.HIDDEN_LAYERS = 2
    cfg.MODEL.LANGUAGE_BACKBONE.LANG_DIM = 32
    cfg.MODEL.LANGUAGE_BACKBONE.HIDDEN_SIZE = 32
    cfg.MODEL.LANGUAGE_BACKBONE.NUM_HEADS = 2
    cfg.MODEL.LANGUAGE_BACKBONE.INTERMEDIATE_SIZE = 64
    # keep the REAL bert vocab: tests tokenize with the default (bert)
    # tokenizer, and an id beyond the embedding table NaNs the text tower
    # (~2 MB at hidden 32 — cheap insurance)
    cfg.MODEL.LANGUAGE_BACKBONE.VOCAB_SIZE = 30522
    cfg.MODEL.LANGUAGE_BACKBONE.MAX_QUERY_LEN = 16
    cfg.VISION_QUERY.START_QV_LAYER = 1
    cfg.MODEL.GROUP_NORM.NUM_GROUPS = 4
    cfg.TPU.IMAGE_BUCKETS = ((64, 64),)
    return cfg


def tiny_gdino_config() -> CfgNode:
    """Miniature MQ-GroundingDINO config for CPU tests and the dry run."""
    cfg = tiny_test_config()
    cfg.MODEL.META_ARCHITECTURE = "MQGroundingDINO"
    cfg.GROUNDINGDINO.enabled = True
    cfg.GROUNDINGDINO.hidden_dim = 16  # == MODEL.BACKBONE.OUT_CHANNELS
    cfg.GROUNDINGDINO.nheads = 2
    cfg.GROUNDINGDINO.dim_feedforward = 32
    cfg.GROUNDINGDINO.enc_layers = 1
    cfg.GROUNDINGDINO.dec_layers = 2
    cfg.GROUNDINGDINO.num_queries = 12
    # must equal MODEL.LANGUAGE_BACKBONE.MAX_QUERY_LEN (the reference pads
    # GDINO captions to max_text_len, groundingdino.py:528)
    cfg.GROUNDINGDINO.max_text_len = cfg.MODEL.LANGUAGE_BACKBONE.MAX_QUERY_LEN
    return cfg


def build_model(cfg, bank_shape=None):
    """build_detection_model twin (modeling/detector/__init__.py:1-14):
    dispatch on META_ARCHITECTURE / GROUNDINGDINO.enabled.

    bank_shape: (rows, slots, C) from QuerySelector.bank_table_shape(),
    required when VISION_QUERY.LEARNABLE_BANK."""
    if cfg.GROUNDINGDINO.enabled or cfg.MODEL.META_ARCHITECTURE == "MQGroundingDINO":
        from mqdet_tpu.models.gdino import MQGroundingDINO

        return MQGroundingDINO.from_config(cfg)
    return MQGLIP.from_config(cfg, bank_shape=bank_shape)


def install_learnable_bank(params, selector):
    """Write the bank's values into the zero-init learnable-bank param
    (the reference loads them at construction, query_selector.py:17-20)."""
    import jax.numpy as jnp

    table = selector.bank_table()
    p = params["params"]
    assert "qv_layer_learnable_bank" in p, "model built without LEARNABLE_BANK"
    old = p["qv_layer_learnable_bank"]
    p["qv_layer_learnable_bank"] = jnp.asarray(table, old.dtype)
    return params


def synthetic_batch(
    cfg,
    batch: int,
    image_hw: Tuple[int, int],
    num_labels: int = 40,
    k_shot: int = 5,
    max_gt: int = 0,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Random (but valid) inputs matching the device ABI."""
    rng = np.random.default_rng(seed)
    t = cfg.MODEL.LANGUAGE_BACKBONE.MAX_QUERY_LEN
    v = num_labels * k_shot
    c = cfg.MODEL.BACKBONE.OUT_CHANNELS
    h, w = image_hw

    input_ids = rng.integers(
        1, cfg.MODEL.LANGUAGE_BACKBONE.VOCAB_SIZE, (batch, t)
    ).astype(np.int32)
    attention_mask = np.ones((batch, t), np.int32)
    # each label occupies 2 tokens; queries of label j attend to its span
    query_mask = np.zeros((batch, v, t), np.float32)
    agg_map = np.zeros((batch, num_labels, t), np.float32)
    pos_category_map = np.zeros((batch, num_labels, t), np.float32)
    for j in range(num_labels):
        span = [min(2 * j + 1, t - 2), min(2 * j + 2, t - 2)]
        query_mask[:, j * k_shot : (j + 1) * k_shot, span] = 1
        agg_map[:, j, span] = 0.5
        pos_category_map[:, j, span] = 1

    out = {
        "images": rng.standard_normal((batch, h, w, 3)).astype(np.float32),
        "input_ids": input_ids,
        "attention_mask": attention_mask,
        "queries": rng.standard_normal((batch, v, c)).astype(np.float32),
        "query_mask": query_mask,
        "agg_map": agg_map,
        "image_sizes": np.tile(np.asarray([[h, w]], np.float32), (batch, 1)),
    }
    if max_gt:
        xy = rng.uniform(0, min(h, w) * 0.6, (batch, max_gt, 2))
        wh = rng.uniform(16, min(h, w) * 0.4, (batch, max_gt, 2))
        out["gt_boxes"] = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        out["gt_labels"] = rng.integers(1, num_labels + 1, (batch, max_gt)).astype(np.int32)
        out["gt_valid"] = np.ones((batch, max_gt), bool)
        gt_token_map = np.zeros((batch, max_gt, t), np.float32)
        for b in range(batch):
            for g in range(max_gt):
                j = out["gt_labels"][b, g] - 1
                gt_token_map[b, g] = agg_map[b, j]
        out["gt_token_map"] = gt_token_map
        out["pos_category_map"] = pos_category_map
        out["has_query"] = np.ones((batch, num_labels), np.int32)
    return out


def init_params_fast(model, *args, seed: int = 0, scale: float = 0.02):
    """Random parameters WITHOUT compiling the init program.

    `flax.Module.init` traces + compiles the full forward — minutes for
    MQ-GLIP-T through the remote-compile tunnel. For benchmarking and
    compile checks we only need correctly-shaped parameters: eval_shape
    gives the tree abstractly, then leaves are filled host-side (normals for
    kernels, ones for norm scales, zeros for biases).
    """
    import jax

    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(seed), *args)
    rng = np.random.default_rng(seed)

    def fill(path, s):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if (
            name.endswith("scale")
            or name.endswith("/gamma_v")
            or name.endswith("/gamma_l")
            or name.endswith("var")  # batch_stats variance must be positive
        ):
            return jnp.ones(s.shape, s.dtype)
        if name.endswith("bias") or name.endswith("mean"):
            return jnp.zeros(s.shape, s.dtype)
        if s.dtype in (np.int32, np.int64):
            return jnp.zeros(s.shape, s.dtype)
        return jnp.asarray(
            rng.standard_normal(s.shape).astype(np.float32) * scale, dtype=s.dtype
        )

    return jax.tree_util.tree_map_with_path(fill, shapes)
