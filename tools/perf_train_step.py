"""Measure the modulated pre-training step on one real chip.

Reference budget: MQ-GLIP-T pre-training runs bs 16 over 8 GPUs = 2
images/GPU at 800x1333 with AMP fp16 (configs/pretrain/mq-glip-t.yaml
SOLVER block, README "Modulated Training"). This measures our jit'd train
step (frozen base + GCP, ATSS + MLM + gate losses, AdamW with per-group
LRs) at the same per-chip batch on the v5e, single chip.

Usage: python -m tools.perf_train_step [BATCHES...]   (default 2 4)
Prints one JSON line per batch size.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

from mqdet_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mqdet_tpu.core.config import trainable_patterns
    from mqdet_tpu.engine.train import init_train_state, make_train_step
    from mqdet_tpu.ops.anchors import anchors_for_fpn
    from mqdet_tpu.utils.builders import (
        build_model, init_params_fast, mq_glip_t_config, synthetic_batch,
    )

    batches = [int(a) for a in sys.argv[1:]] or [2, 4]
    image_hw = (800, 1344)

    cfg = mq_glip_t_config()
    # activation recomputation per tower stage: without it the backward's
    # live set (DCN-window im2col VJP buffers x 6 stages) exceeds v5e HBM
    # at batch 2 (measured RESOURCE_EXHAUSTED, round 5) — the reference
    # trains with gradient checkpointing on too (USE_CHECKPOINT).
    cfg.TPU.REMAT = bool(int(os.environ.get("MQDET_TRAIN_REMAT", "1")))
    model = build_model(cfg)

    for bs in batches:
        batch_np = synthetic_batch(
            cfg, batch=bs, image_hw=image_hw, num_labels=40, k_shot=5,
            max_gt=30,
        )
        keys = [
            "images", "input_ids", "attention_mask", "queries", "query_mask",
            "gt_boxes", "gt_labels", "gt_valid", "gt_token_map",
            "pos_category_map", "has_query",
        ]
        batch = {k: jnp.asarray(batch_np[k]) for k in keys}
        init_args = tuple(batch[k][:1] for k in keys[:5])
        params = init_params_fast(model, *init_args)
        state, tx, merge = init_train_state(params, cfg, trainable_patterns(cfg))

        anchors = np.concatenate(
            anchors_for_fpn(
                image_hw,
                strides=tuple(cfg.MODEL.RPN.ANCHOR_STRIDE),
                sizes=tuple(cfg.MODEL.RPN.ANCHOR_SIZES),
                aspect_ratios=tuple(cfg.MODEL.RPN.ASPECT_RATIOS),
            )
        )
        level_sizes = tuple(
            a.shape[0]
            for a in anchors_for_fpn(
                image_hw,
                strides=tuple(cfg.MODEL.RPN.ANCHOR_STRIDE),
                sizes=tuple(cfg.MODEL.RPN.ANCHOR_SIZES),
                aspect_ratios=tuple(cfg.MODEL.RPN.ASPECT_RATIOS),
            )
        )

        def apply_fn(p, images, input_ids, attention_mask, queries,
                     query_mask, **kw):
            return model.apply(p, images, input_ids, attention_mask,
                               queries, query_mask, **kw)

        # same jit discipline as the production trainer (engine/trainer.py:71):
        # donating the state lets XLA alias old->new params/opt (3.3 GB) —
        # without it (or unjitted, as this tool originally ran) the step
        # holds two states + temps and RESOURCE_EXHAUSTs the 16 GB chip.
        train_step = jax.jit(
            make_train_step(
                apply_fn, merge, tx, jnp.asarray(anchors), level_sizes, cfg
            ),
            donate_argnums=(0,),
        )
        rng = jax.random.PRNGKey(7)

        def sync(out):
            st, metrics = out
            return float(metrics["loss_total"])

        try:
            st, m = train_step(state, batch, rng)
            sync((st, m))
        except Exception as e:  # OOM at this bs: report and continue
            import traceback
            traceback.print_exc()
            print(json.dumps({"batch": bs,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
            continue
        # timed: feed the updated state back so the step is the real loop op
        for _ in range(2):
            st, m = train_step(st, batch, rng)
            sync((st, m))
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            st, m = train_step(st, batch, rng)
            sync((st, m))
            ts.append(time.perf_counter() - t0)
        p50 = statistics.median(ts) * 1000.0
        print(json.dumps({
            "batch": bs,
            "remat": bool(cfg.TPU.REMAT),
            "step_p50_ms": round(p50, 1),
            "train_img_per_sec_chip": round(bs * 1000.0 / p50, 3),
            "loss": round(float(m["loss_total"]), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
