#!/usr/bin/env python
"""Quick head-only timing at the LVIS operating point (CP=4, 800x1344).

Prints backbone/head medians with bench.py's fencing. For A/B-ing tower
changes without a full bench run.
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
from mqdet_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from mqdet_tpu.engine.predict import make_split_predict_fns
from mqdet_tpu.utils.builders import (
    build_model, init_params_fast, mq_glip_t_config, synthetic_batch,
)


def main():
    cfg = mq_glip_t_config()
    cfg.MODEL.ATSS.DETECTIONS_PER_IMG = 300
    image_hw = (800, 1344)
    model = build_model(cfg)
    batch = synthetic_batch(cfg, batch=4, image_hw=image_hw, num_labels=40, k_shot=5)
    args = tuple(jnp.asarray(batch[k]) for k in
                 ("images", "input_ids", "attention_mask", "queries", "query_mask"))
    params = init_params_fast(model, *args)
    agg_map = jnp.asarray(batch["agg_map"])
    sizes = jnp.asarray(batch["image_sizes"])
    encode_fn, head_fn = make_split_predict_fns(model, image_hw, cfg)
    feats = encode_fn(params, args[0][:1])

    def sync(out):
        return float(jnp.sum(out.scores))

    for _ in range(3):
        sync(head_fn(params, feats, args[1], args[2], args[3], args[4], agg_map, sizes))
    ts = []
    for _ in range(12):
        t0 = time.perf_counter()
        sync(head_fn(params, feats, args[1], args[2], args[3], args[4], agg_map, sizes))
        ts.append(time.perf_counter() - t0)
    print(f"head_ms_per_group p50={statistics.median(ts)*1000:.2f} "
          f"min={min(ts)*1000:.2f}")


if __name__ == "__main__":
    main()
