"""On-chip A/B of the VLFuse flash bi-attention formulations.

Axes (read from env at trace time, so one process per combo):
  MQDET_FLASH_LEVELS = stream | concat   (per-level carried-state kernels
                                          vs one kernel over the flattened
                                          pyramid; reference concatenates,
                                          maskrcnn_benchmark/modeling/rpn/
                                          vldyhead.py:420-470)
  MQDET_FLASH_SCORES = single | dual     (one shared (N,T) score matmul
                                          serving both softmax directions
                                          vs recomputing s^T per direction)

Prints one JSON line with the p50 batch-1 protocol latency for the combo
given on argv, so a driver shell loop can sweep combos.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    levels, scores = sys.argv[1], sys.argv[2]
    if levels == "stream" and scores == "dual":
        # The carried-state stream kernels only implement the single-score
        # formulation; this combo would silently measure (stream, single).
        print(json.dumps({
            "levels": levels, "scores": scores,
            "skipped": "stream path has no dual-score variant; "
                       "identical to (stream, single)",
        }))
        return
    os.environ["MQDET_FLASH_LEVELS"] = levels
    os.environ["MQDET_FLASH_SCORES"] = scores
    from mqdet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from mqdet_tpu.engine.predict import make_protocol_fn
    from mqdet_tpu.utils.builders import (
        build_model,
        init_params_fast,
        mq_glip_t_config,
        synthetic_batch,
    )

    cfg = mq_glip_t_config()
    cfg.MODEL.ATSS.DETECTIONS_PER_IMG = 300
    image_hw = (800, 1344)
    chunk_batch = 4
    n_groups = -(-31 // chunk_batch)

    model = build_model(cfg)
    batch = synthetic_batch(
        cfg, batch=chunk_batch, image_hw=image_hw, num_labels=40, k_shot=5
    )
    args = tuple(
        jnp.asarray(batch[k])
        for k in ("images", "input_ids", "attention_mask", "queries",
                  "query_mask")
    )
    params = init_params_fast(model, *args)
    agg_map = jnp.asarray(batch["agg_map"])
    sizes = jnp.asarray(batch["image_sizes"])
    one_image = args[0][:1]

    def grp(x):
        return jnp.broadcast_to(x[None], (n_groups,) + x.shape)

    g_text = tuple(grp(a) for a in args[1:]) + (grp(agg_map),)
    g_sizes = grp(sizes)
    protocol_fn = make_protocol_fn(model, image_hw, cfg)

    def run():
        out = protocol_fn(params, one_image, *g_text, g_sizes)
        return float(jnp.sum(out.scores))

    for _ in range(2):
        run()
    ts = []
    for _ in range(int(os.environ.get("AB_ITERS", "12"))):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    print(json.dumps({
        "levels": levels, "scores": scores,
        "p50_ms": round(statistics.median(ts) * 1000.0, 2),
        "min_ms": round(min(ts) * 1000.0, 2),
        "iters": len(ts),
    }))


if __name__ == "__main__":
    main()
