"""Sweep the chunk-batch (CP) operating point of the whole LVIS protocol."""
from __future__ import annotations

import json
import os
import statistics
import time

from mqdet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mqdet_tpu.engine.predict import make_protocol_fn
    from mqdet_tpu.utils.builders import (
        build_model, init_params_fast, mq_glip_t_config, synthetic_batch,
    )

    cfg = mq_glip_t_config()
    cfg.MODEL.ATSS.DETECTIONS_PER_IMG = 300
    image_hw = (800, 1344)
    chunks = 31

    model = build_model(cfg)

    for cp in (4, 8, 16):
        n_groups = -(-chunks // cp)
        batch = synthetic_batch(cfg, batch=cp, image_hw=image_hw,
                                num_labels=40, k_shot=5)
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

        def sync(out):
            return float(jnp.sum(out.scores))

        call = lambda: protocol_fn(params, one_image, *g_text, g_sizes)
        for _ in range(2):
            sync(call())
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            sync(call())
            ts.append(time.perf_counter() - t0)
        p50 = statistics.median(ts) * 1000.0
        print(json.dumps({"cp": cp, "groups": n_groups,
                          "protocol_p50_ms": round(p50, 1),
                          "img_per_sec": round(1000.0 / p50, 4)}),
              flush=True)


if __name__ == "__main__":
    main()
