#!/usr/bin/env python
"""Protocol throughput for the non-headline BASELINE configs.

bench.py covers MQ-GLIP-T (the driver headline). This measures, with the
same fencing/protocol methodology:
  * MQ-GLIP-L   — Swin-L 192/(2,2,18,2), NUM_CONVS 8, window 12
                  (configs/vision_query_5shot/lvis_minival_L.yaml)
  * MQ-GroundingDINO-T — 6+6 deformable transformer, 900 queries
                  (configs/vision_query_5shot/lvis_minival_groundingdino-T.yaml)

Same LVIS operating point: 31 prompt chunks of <=40 classes per image,
CP-chunk-batched heads, single-dispatch whole protocol, one v5e chip.

Usage: python -m tools.bench_models [glip_l] [gdino_t]   (default: both)
Prints ONE JSON line per model; record the results in PERF.md.
"""
from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
from mqdet_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

CHUNKS_PER_IMAGE = 31
TPU_V5E_BF16_PEAK_FLOPS = 197e12


def _flops(jitted, *args):
    import jax

    from mqdet_tpu.utils import flop_count

    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        xla = float(cost.get("flops", 0.0)) or 0.0
    except Exception:
        return None, {}
    try:
        raw = getattr(jitted, "__wrapped__", jitted)
        with flop_count.measure() as fc:
            jax.make_jaxpr(lambda *a: raw(*a))(*args)
        pallas = fc.by_kernel()
    except Exception:
        pallas = {}
    return xla + sum(pallas.values()), pallas


def bench_one(name: str, cfg, chunk_batch: int, iters: int = 12):
    import jax
    import jax.numpy as jnp

    from mqdet_tpu.engine.predict import (
        make_protocol_fn, make_split_predict_fns,
    )
    from mqdet_tpu.utils.builders import (
        build_model, init_params_fast, synthetic_batch,
    )

    image_hw = tuple(cfg.TPU.IMAGE_BUCKETS[0])  # per-model eval bucket
    n_groups = -(-CHUNKS_PER_IMAGE // chunk_batch)
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

    def sync(out):
        return float(jnp.sum(out.scores))

    protocol_fn = make_protocol_fn(model, image_hw, cfg)
    for _ in range(2):
        sync(protocol_fn(params, one_image, *g_text, g_sizes))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(protocol_fn(params, one_image, *g_text, g_sizes))
        ts.append(time.perf_counter() - t0)
    p50 = statistics.median(ts)

    # honest flops: backbone + G x head (cost analysis folds the lax.map)
    encode_fn, head_fn = make_split_predict_fns(model, image_hw, cfg)
    feats = jax.eval_shape(encode_fn, params, one_image)
    enc_flops, enc_pallas = _flops(encode_fn, params, one_image)
    head_flops, head_pallas = _flops(
        head_fn, params, feats, args[1], args[2], args[3], args[4], agg_map,
        sizes)
    flops = (
        enc_flops + n_groups * head_flops
        if enc_flops and head_flops else None
    )
    mfu = (
        flops / p50 / TPU_V5E_BF16_PEAK_FLOPS if flops else None
    )
    print(json.dumps({
        "model": name,
        "img_per_sec": round(1.0 / p50, 4),
        "p50_latency_ms": round(p50 * 1000, 2),
        "chunk_parallelism": chunk_batch,
        "groups": n_groups,
        "mfu": round(mfu, 4) if mfu else None,
        "flops_per_image": round(flops) if flops else None,
        "pallas_flops": {
            k: round(enc_pallas.get(k, 0.0) + n_groups * v)
            for k, v in head_pallas.items()
        },
        "operating_point": (
            f"LVIS 31-chunk protocol, {image_hw[0]}x{image_hw[1]}, bank k=5"
        ),
        "timed_iters": iters,
    }), flush=True)


def main():
    from mqdet_tpu.utils.builders import (
        mq_glip_l_config, mq_groundingdino_t_config,
    )

    which = sys.argv[1:] or ["glip_l", "gdino_t"]
    for name in which:
        model, _, cp = name.partition(":")
        cp = int(cp) if cp else 4
        if model == "glip_l":
            cfg = mq_glip_l_config()
            cfg.MODEL.ATSS.DETECTIONS_PER_IMG = 300
            bench_one("MQ-GLIP-L", cfg, chunk_batch=cp)
        elif model == "gdino_t":
            cfg = mq_groundingdino_t_config()
            bench_one("MQ-GroundingDINO-T", cfg, chunk_batch=cp)
        else:
            raise SystemExit(f"unknown model {name}")


if __name__ == "__main__":
    main()
