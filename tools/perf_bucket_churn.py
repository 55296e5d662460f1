#!/usr/bin/env python
"""Bucket-churn measurement for multi-bucket LVIS evaluation (VERDICT r3 #8).

bench.py times one synthetic-uniform operating point: every image lands in
the (800, 1344) bucket. Real LVIS eval sees the COCO size distribution —
landscape 4:3/3:2, portrait, near-square — so a static-bucket TPU eval pays
(a) one head compilation per distinct padded geometry and (b) padding waste
(the protocol is DCN/bandwidth-bound, so time scales with padded pixels).

This tool measures, on the real chip:
  * per-geometry protocol p50 + first-call compile wall time, for the
    geometries induced by candidate TPU.IMAGE_BUCKETS sets;
  * then models a full LVIS-minival-sized eval (N images drawn from a
    realistic resized-size distribution) for each candidate bucket set:
    total = sum(compiles) + sum_images p50(bucket(image)).

The resized-size distribution below is the COCO/LVIS shape mix under the
INPUT.MIN_SIZE_TEST=800 / MAX_SIZE_TEST=1333 resize rule
(maskrcnn_benchmark/data/transforms/transforms.py Resize semantics):
~2/3 landscape (mostly 4:3 -> 800x1067, some 3:2 -> 800x1200, a 16:9 tail
capped at 1333), ~1/4 portrait mirrors, ~5% near-square.

Usage: python -m tools.perf_bucket_churn [N_IMAGES]   (default 5000)
Prints one JSON line per geometry and one per bucket set; record in PERF.md.
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

# (resized_h, resized_w, fraction) — COCO/LVIS mix at min 800 / max 1333
SIZE_DISTRIBUTION = (
    (800, 1067, 0.47),   # 4:3 landscape (640x480, 500x375, ...)
    (800, 1200, 0.12),   # 3:2 landscape
    (800, 1333, 0.06),   # wide landscape, capped at MAX_SIZE_TEST
    (1067, 800, 0.22),   # 4:3 portrait
    (1200, 800, 0.05),   # 3:2 portrait
    (1333, 800, 0.03),   # tall portrait, capped
    (800, 880, 0.05),    # near-square
)

# candidate TPU.IMAGE_BUCKETS sets (orientation-free entries; pick_bucket
# serves portrait images from the transposed geometry)
BUCKET_SETS = {
    "single-1344": ((800, 1344),),
    "two-1088+1344": ((800, 1088), (800, 1344)),
    "three-1088+1216+1344": ((800, 1088), (800, 1216), (800, 1344)),
    "square-1344 (orientation-free, 1 compile)": ((1344, 1344),),
}


def main():
    import jax.numpy as jnp

    from mqdet_tpu.data.transforms import pick_bucket
    from mqdet_tpu.engine.predict import make_protocol_fn
    from mqdet_tpu.utils.builders import (
        build_model, init_params_fast, mq_glip_t_config, synthetic_batch,
    )

    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    chunk_batch = 4
    n_groups = -(-CHUNKS_PER_IMAGE // chunk_batch)

    cfg = mq_glip_t_config()
    cfg.MODEL.ATSS.DETECTIONS_PER_IMG = 300

    # geometries needed across all candidate sets for the distribution
    geoms = set()
    for name, buckets in BUCKET_SETS.items():
        for h, w, _ in SIZE_DISTRIBUTION:
            geoms.add(pick_bucket(h, w, buckets))

    # measure each geometry once; transposed twins share runtime (same
    # pixel count, same per-level conv geometry transposed) but are their
    # own compilation — measure compile for both, p50 once per pixel count
    model = build_model(cfg)
    params = None
    p50_ms = {}
    compile_s = {}
    measured = {}

    def sync_dets(out):
        return float(jnp.sum(out.scores))

    for geom in sorted(geoms, key=lambda g: (g[0] * g[1], g)):
        batch = synthetic_batch(
            cfg, batch=chunk_batch, image_hw=geom, num_labels=40, k_shot=5
        )
        args = tuple(
            jnp.asarray(batch[k])
            for k in ("images", "input_ids", "attention_mask", "queries",
                      "query_mask")
        )
        if params is None:
            params = init_params_fast(model, *args)
        agg_map = jnp.asarray(batch["agg_map"])
        sizes = jnp.asarray(batch["image_sizes"])
        one_image = args[0][:1]

        def grp(x):
            return jnp.broadcast_to(x[None], (n_groups,) + x.shape)

        g_text = tuple(grp(a) for a in args[1:]) + (grp(agg_map),)
        g_sizes = grp(sizes)

        protocol_fn = make_protocol_fn(model, geom, cfg)
        t0 = time.perf_counter()
        sync_dets(protocol_fn(params, one_image, *g_text, g_sizes))
        compile_s[geom] = time.perf_counter() - t0

        pix = geom[0] * geom[1]
        if pix in measured:
            p50_ms[geom] = measured[pix]
        else:
            ts = []
            for _ in range(7):
                t0 = time.perf_counter()
                sync_dets(protocol_fn(params, one_image, *g_text, g_sizes))
                ts.append(time.perf_counter() - t0)
            p50_ms[geom] = statistics.median(ts) * 1000.0
            measured[pix] = p50_ms[geom]
        print(json.dumps({
            "geometry": list(geom),
            "compile_s": round(compile_s[geom], 1),
            "protocol_p50_ms": round(p50_ms[geom], 1),
        }), flush=True)

    base = min(p50_ms.values())
    results = []
    for name, buckets in BUCKET_SETS.items():
        used = {}
        pad_waste = 0.0
        per_image = 0.0
        for h, w, frac in SIZE_DISTRIBUTION:
            g = pick_bucket(h, w, buckets)
            used[g] = True
            per_image += frac * p50_ms[g] / 1000.0
            pad_waste += frac * (g[0] * g[1] - h * w) / (h * w)
        compiles = sum(compile_s[g] for g in used)
        total = compiles + n_images * per_image
        results.append({
            "bucket_set": name,
            "geometries_compiled": [list(g) for g in used],
            "compile_total_s": round(compiles, 1),
            "avg_s_per_image": round(per_image, 4),
            "avg_padding_waste_pct": round(100 * pad_waste, 1),
            "total_eval_s_at_N": round(total, 1),
            "n_images": n_images,
        })
    results.sort(key=lambda r: r["total_eval_s_at_N"])
    for r in results:
        print(json.dumps(r), flush=True)
    best = results[0]["bucket_set"]
    print(json.dumps({"recommendation": best}), flush=True)


if __name__ == "__main__":
    main()
