"""Bisect atss_postprocess cost on TPU: candidate top-k vs NMS."""
from __future__ import annotations

import json
import statistics
import time


def timed(call, sync, iters=10, warmup=2):
    for _ in range(warmup):
        sync(call())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(call())
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1000.0


def emit(key, value):
    print(json.dumps({key: value}), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mqdet_tpu.models.postprocess import (
        PostprocessParams, _level_candidates, atss_postprocess_single,
    )
    from mqdet_tpu.ops.anchors import anchors_for_fpn
    from mqdet_tpu.ops.nms import class_aware_nms_matrix

    cp = 4
    image_hw = (800, 1344)
    shapes = [(100, 168), (50, 84), (25, 42), (13, 21), (7, 11)]
    t = 256
    c = 40
    rng = np.random.default_rng(0)
    anchors_np = anchors_for_fpn(
        image_hw, strides=(8, 16, 32, 64, 128),
        sizes=(64, 128, 256, 512, 1024), aspect_ratios=(1.0,))
    anchors = [jnp.asarray(a) for a in anchors_np]
    p = PostprocessParams(pre_nms_thresh=0.05, pre_nms_top_n=1000,
                          nms_thresh=0.6, detections_per_img=300,
                          min_size=0.0, score_agg="MEAN")

    bbox = [jnp.asarray(rng.standard_normal((cp, h * w, 4)), jnp.float32)
            for h, w in shapes]
    ctr = [jnp.asarray(rng.standard_normal((cp, h * w)), jnp.float32)
           for h, w in shapes]
    dot = [jnp.asarray(rng.standard_normal((cp, h * w, t)) - 3.0,
                       jnp.float32) for h, w in shapes]
    agg = np.zeros((cp, c, t), np.float32)
    for j in range(c):
        agg[:, j, 2 * j + 1: 2 * j + 3] = 0.5
    agg = jnp.asarray(agg)
    sizes = jnp.asarray(np.tile([[800.0, 1344.0]], (cp, 1)))

    def sync(o):
        return float(sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                         for x in jax.tree_util.tree_leaves(o)))

    # full postproc
    @jax.jit
    def full(bbox, ctr, dot, agg, sizes):
        def single(bb, cc, dd, ag, sz):
            return atss_postprocess_single(bb, cc, dd, anchors, ag, sz[0],
                                           sz[1], p)
        return jax.vmap(single)(bbox, ctr, dot, agg, sizes)

    emit("postproc_full_ms", timed(lambda: full(bbox, ctr, dot, agg, sizes),
                                   sync))

    # candidates only (top-k per level, no NMS)
    @jax.jit
    def cands(bbox, ctr, dot, agg, sizes):
        def single(bb, cc, dd, ag, sz):
            parts = [
                _level_candidates(br_, ct_, dl_, an_, ag, sz[0], sz[1], p)
                for br_, ct_, dl_, an_ in zip(bb, cc, dd, anchors)
            ]
            return [jnp.concatenate([x[i] for x in parts]) for i in range(4)]
        return jax.vmap(single)(bbox, ctr, dot, agg, sizes)

    emit("candidates_only_ms", timed(lambda: cands(bbox, ctr, dot, agg, sizes),
                                     sync))

    # NMS only on precomputed candidates
    cand = cands(bbox, ctr, dot, agg, sizes)
    NEG_INF = jnp.finfo(jnp.float32).min

    @jax.jit
    def nms_only(boxes, scores, labels, valid):
        def single(b, s, l, v):
            return class_aware_nms_matrix(
                b, jnp.where(v, s, NEG_INF), l.astype(jnp.int32), v, 0.6, 300)
        return jax.vmap(single)(boxes, scores, labels, valid)

    emit("nms_only_ms", timed(
        lambda: nms_only(cand[0], cand[1], cand[2], cand[3] > 0), sync))


if __name__ == "__main__":
    main()
