"""Component-level perf bisection of the MQ-GLIP-T LVIS protocol on TPU.

Times each stage of the protocol separately (same fencing discipline as
bench.py) so optimization targets are measured, not guessed:

  encode            Swin+FPN image tower, batch 1
  lang              GCP-BERT language backbone alone, batch CP
  head_full         forward_head (lang + VLDyHead), batch CP, no postproc
  head_nodeform     same, USE_DFCONV off (isolates deformable conv cost)
  postproc          atss_postprocess alone on captured head outputs
  head+postproc     the bench's head_fn (sanity cross-check)
  dcn_pallas/window single DCN conv at the level-0 shape per impl

Writes a JSON report to stdout; used to author PERF.md.
"""
from __future__ import annotations

import json
import os
import statistics
import time

from mqdet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()


def timed(call, sync, iters=10, warmup=2):
    for _ in range(warmup):
        sync(call())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(call())
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1000.0  # ms


def emit(report, key, value):
    report[key] = value
    print(json.dumps({key: value}), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mqdet_tpu.engine.predict import make_split_predict_fns
    from mqdet_tpu.models.postprocess import PostprocessParams, atss_postprocess
    from mqdet_tpu.ops.anchors import anchors_for_fpn
    from mqdet_tpu.utils.builders import (
        build_model, init_params_fast, mq_glip_t_config, synthetic_batch,
    )

    cfg = mq_glip_t_config()
    cfg.MODEL.ATSS.DETECTIONS_PER_IMG = 300
    image_hw = (800, 1344)
    cp = 4

    model = build_model(cfg)
    batch = synthetic_batch(cfg, batch=cp, image_hw=image_hw, num_labels=40,
                            k_shot=5)
    args = tuple(
        jnp.asarray(batch[k])
        for k in ("images", "input_ids", "attention_mask", "queries",
                  "query_mask")
    )
    params = init_params_fast(model, *args)
    agg_map = jnp.asarray(batch["agg_map"])
    sizes = jnp.asarray(batch["image_sizes"])
    one_image = args[0][:1]

    def sync_tree(out):
        return float(
            sum(jnp.sum(jnp.abs(x[..., 0]) if x.ndim else x)
                for x in jax.tree_util.tree_leaves(out)
                if jnp.issubdtype(x.dtype, jnp.floating))
        )

    report = {}

    # ---- encode (backbone) ----
    encode_fn, head_fn = make_split_predict_fns(model, image_hw, cfg)
    emit(report, "encode_b1_ms", timed(lambda: encode_fn(params, one_image),
                                   sync_tree))
    feats = encode_fn(params, one_image)

    # ---- head incl. postproc (the bench head_fn) ----
    emit(report, "head_postproc_cp4_ms", timed(
        lambda: head_fn(params, feats, args[1], args[2], args[3], args[4],
                        agg_map, sizes),
        sync_tree))

    # ---- forward_head only (no postproc) ----
    mc = type(model)

    @jax.jit
    def fwd_head(params, feats, ii, am, q, qm):
        out = model.apply(params, list(feats), ii, am, q, qm,
                          method=mc.forward_head)
        return out["bbox_reg"], out["centerness"], out["dot_product_logits"]

    emit(report, "head_raw_cp4_ms", timed(
        lambda: fwd_head(params, feats, args[1], args[2], args[3], args[4]),
        sync_tree))

    # ---- language backbone alone ----
    def lang_only(self, ii, am, q, qm, image_tokens):
        return self.language_backbone(
            ii, am, queries=q, query_mask=qm, image_tokens=image_tokens,
            deterministic=True)

    from mqdet_tpu.models.mq_glip import flatten_fpn_features
    feats_b = tuple(jnp.broadcast_to(f, (cp,) + f.shape[1:]) for f in feats)
    image_tokens = jax.jit(flatten_fpn_features)(feats_b)

    @jax.jit
    def lang_fn(params, ii, am, q, qm, it):
        return model.apply(params, ii, am, q.astype(model.dtype), qm, it,
                           method=lang_only)

    emit(report, "lang_cp4_ms", timed(
        lambda: lang_fn(params, args[1], args[2], args[3], args[4],
                        image_tokens),
        sync_tree))

    # ---- postproc alone ----
    anchors_np = anchors_for_fpn(
        image_hw, strides=tuple(cfg.MODEL.RPN.ANCHOR_STRIDE),
        sizes=tuple(cfg.MODEL.RPN.ANCHOR_SIZES),
        aspect_ratios=tuple(cfg.MODEL.RPN.ASPECT_RATIOS))
    anchors_levels = [jnp.asarray(a) for a in anchors_np]
    p = PostprocessParams(
        pre_nms_thresh=cfg.MODEL.ATSS.INFERENCE_TH,
        pre_nms_top_n=cfg.MODEL.ATSS.PRE_NMS_TOP_N,
        nms_thresh=cfg.MODEL.ATSS.NMS_TH,
        detections_per_img=cfg.MODEL.ATSS.DETECTIONS_PER_IMG,
        min_size=0.0, score_agg=cfg.MODEL.DYHEAD.SCORE_AGG)
    raw = fwd_head(params, feats, args[1], args[2], args[3], args[4])
    raw = jax.tree_util.tree_map(lambda x: x, raw)  # device arrays

    @jax.jit
    def post_fn(bbox, ctr, dot, agg, sz):
        head_out = {"bbox_reg": list(bbox), "centerness": list(ctr),
                    "dot_product_logits": list(dot)}
        return atss_postprocess(head_out, anchors_levels, agg, sz, p)

    emit(report, "postproc_cp4_ms", timed(
        lambda: post_fn(raw[0], raw[1], raw[2], agg_map, sizes), sync_tree))

    # ---- head without deformable conv ----
    cfg_nd = mq_glip_t_config()
    cfg_nd.MODEL.DYHEAD.USE_DFCONV = False
    model_nd = build_model(cfg_nd)
    params_nd = init_params_fast(model_nd, *args)

    @jax.jit
    def fwd_head_nd(params, feats, ii, am, q, qm):
        out = model_nd.apply(params, list(feats), ii, am, q, qm,
                             method=type(model_nd).forward_head)
        return out["bbox_reg"], out["centerness"], out["dot_product_logits"]

    emit(report, "head_raw_nodeform_cp4_ms", timed(
        lambda: fwd_head_nd(params_nd, feats, args[1], args[2], args[3],
                            args[4]),
        sync_tree))

    # ---- single DCN conv at level-0 shape, each impl ----
    import numpy as np

    from mqdet_tpu.ops.deform_conv import modulated_deform_conv_window
    from mqdet_tpu.ops.pallas.deform_conv_pallas import (
        modulated_deform_conv_pallas,
    )

    rng = np.random.default_rng(0)
    h0, w0, c = 100, 168, 256
    dt = jnp.bfloat16
    x0 = jnp.asarray(rng.standard_normal((cp, h0, w0, c)), dt)
    off0 = jnp.asarray(rng.standard_normal((cp, h0, w0, 18)) * 0.5, dt)
    m0 = jnp.asarray(rng.uniform(0, 1, (cp, h0, w0, 9)), dt)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.02, dt)
    bs = jnp.zeros((c,), dt)

    pallas_fn = jax.jit(lambda *a: modulated_deform_conv_pallas(
        *a, stride=1, radius=2))
    window_fn = jax.jit(lambda *a: modulated_deform_conv_window(
        *a, stride=1, radius=2))
    emit(report, "dcn_l0_pallas_ms", timed(
        lambda: pallas_fn(x0, off0, m0, wt, bs), sync_tree))
    emit(report, "dcn_l0_window_ms", timed(
        lambda: window_fn(x0, off0, m0, wt, bs), sync_tree))

    # plain conv reference point
    plain = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32))
    emit(report, "conv3x3_l0_plain_ms", timed(
        lambda: plain(x0, wt), sync_tree))

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
