"""Second-stage perf bisection: dispatch overhead, DCN impl choice in-head,
postproc internals, and per-component XLA cost-analysis flops."""
from __future__ import annotations

import json
import os
import statistics
import time

os.environ["MQDET_DEFORM_IMPL"] = os.environ.get("MQDET_DEFORM_IMPL", "window")


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


def flops_of(jitted, *args):
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return None


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mqdet_tpu.engine.predict import make_split_predict_fns
    from mqdet_tpu.utils.builders import (
        build_model, init_params_fast, mq_glip_t_config, synthetic_batch,
    )

    # ---- pure dispatch overhead: trivial jit, same fencing ----
    tiny = jnp.ones((8, 128), jnp.float32)

    @jax.jit
    def nop(x):
        return x + 1.0

    emit("dispatch_overhead_ms", timed(
        lambda: nop(tiny), lambda o: float(jnp.sum(o)), iters=20))

    # ---- amortized plain conv (16 convs in one jit) ----
    rng = np.random.default_rng(0)
    cp = 4
    x0 = jnp.asarray(rng.standard_normal((cp, 100, 168, 256)), jnp.bfloat16)
    wt = jnp.asarray(rng.standard_normal((3, 3, 256, 256)) * 0.02, jnp.bfloat16)

    @jax.jit
    def conv16(x, w):
        def body(c, _):
            return jax.lax.conv_general_dilated(
                c, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16).astype(jnp.bfloat16), None
        y, _ = jax.lax.scan(body, x, None, length=16)
        return y

    t16 = timed(lambda: conv16(x0, wt), lambda o: float(jnp.sum(o[..., 0])))
    emit("conv3x3_l0_amortized_ms", (t16 - 35.0) / 16.0)

    # ---- DCN impls amortized (8 reps inside one jit) ----
    from mqdet_tpu.ops.deform_conv import modulated_deform_conv_window
    from mqdet_tpu.ops.pallas.deform_conv_pallas import (
        modulated_deform_conv_pallas,
    )

    off0 = jnp.asarray(rng.standard_normal((cp, 100, 168, 18)) * 0.5,
                       jnp.bfloat16)
    m0 = jnp.asarray(rng.uniform(0, 1, (cp, 100, 168, 9)), jnp.bfloat16)
    bs = jnp.zeros((256,), jnp.bfloat16)

    def rep8(fn):
        @jax.jit
        def f(x, off, m, w, b):
            def body(c, _):
                y = fn(c, off, m, w, b)
                return y.astype(x.dtype), None
            y, _ = jax.lax.scan(body, x, None, length=8)
            return y
        return f

    pallas8 = rep8(lambda *a: modulated_deform_conv_pallas(*a, stride=1, radius=2))
    window8 = rep8(lambda *a: modulated_deform_conv_window(*a, stride=1, radius=2))
    tp = timed(lambda: pallas8(x0, off0, m0, wt, bs),
               lambda o: float(jnp.sum(o[..., 0])), iters=5)
    tw = timed(lambda: window8(x0, off0, m0, wt, bs),
               lambda o: float(jnp.sum(o[..., 0])), iters=5)
    emit("dcn_l0_pallas_amortized_ms", (tp - 35.0) / 8.0)
    emit("dcn_l0_window_amortized_ms", (tw - 35.0) / 8.0)

    # ---- head with window DCN (env set above) ----
    cfg = mq_glip_t_config()
    cfg.MODEL.ATSS.DETECTIONS_PER_IMG = 300
    image_hw = (800, 1344)
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
                if jnp.issubdtype(x.dtype, jnp.floating)))

    encode_fn, head_fn = make_split_predict_fns(model, image_hw, cfg)
    feats = encode_fn(params, one_image)
    emit("head_postproc_window_cp4_ms", timed(
        lambda: head_fn(params, feats, args[1], args[2], args[3], args[4],
                        agg_map, sizes), sync_tree))

    # honest flops: backbone + head (not lax.map-folded)
    emit("encode_flops", flops_of(encode_fn, params, one_image))
    emit("head_flops_cp4", flops_of(
        head_fn, params, feats, args[1], args[2], args[3], args[4], agg_map,
        sizes))


if __name__ == "__main__":
    main()
