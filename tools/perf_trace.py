"""Capture a jax.profiler trace of the LVIS protocol on the real chip and
aggregate device-side op time.

Usage:  python -m tools.perf_trace [CP] [ITERS]

Prints one JSON line per aggregated op bucket (top 30 by total device time),
plus a summary line with total device time per protocol call — the
bisection-free ground truth for PERF.md's sink table.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys

from mqdet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

TRACE_DIR = "/tmp/mqdet_trace"


def build_protocol(cp: int):
    import jax.numpy as jnp

    from mqdet_tpu.engine.predict import make_protocol_fn
    from mqdet_tpu.utils.builders import (
        build_model, init_params_fast, mq_glip_t_config, synthetic_batch,
    )

    cfg = mq_glip_t_config()
    cfg.MODEL.ATSS.DETECTIONS_PER_IMG = 300
    image_hw = (800, 1344)
    chunks = 31
    n_groups = -(-chunks // cp)

    model = build_model(cfg)
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

    def call():
        return protocol_fn(params, one_image, *g_text, g_sizes)

    return call


def aggregate(trace_dir: str, iters: int):
    paths = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print(json.dumps({"error": "no trace found"}))
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])

    # Map (pid, tid) -> names so we keep only device-side "XLA Ops".
    proc, thread = {}, {}
    for e in ev:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                proc[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                thread[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    buckets: dict[str, list[float]] = {}
    total = 0.0
    for e in ev:
        if e.get("ph") != "X":
            continue
        if "device" not in proc.get(e["pid"], ""):
            continue
        if thread.get((e["pid"], e.get("tid"))) != "XLA Ops":
            continue
        dur_ms = e.get("dur", 0) / 1000.0
        total += dur_ms
        name = e.get("name", "?")
        args = e.get("args", {}) or {}
        long = args.get("long_name") or args.get("tf_op") or ""
        key = name.split(".")[0]
        # Strip trailing fusion numbering: fusion.123 -> fusion
        b = buckets.setdefault(key, [0.0, 0, long])
        b[0] += dur_ms
        b[1] += 1

    rows = sorted(buckets.items(), key=lambda kv: -kv[1][0])
    for name, (ms, n, long) in rows[:30]:
        print(json.dumps({
            "op": name, "total_ms": round(ms, 3),
            "per_call_ms": round(ms / iters, 3), "count": n,
            "hint": long[:140],
        }), flush=True)

    # Per-INSTANCE view: the family buckets above hide whether a family's
    # time is one giant op or a long tail, and the outer lax.map `while`
    # double-counts everything nested inside it. Instances expose e.g. which
    # specific DCN convs (per tower step x level x stride) dominate.
    inst: dict[str, list[float]] = {}
    for e in ev:
        if e.get("ph") != "X":
            continue
        if "device" not in proc.get(e["pid"], ""):
            continue
        if thread.get((e["pid"], e.get("tid"))) != "XLA Ops":
            continue
        name = e.get("name", "?")
        if name.startswith("while"):
            continue  # container op: its children are counted directly
        b = inst.setdefault(name, [0.0, 0])
        b[0] += e.get("dur", 0) / 1000.0
        b[1] += 1
    irows = sorted(inst.items(), key=lambda kv: -kv[1][0])
    for name, (ms, n) in irows[:25]:
        print(json.dumps({
            "instance": name, "per_call_ms": round(ms / iters, 3),
            "count": n,
        }), flush=True)

    print(json.dumps({"device_total_ms": round(total, 2),
                      "per_protocol_ms": round(total / iters, 2),
                      "iters": iters, "trace": path}), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    cp = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    call = build_protocol(cp)

    def sync(out):
        return float(jnp.sum(out.scores))

    sync(call())  # compile + warm
    sync(call())
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(iters):
            sync(call())
    aggregate(TRACE_DIR, iters)


if __name__ == "__main__":
    main()
