"""Time one VLFuse bi-attention stage at LVIS protocol shapes:
flash Pallas kernel vs XLA composite (scan-amortized, overhead-free)."""
from __future__ import annotations

import json
import os
import statistics
import time


def timed(call, sync, iters=5, warmup=2):
    for _ in range(warmup):
        sync(call())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(call())
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1000.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mqdet_tpu.models.fusion import BiMultiHeadAttention

    cp, n, t = 4, 22400, 256
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((cp, n, 256)), jnp.bfloat16)
    l = jnp.asarray(rng.standard_normal((cp, t, 768)), jnp.bfloat16)
    mask = jnp.ones((cp, t), jnp.int32)

    mod = BiMultiHeadAttention(v_dim=256, l_dim=768, embed_dim=2048,
                               num_heads=8, dtype=jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), v, l, mask)

    def rep6(impl):
        @jax.jit
        def f(params, v, l, mask):
            def body(carry, _):
                cv, cl = carry
                os.environ["MQDET_FUSION_IMPL"] = impl  # traced once; static
                dv, dl = mod.apply(params, cv, cl, mask)
                return (cv + dv.astype(cv.dtype),
                        cl + dl.astype(cl.dtype)), None
            (cv, cl), _ = jax.lax.scan(body, (v, l), None, length=6)
            return cv, cl
        return f

    def sync(o):
        return float(sum(jnp.sum(jnp.abs(x[..., 0].astype(jnp.float32)))
                         for x in o))

    for impl in ("pallas", "xla"):
        os.environ["MQDET_FUSION_IMPL"] = impl
        f = rep6(impl)
        tms = timed(lambda: f(params, v, l, mask), sync)
        print(json.dumps({"fusion_impl": impl,
                          "per_stage_ms": (tms - 30.0) / 6.0}), flush=True)


if __name__ == "__main__":
    main()
