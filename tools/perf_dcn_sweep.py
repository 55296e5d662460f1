"""Sweep Pallas DCN kernel parameters at the LVIS level-0 shape.

Usage: python -m tools.perf_dcn_sweep [versions] [block_rows]
  versions: comma-separated kernel versions (default "2,5")
  block_rows: comma-separated (default "8")
"""
from __future__ import annotations

import json
import statistics
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mqdet_tpu.ops.pallas.deform_conv_pallas import (
        modulated_deform_conv_pallas,
    )

    rng = np.random.default_rng(0)
    cp = 4
    x0 = jnp.asarray(rng.standard_normal((cp, 100, 168, 256)), jnp.bfloat16)
    # Two offset regimes: "rand" (white noise per position — worst case for
    # per-block shift bounds) and "smooth" (low-frequency field upsampled —
    # what conv-produced offsets look like in production, where per-block
    # bounds are typically a 2x2 cell).
    off_rand = rng.standard_normal((cp, 100, 168, 18)) * 0.5
    low = rng.standard_normal((cp, 7, 11, 18)) * 1.0
    off_smooth = np.kron(low, np.ones((1, 15, 16, 1)))[:, :100, :168, :]
    m0 = jnp.asarray(rng.uniform(0, 1, (cp, 100, 168, 9)), jnp.bfloat16)
    wt = jnp.asarray(rng.standard_normal((3, 3, 256, 256)) * 0.02, jnp.bfloat16)
    bs = jnp.zeros((256,), jnp.bfloat16)

    def rep8(fn):
        @jax.jit
        def f(x, off, m, w, b):
            def body(c, _):
                return fn(c, off, m, w, b).astype(x.dtype), None
            y, _ = jax.lax.scan(body, x, None, length=8)
            return y
        return f

    def timed(call, iters=5, warmup=2):
        for _ in range(warmup):
            float(jnp.sum(call()[..., 0]))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(jnp.sum(call()[..., 0]))
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts) * 1000.0

    versions = tuple(
        int(v) for v in (sys.argv[1] if len(sys.argv) > 1 else "2,5").split(",")
    )
    brs = tuple(
        int(v) for v in (sys.argv[2] if len(sys.argv) > 2 else "8").split(",")
    )
    for regime, off_np in (("rand", off_rand), ("smooth", off_smooth)):
        off0 = jnp.asarray(off_np, jnp.bfloat16)
        ref = None
        for version in versions:
            for br in brs:
                try:
                    fn = rep8(lambda *a, _v=version, _b=br:
                              modulated_deform_conv_pallas(
                                  *a, stride=1, radius=2, block_rows=_b,
                                  version=_v))
                    out1 = modulated_deform_conv_pallas(
                        x0, off0, m0, wt, bs, stride=1, radius=2,
                        block_rows=br, version=version)
                    rec = {"regime": regime, "version": version,
                           "block_rows": br}
                    if ref is None:
                        ref = np.asarray(out1, np.float32)
                    else:
                        rec["max_err_vs_v2ref"] = float(np.max(np.abs(
                            np.asarray(out1, np.float32) - ref)))
                    t = timed(lambda: fn(x0, off0, m0, wt, bs))
                    rec["amortized_ms"] = (t - 36.7) / 8.0
                    print(json.dumps(rec), flush=True)
                except Exception as e:
                    print(json.dumps({"regime": regime, "version": version,
                                      "block_rows": br,
                                      "error": f"{type(e).__name__}: {e}"[:200]}),
                          flush=True)


if __name__ == "__main__":
    main()
