"""MSDA encoder Pallas kernel (ops/pallas/msda_pallas.py) vs the
grid-sample-verified gather composite (ops/ms_deform_attn.py).

Interpret mode on CPU; the real-chip compile check lives in the TPU suite
(-m tpu).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from mqdet_tpu.ops.ms_deform_attn import ms_deform_attn_sample
from mqdet_tpu.ops.pallas.msda_pallas import (
    DEFAULT_RADIUS_FOR_K,
    ms_deform_attn_encoder,
)

SHAPES = [(16, 16), (8, 8), (4, 4), (2, 2)]
NH, HD, P = 2, 8, 3


def _encoder_inputs(rng, shapes, within_window=True, b=2):
    """Queries = pixels; locations = own position + per-level offset that
    stays inside the clip window (so pallas == composite exactly)."""
    s = sum(h * w for h, w in shapes)
    l = len(shapes)
    value = rng.standard_normal((b, s, NH, HD)).astype(np.float32)
    attn = rng.random((b, s, NH, l, P)).astype(np.float32)
    attn /= attn.sum(axis=(3, 4), keepdims=True)

    ref = np.concatenate(
        [
            np.stack(
                np.meshgrid(
                    (np.arange(w) + 0.5) / w, (np.arange(h) + 0.5) / h
                ),
                -1,
            ).reshape(h * w, 2)
            for h, w in shapes
        ]
    )  # (S, 2) normalized (x, y) of each query pixel
    loc = np.zeros((b, s, NH, l, P, 2), np.float32)
    for lv, (h, w) in enumerate(shapes):
        if within_window:
            # offset in lv pixels, |u| <= R(k) - 0.99 for the worst ratio
            u = rng.uniform(-1.0, 1.0, (b, s, NH, P, 2)) * 0.95
        else:
            u = rng.uniform(-6.0, 6.0, (b, s, NH, P, 2))
        loc[:, :, :, lv, :, 0] = ref[None, :, None, None, 0] + u[..., 0] / w
        loc[:, :, :, lv, :, 1] = ref[None, :, None, None, 1] + u[..., 1] / h
    return jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn)


@pytest.mark.slow  # ~26s; interpret-mode on CPU, real check is on-TPU
def test_encoder_pallas_matches_composite(rng):
    value, loc, attn = _encoder_inputs(rng, SHAPES)
    want = ms_deform_attn_sample(value, SHAPES, loc, attn)
    got = ms_deform_attn_encoder(
        value, SHAPES, loc, attn, pallas_query_levels=(0, 1), interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_encoder_pallas_all_query_levels(rng):
    """All query levels on the kernel path: coarser/equal pairs ride the
    band kernel, 2x-finer pairs ride the slope-2 phase planes, >=4x-finer
    pairs the gather fallback; totals must match the composite."""
    value, loc, attn = _encoder_inputs(rng, SHAPES)
    want = ms_deform_attn_sample(value, SHAPES, loc, attn)
    got = ms_deform_attn_encoder(
        value, SHAPES, loc, attn, pallas_query_levels=(0, 1, 2, 3),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_encoder_pallas_bf16_value(rng):
    """bf16 value maps (the production eval dtype) must lower: the band
    maps are upcast to f32 OUTSIDE the kernel (a bf16 source DMA'd into an
    f32 scratch is a Mosaic dtype-mismatch error, and a bf16 band scratch
    fails Mosaic's second-minor alignment proving for the +-1-offset
    dynamic slice). Tolerance is bf16 rounding of the inputs."""
    shapes = [(8, 8), (4, 4)]
    value, loc, attn = _encoder_inputs(rng, shapes, b=1)
    v16 = value.astype(jnp.bfloat16)
    want = ms_deform_attn_sample(
        v16.astype(jnp.float32), shapes, loc, attn
    )
    got = ms_deform_attn_encoder(
        v16, shapes, loc, attn, pallas_query_levels=(0,), interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.slow  # ~11s; nightly tier
def test_non_exact_ratio_routes_cross_level_to_gather(rng):
    """(15,15)->(8,8) is not an exact ratio: the cross-level pair must ride
    the gather composite (the exact self-pair stays pallas); with
    within-window offsets the total matches the composite."""
    shapes = [(15, 15), (8, 8)]
    value, loc, attn = _encoder_inputs(rng, shapes)
    want = ms_deform_attn_sample(value, shapes, loc, attn)
    got = ms_deform_attn_encoder(
        value, shapes, loc, attn, pallas_query_levels=(0, 1), interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_empty_pallas_levels_is_pure_gather(rng):
    """pallas_query_levels=() must reproduce the composite exactly, even
    with far-out-of-window offsets (no clipping on the gather path)."""
    value, loc, attn = _encoder_inputs(rng, SHAPES, within_window=False)
    want = ms_deform_attn_sample(value, SHAPES, loc, attn)
    got = ms_deform_attn_encoder(
        value, SHAPES, loc, attn, pallas_query_levels=(), interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow  # ~26s
def test_dispatch_env_routing(rng, monkeypatch):
    """MQDET_MSDA_IMPL routing: gather on CPU by default; pallas_interpret
    forces the kernel; decoder-shaped queries always gather."""
    from mqdet_tpu.ops.ms_deform_attn import ms_deform_attn

    value, loc, attn = _encoder_inputs(rng, SHAPES, b=1)
    want = ms_deform_attn_sample(value, SHAPES, loc, attn)

    monkeypatch.setenv("MQDET_MSDA_IMPL", "pallas")  # CPU -> gather
    np.testing.assert_allclose(
        np.asarray(ms_deform_attn(value, SHAPES, loc, attn)),
        np.asarray(want), rtol=1e-6, atol=1e-6,
    )
    monkeypatch.setenv("MQDET_MSDA_IMPL", "pallas_interpret")
    np.testing.assert_allclose(
        np.asarray(ms_deform_attn(value, SHAPES, loc, attn)),
        np.asarray(want), rtol=2e-5, atol=2e-5,
    )
    # decoder shape: 10 learned queries != S -> gather even under pallas
    dec_loc = loc[:, :10]
    dec_attn = attn[:, :10]
    np.testing.assert_allclose(
        np.asarray(ms_deform_attn(value, SHAPES, dec_loc, dec_attn)),
        np.asarray(ms_deform_attn_sample(value, SHAPES, dec_loc, dec_attn)),
        rtol=1e-6, atol=1e-6,
    )


@pytest.mark.slow  # ~14s; nightly tier
def test_dispatch_gradients_flow(rng, monkeypatch):
    """custom_vjp: grads through the pallas forward come from the composite
    and must be finite / close to the composite's own grads."""
    import jax

    from mqdet_tpu.ops.ms_deform_attn import ms_deform_attn

    shapes = [(4, 4), (2, 2)]
    value, loc, attn = _encoder_inputs(rng, shapes, b=1)

    def loss_fn(fn):
        return lambda v, l, a: jnp.sum(fn(v, shapes, l, a) ** 2)

    monkeypatch.setenv("MQDET_MSDA_IMPL", "pallas_interpret")
    g_pallas = jax.grad(loss_fn(ms_deform_attn), argnums=(0, 1, 2))(
        value, loc, attn
    )
    g_ref = jax.grad(loss_fn(ms_deform_attn_sample), argnums=(0, 1, 2))(
        value, loc, attn
    )
    for gp, gr in zip(g_pallas, g_ref):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=5e-4, atol=5e-4)


@pytest.mark.tpu
@pytest.mark.parametrize("value_dtype", [jnp.float32, jnp.bfloat16])
def test_encoder_pallas_compiles_on_tpu(value_dtype):
    """Real-chip Mosaic compile + parity at the GDINO 832x1408 bucket
    shapes (exact power-of-two pyramid: 104x176 -> 13x22), nh*L*P = 128
    lanes. Interpret-mode passing does NOT imply Mosaic compiles — this is
    the hardware gate; bf16 value maps (the production eval dtype) gate the
    outside-the-kernel upcast path too."""
    import jax

    shapes = [(104, 176), (52, 88), (26, 44), (13, 22)]
    rng_ = np.random.default_rng(0)
    s = sum(h * w for h, w in shapes)
    nh, hd, p = 8, 32, 4
    value = jnp.asarray(
        rng_.standard_normal((1, s, nh, hd)).astype(np.float32)
    ).astype(value_dtype)
    attn = rng_.random((1, s, nh, 4, p)).astype(np.float32)
    attn = jnp.asarray(attn / attn.sum((3, 4), keepdims=True))
    ref = np.concatenate(
        [
            np.stack(
                np.meshgrid(
                    (np.arange(w) + 0.5) / w, (np.arange(h) + 0.5) / h
                ),
                -1,
            ).reshape(h * w, 2)
            for h, w in shapes
        ]
    )
    loc = np.zeros((1, s, nh, 4, p, 2), np.float32)
    for lv, (h, w) in enumerate(shapes):
        u = rng_.uniform(-0.95, 0.95, (1, s, nh, p, 2))
        loc[:, :, :, lv, :, 0] = ref[None, :, None, None, 0] + u[..., 0] / w
        loc[:, :, :, lv, :, 1] = ref[None, :, None, None, 1] + u[..., 1] / h
    loc = jnp.asarray(loc)

    got = np.asarray(
        ms_deform_attn_encoder(value, shapes, loc, attn,
                               pallas_query_levels=(0, 1))
    )
    want = np.asarray(
        ms_deform_attn_sample(value.astype(jnp.float32), shapes, loc, attn)
    )
    tol = 5e-5 if value_dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_out_of_window_offsets_are_clipped(rng):
    """Locations beyond the window clamp to the window edge (the DCN
    clipped-offset contract) instead of sampling garbage: result equals the
    composite run with pre-clipped locations."""
    shapes = [(8, 8), (4, 4)]
    value, loc, attn = _encoder_inputs(rng, shapes, within_window=False)
    got = ms_deform_attn_encoder(
        value, shapes, loc, attn, pallas_query_levels=(0,), interpret=True
    )

    # clip lq=0 locations to the per-level window around each query's base
    # cell; lq=1 rows ride the gather path unclipped
    loc_c = np.array(loc)
    hq, wq = shapes[0]
    q1 = hq * wq
    for lv, (h, w) in enumerate(shapes):
        k = hq // h
        r = DEFAULT_RADIUS_FOR_K[k]
        b0y = np.floor((np.arange(hq) + 0.5) / k - 0.5)
        b0x = np.floor((np.arange(wq) + 0.5) / k - 0.5)
        s_y = loc_c[:, :q1, :, lv, :, 1] * h - 0.5
        s_x = loc_c[:, :q1, :, lv, :, 0] * w - 0.5
        base_y = np.repeat(b0y, wq)[None, :, None, None]
        base_x = np.tile(b0x, hq)[None, :, None, None]
        s_y = np.clip(s_y, base_y - r, base_y + r + 1)
        s_x = np.clip(s_x, base_x - r, base_x + r + 1)
        loc_c[:, :q1, :, lv, :, 1] = (s_y + 0.5) / h
        loc_c[:, :q1, :, lv, :, 0] = (s_x + 0.5) / w
    want = ms_deform_attn_sample(value, shapes, jnp.asarray(loc_c), attn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_finer_pairs_ride_the_kernel_not_gather(rng):
    """Routing guard: the (lq=1, lv=0) 2x-finer pair must run through the
    phase-plane kernel path, not silently fall back to gather. Evidence:
    with offsets far outside the FINER_RV clip window, the kernel CLIPS
    (documented contract) while the gather composite samples unclipped —
    the outputs must therefore DIFFER; and with in-window offsets they
    must agree exactly."""
    from mqdet_tpu.ops.pallas.msda_pallas import FINER_RV

    shapes = [(8, 8), (4, 4)]
    value, loc, attn = _encoder_inputs(rng, shapes, within_window=False)
    got = ms_deform_attn_encoder(
        value, shapes, loc, attn, pallas_query_levels=(1,), interpret=True
    )
    want_unclipped = ms_deform_attn_sample(value, shapes, loc, attn)
    q1 = shapes[0][0] * shapes[0][1]
    # lq=1 rows: the finer (1,0) pair clips at +-FINER_RV value px, so the
    # +-6 px offsets above must change the result vs the unclipped gather
    diff = np.abs(np.asarray(got[:, q1:]) - np.asarray(want_unclipped[:, q1:]))
    assert diff.max() > 1e-3, "finer pair appears to ride gather (no clip)"

    value2, loc2, attn2 = _encoder_inputs(rng, shapes, within_window=True)
    got2 = ms_deform_attn_encoder(
        value2, shapes, loc2, attn2, pallas_query_levels=(1,), interpret=True
    )
    want2 = ms_deform_attn_sample(value2, shapes, loc2, attn2)
    np.testing.assert_allclose(
        np.asarray(got2[:, q1:]), np.asarray(want2[:, q1:]),
        rtol=2e-5, atol=2e-5,
    )
