"""DCN offset-range calibration (utils/calibrate.py).

Covers VERDICT round-1 item 3: the window/Pallas DCNv2 paths clip offsets to
TPU.DEFORM_RADIUS; calibration must detect when a parameter set produces
offsets past the radius and either raise it or force the exact gather impl
(reference CUDA sampling is unbounded, csrc/cuda/deform_conv_kernel_cuda.cu).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mqdet_tpu.models.mq_glip import MQGLIP
from mqdet_tpu.utils.calibrate import (
    MAX_WINDOW_RADIUS,
    apply_calibration,
    calibrate_deform_radius,
    measure_max_deform_offset,
)


def tiny_model():
    return MQGLIP(
        embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
        window_size=4, out_channels=16, num_convs=1, num_classes=7,
        lang_layers=2, lang_dim=32, lang_heads=2, lang_intermediate=64,
        vocab_size=100, start_qv_layer=1, use_deform=True,
    )


def tiny_batch(rng):
    images = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 100, (1, 16)).astype(np.int32))
    mask = jnp.ones((1, 16), jnp.int32)
    queries = jnp.asarray(rng.standard_normal((1, 5, 16)).astype(np.float32))
    qmask = jnp.ones((1, 5, 16))
    return images, ids, mask, queries, qmask


def scale_offset_params(params, factor):
    """Scale every DyConv offset-conv kernel/bias by `factor`."""

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {
                k: (
                    jax.tree.map(lambda x: x * factor, v)
                    if k == "offset"
                    else walk(v, path + (k,))
                )
                for k, v in tree.items()
            }
        return tree

    return walk(params)


@pytest.fixture(scope="module")
def model_and_params():
    rng = np.random.default_rng(0)
    m = tiny_model()
    batch = tiny_batch(rng)
    params = m.init(jax.random.PRNGKey(0), *batch)
    return m, params, batch


@pytest.mark.slow  # ~80s cold compile
def test_measure_matches_direct_capture(model_and_params):
    """measure_max_deform_offset equals a hand-rolled capture of the same
    offset tensors."""
    m, params, batch = model_and_params
    measured = measure_max_deform_offset(m, params, *batch)

    feats = m.apply(params, batch[0], method=MQGLIP.encode_image)
    _, inter = m.apply(
        params, list(feats), *batch[1:],
        method=MQGLIP.forward_head,
        capture_intermediates=lambda mdl, _: True,
        mutable=["intermediates"],
    )
    oms = [
        x for x in jax.tree.leaves(inter)
        if hasattr(x, "ndim") and x.ndim == 4 and x.shape[-1] == 27
    ]
    assert oms, "no offset tensors captured"
    direct = max(float(jnp.max(jnp.abs(om[..., :18]))) for om in oms)
    assert measured == pytest.approx(direct, abs=1e-6)
    assert measured > 0.0


@pytest.mark.slow  # ~61s module fixture
def test_calibration_keeps_radius_when_offsets_small(model_and_params):
    m, params, batch = model_and_params
    from mqdet_tpu.core.config import default_config

    cfg = default_config()
    # shrink offsets well inside the radius
    small = scale_offset_params(params, 1e-4)
    calib = calibrate_deform_radius(cfg, m, small, batch)
    assert not calib.changed
    assert calib.radius == cfg.TPU.DEFORM_RADIUS
    assert calib.impl == "pallas"


def test_calibration_raises_radius_then_falls_back_to_gather(model_and_params):
    m, params, batch = model_and_params
    from mqdet_tpu.core.config import default_config

    cfg = default_config()
    base = measure_max_deform_offset(m, params, *batch)

    # scale so max offset lands between the default radius and the window cap
    target = (cfg.TPU.DEFORM_RADIUS + MAX_WINDOW_RADIUS) / 2.0
    mid = scale_offset_params(params, target / base)
    calib = calibrate_deform_radius(cfg, m, mid, batch)
    assert calib.changed and calib.impl == "pallas"
    assert cfg.TPU.DEFORM_RADIUS < calib.radius <= MAX_WINDOW_RADIUS
    assert calib.radius >= calib.max_offset  # exactness guarantee

    # scale past the window cap: must fall back to the exact gather impl
    big = scale_offset_params(params, (4 * MAX_WINDOW_RADIUS) / base)
    calib2 = calibrate_deform_radius(cfg, m, big, batch)
    assert calib2.changed and calib2.impl == "gather"

    import os

    cfg2 = default_config()
    old = os.environ.pop("MQDET_DEFORM_IMPL", None)
    try:
        assert apply_calibration(cfg2, calib) is True
        assert cfg2.TPU.DEFORM_RADIUS == calib.radius
        assert apply_calibration(cfg2, calib2) is True
        assert os.environ["MQDET_DEFORM_IMPL"] == "gather"
    finally:
        if old is None:
            os.environ.pop("MQDET_DEFORM_IMPL", None)
        else:
            os.environ["MQDET_DEFORM_IMPL"] = old


def test_radius_plumbs_from_config_to_head(model_and_params):
    """cfg.TPU.DEFORM_RADIUS reaches DeformConvGN: at a huge radius the
    window path is exact vs the gather path even for large offsets."""
    rng = np.random.default_rng(1)
    import os

    from mqdet_tpu.ops.deform_conv import (
        modulated_deform_conv,
        modulated_deform_conv_window,
    )

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    off = jnp.asarray((rng.uniform(-5, 5, (1, 8, 8, 18))).astype(np.float32))
    msk = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 9)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 4)).astype(np.float32) * 0.1)
    b = jnp.zeros((4,), jnp.float32)
    exact = modulated_deform_conv(x, off, msk, w, b)
    windowed = modulated_deform_conv_window(x, off, msk, w, b, radius=6)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(windowed),
                               atol=1e-4, rtol=1e-4)
