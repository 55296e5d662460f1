"""EfficientNet / BiFPN / EffNetFPN backbones + registry dispatch.

Shape/semantics coverage for the reference backbone-registry surface
(modeling/backbone/__init__.py:19-239, efficientnet.py, bifpn.py,
efficientdet.py EffNetFPN).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mqdet_tpu.core.config import default_config
from mqdet_tpu.models.backbones import BACKBONES, build_backbone
from mqdet_tpu.models.efficientnet import (
    BiFPN,
    EfficientNet,
    EffNetFPN,
    efficientnet_spec,
    round_channels,
)


def test_round_channels_matches_reference_table():
    # width factor 1.2 (b3): conv_channel_coef[3] = [48, 136, 384]
    assert [round_channels(c * 1.2) for c in (40, 112, 320)] == [48, 136, 384]
    # width factor 1.1 (b2): conv_channel_coef[2] = [48, 120, 352]
    assert [round_channels(c * 1.1) for c in (40, 112, 320)] == [48, 120, 352]
    # b0 identity
    assert [round_channels(float(c)) for c in (40, 112, 320)] == [40, 112, 320]


def test_spec_stage_merging():
    # downsample = [1,1,1,1,0,1,0] merges 112 into the 80-stage and 320 into
    # the 192-stage (efficientnet.py:662-676) -> 5 merged stages
    chs, ks, exps, strides, init_ch, out_ch = efficientnet_spec("b0")
    assert len(chs) == 5
    assert strides == [1, 2, 2, 2, 2]
    assert out_ch == [24, 40, 112, 320]
    assert init_ch == 32
    # stage 4 = 3 units of 80 + 3 units of 112
    assert chs[3] == [80, 80, 80, 112, 112, 112]
    assert ks[3] == [3, 3, 3, 5, 5, 5]


@pytest.mark.slow  # ~39s
def test_efficientnet_b0_shapes():
    m = EfficientNet(version="b0")
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(params, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 24),
        (1, 8, 8, 40),
        (1, 4, 4, 112),
        (1, 2, 2, 320),
    ]
    assert m.out_channels == [24, 40, 112, 320]


def test_bifpn_first_and_repeat():
    key = jax.random.PRNGKey(1)
    c3 = jnp.ones((1, 8, 8, 40))
    c4 = jnp.ones((1, 4, 4, 112))
    c5 = jnp.ones((1, 2, 2, 320))
    first = BiFPN(out_channels=64, first_time=True)
    p = first.init(key, (c3, c4, c5))
    outs = first.apply(p, (c3, c4, c5))
    assert [o.shape for o in outs] == [
        (1, 8, 8, 64),
        (1, 4, 4, 64),
        (1, 2, 2, 64),
        (1, 1, 1, 64),
        (1, 1, 1, 64),
    ]
    again = BiFPN(out_channels=64, first_time=False)
    p2 = again.init(key, outs)
    outs2 = again.apply(p2, outs)
    assert [o.shape for o in outs2] == [o.shape for o in outs]
    assert all(np.all(np.isfinite(np.asarray(o))) for o in outs2)


def test_bifpn_no_attention_is_plain_sum():
    m = BiFPN(out_channels=32, first_time=True, attention=False)
    c3 = jnp.ones((1, 8, 8, 16))
    c4 = jnp.ones((1, 4, 4, 24))
    c5 = jnp.ones((1, 2, 2, 40))
    p = m.init(jax.random.PRNGKey(2), (c3, c4, c5))
    # no fast-attention weights in the param tree
    flat = jax.tree_util.tree_leaves_with_path(p)
    names = ["/".join(str(k) for k in path) for path, _ in flat]
    assert not any("_w1" in n or "_w2" in n for n in names)


@pytest.mark.slow  # ~38s
def test_effnetfpn_compound0():
    m = EffNetFPN(compound_coef=0, start_from=3)
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(3), x)
    outs = m.apply(params, x)
    assert len(outs) == 5
    assert m.out_channels == 64
    assert outs[0].shape == (1, 8, 8, 64)
    assert all(o.shape[-1] == 64 for o in outs)


def test_registry_surface_matches_reference():
    # every name registered in the reference registry must dispatch
    expected = {
        "R-50-C4", "R-50-C5", "R-101-C4", "R-101-C5",
        "R-50-RETINANET", "R-101-RETINANET",
        "SWINT-FPN-RETINANET", "SWINT-FPN",
        "CVT-FPN-RETINANET",
        "EFFICIENT7-FPN-RETINANET", "EFFICIENT7-FPN-FCOS",
        "EFFICIENT5-FPN-RETINANET", "EFFICIENT5-FPN-FCOS",
        "EFFICIENT3-FPN-RETINANET", "EFFICIENT3-FPN-FCOS",
        "EFFICIENT7-BIFPN-RETINANET", "EFFICIENT7-BIFPN-FCOS",
        "EFFICIENT5-BIFPN-RETINANET", "EFFICIENT5-BIFPN-FCOS",
        "EFFICIENT3-BIFPN-RETINANET", "EFFICIENT3-BIFPN-FCOS",
        "EFFICIENT-DET",
    }
    assert expected <= set(BACKBONES)


@pytest.mark.slow  # ~72s
def test_registry_eff_fpn_forward():
    cfg = default_config()
    cfg.MODEL.BACKBONE.CONV_BODY = "EFFICIENT3-FPN-RETINANET"
    cfg.MODEL.BACKBONE.OUT_CHANNELS = 64
    m = build_backbone(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(4), x)
    outs = m.apply(params, x)
    assert len(outs) == 5
    # P3 at stride 8 from the 64px input
    assert outs[0].shape == (1, 8, 8, 64)
    assert all(o.shape[-1] == 64 for o in outs)


@pytest.mark.slow  # ~79s
def test_registry_eff_bifpn_forward():
    cfg = default_config()
    cfg.MODEL.BACKBONE.CONV_BODY = "EFFICIENT3-BIFPN-RETINANET"
    cfg.MODEL.BACKBONE.OUT_CHANNELS = 64
    cfg.MODEL.BIFPN.NUM_REPEATS = 2
    m = build_backbone(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(5), x)
    outs = m.apply(params, x)
    assert len(outs) == 5 and outs[0].shape == (1, 8, 8, 64)


@pytest.mark.slow  # ~34s
def test_registry_resnet_retinanet_forward():
    cfg = default_config()
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-RETINANET"
    m = build_backbone(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(6), x)
    outs = m.apply(params, x)
    assert len(outs) == 5 and outs[0].shape == (1, 8, 8, 256)


def test_registry_cvt_is_dead_code():
    cfg = default_config()
    cfg.MODEL.BACKBONE.CONV_BODY = "CVT-FPN-RETINANET"
    with pytest.raises(NotImplementedError, match="dead code"):
        build_backbone(cfg)


def test_registry_unknown_name():
    cfg = default_config()
    cfg.MODEL.BACKBONE.CONV_BODY = "NOPE"
    with pytest.raises(KeyError):
        build_backbone(cfg)
