"""Legacy FCOS/Retina/ATSS heads: shapes + dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mqdet_tpu.models.legacy_heads import (
    ATSSHead,
    FCOSHead,
    RetinaHead,
    build_rpn_head,
)


def _feats(rng, c=32):
    return [jnp.asarray(rng.standard_normal((1, h, w, c)).astype(np.float32))
            for h, w in [(16, 16), (8, 8), (4, 4)]]


@pytest.mark.slow  # ~11s, legacy arch
def test_fcos_shapes(rng):
    m = FCOSHead(num_classes=5, channels=32, num_convs=2)
    f = _feats(rng)
    out = m.apply(m.init(jax.random.PRNGKey(0), f), f)
    assert out["cls_logits"][0].shape == (1, 16, 16, 5)
    assert out["bbox_reg"][1].shape == (1, 8, 8, 4)
    assert float(out["bbox_reg"][0].min()) >= 0.0  # exp-activated distances
    assert out["centerness"][2].shape == (1, 4, 4, 1)


def test_retina_shapes(rng):
    m = RetinaHead(num_classes=5, num_anchors=9, channels=32, num_convs=2)
    f = _feats(rng)
    out = m.apply(m.init(jax.random.PRNGKey(0), f), f)
    assert out["cls_logits"][0].shape == (1, 16, 16, 45)
    assert out["bbox_reg"][0].shape == (1, 16, 16, 36)


def test_atss_shapes(rng):
    m = ATSSHead(num_classes=5, channels=32, num_convs=2)
    f = _feats(rng)
    out = m.apply(m.init(jax.random.PRNGKey(0), f), f)
    assert out["centerness"][0].shape == (1, 16, 16, 1)


def test_dispatch():
    from mqdet_tpu.core.config import default_config

    cfg = default_config()
    for arch, cls in [("FCOS", FCOSHead), ("RETINA", RetinaHead), ("ATSS", ATSSHead)]:
        cfg.MODEL.RPN_ARCHITECTURE = arch
        assert isinstance(build_rpn_head(cfg), cls)
    cfg.MODEL.RPN_ARCHITECTURE = "VLDYHEAD"
    with pytest.raises(ValueError):
        build_rpn_head(cfg)
