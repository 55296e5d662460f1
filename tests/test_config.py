import pytest

from mqdet_tpu.core.config import default_config, trainable_patterns


def test_defaults_and_overrides():
    cfg = default_config()
    assert cfg.MODEL.SWINT.EMBED_DIM == 96
    cfg.merge_from_list(["SOLVER.BASE_LR", "0.01", "MODEL.SWINT.DEPTHS", "(2, 2, 18, 2)"])
    assert cfg.SOLVER.BASE_LR == 0.01
    assert cfg.MODEL.SWINT.DEPTHS == (2, 2, 18, 2)


def test_unknown_key_rejected():
    cfg = default_config()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["MODEL.NOPE", "1"])


def test_yaml_merge(tmp_path):
    cfg = default_config()
    f = tmp_path / "c.yaml"
    f.write_text(
        "MODEL:\n  SWINT:\n    EMBED_DIM: 192\nVISION_QUERY:\n  ENABLED: true\n"
    )
    cfg.merge_from_file(str(f))
    assert cfg.MODEL.SWINT.EMBED_DIM == 192
    assert cfg.VISION_QUERY.ENABLED is True


def test_tuning_recipes():
    cfg = default_config()
    cfg.SOLVER.TUNING_HIGHLEVEL_OVERRIDE = "vision_query"
    pats = trainable_patterns(cfg)
    assert "qv_layer" in pats and "pre_select" in pats


def test_clone_independent():
    cfg = default_config()
    c2 = cfg.clone()
    c2.SOLVER.BASE_LR = 42.0
    assert cfg.SOLVER.BASE_LR != 42.0


def test_frozen_patterns_and_control_prob():
    import random

    from mqdet_tpu.core.config import default_config, frozen_patterns
    from mqdet_tpu.data import grounding as G
    from mqdet_tpu.engine.optim import partition_params

    cfg = default_config()
    assert frozen_patterns(cfg) == []
    cfg.MODEL.BACKBONE.FREEZE = True
    cfg.MODEL.LANGUAGE_BACKBONE.FREEZE = True
    fps = frozen_patterns(cfg)
    assert "backbone/" in fps and "language_backbone/" in fps

    params = {
        "params": {
            "backbone": {"w": __import__("numpy").zeros(2)},
            "language_backbone": {"w": __import__("numpy").zeros(2)},
            "rpn": {"w": __import__("numpy").zeros(2)},
        }
    }
    tr, fr, merge = partition_params(params, [""], fps)
    assert list(tr) == ["params/rpn/w"]
    assert len(fr) == 2

    cfg2 = default_config()
    cfg2.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 2
    fps2 = frozen_patterns(cfg2)
    assert "backbone/patch_embed" in fps2 and "backbone/layers_0" in fps2

    # control probabilities (od_to_grounding.py:340-379)
    r = random.Random(0)
    n_neg, n_pos = G.generate_control_options_given_probabilities(
        (1.0, 0.0, 0.0, 0.0), 5, 9, r
    )
    assert (n_neg, n_pos) == (1, 0)
    n_neg, n_pos = G.generate_control_options_given_probabilities(
        (0.0, 0.0, 1.0, 0.0), 5, 9, r
    )
    assert (n_neg, n_pos) == (9, 5)
    for _ in range(20):
        n_neg, _ = G.generate_control_options_given_probabilities(
            (0.0, 0.0, 0.0, 0.0), 5, 9, r
        )
        assert 1 <= n_neg <= 9
    negs = G.sample_negatives(
        [1, 2], list(range(1, 30)), 20, rng=random.Random(1),
        control_probabilities=(1.0, 0.0, 0.0, 0.0),
    )
    assert len(negs) == 1


def test_all_shipped_configs_parse():
    """Every yaml under configs/ must merge cleanly into the default tree
    (reference ships 4 pretrain configs incl. mq-glip-t_coco.yaml)."""
    import glob
    import os

    from mqdet_tpu.core.config import default_config

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    files = glob.glob(os.path.join(root, "**", "*.yaml"), recursive=True)
    assert len(files) >= 60  # 4 pretrain + 8 eval + 13 + 36 odinw + extras
    names = {os.path.basename(f) for f in files}
    assert "mq-glip-t_coco.yaml" in names
    for f in files:
        cfg = default_config()
        cfg.merge_from_file(f)
