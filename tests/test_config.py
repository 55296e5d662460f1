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
