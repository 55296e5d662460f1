"""Demo predictor (engine/demo.py + tools/demo.py) — GLIPDemo twin
(reference: maskrcnn_benchmark/engine/predictor_glip.py:28)."""
import json
import subprocess
import sys

import numpy as np
import pytest

from mqdet_tpu.utils.builders import (
    build_model,
    init_params_fast,
    synthetic_batch,
    tiny_test_config,
)


@pytest.mark.slow
def test_demo_predictor_end_to_end(tmp_path):
    import jax.numpy as jnp

    from mqdet_tpu.engine.demo import MQDetDemo

    cfg = tiny_test_config()
    cfg.INPUT.MIN_SIZE_TEST = 48
    cfg.INPUT.MAX_SIZE_TEST = 64
    model = build_model(cfg)
    b = synthetic_batch(cfg, 1, tuple(cfg.TPU.IMAGE_BUCKETS[0]), num_labels=2, k_shot=2)
    args = tuple(
        jnp.asarray(b[k])
        for k in ["images", "input_ids", "attention_mask", "queries", "query_mask"]
    )
    params = init_params_fast(model, *args)

    demo = MQDetDemo(cfg, model, params, confidence_threshold=0.0)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (60, 80, 3)).astype(np.uint8)
    out = demo(img, ["cat", "dog"])
    assert out["boxes"].shape[1] == 4
    assert len(out["names"]) == len(out["scores"]) == len(out["boxes"])
    assert all(n in ("cat", "dog") for n in out["names"])
    # boxes come back in original-image coordinates
    if len(out["boxes"]):
        assert out["boxes"][:, [0, 2]].max() <= 80 + 1e-3
        assert out["boxes"][:, [1, 3]].max() <= 60 + 1e-3


def test_demo_cli_help():
    """tools/demo.py is importable and exposes the documented flags."""
    res = subprocess.run(
        [sys.executable, "tools/demo.py", "--help"],
        capture_output=True, text=True, timeout=120,
    )
    assert res.returncode == 0
    for flag in ("--config-file", "--image", "--categories", "--threshold"):
        assert flag in res.stdout
