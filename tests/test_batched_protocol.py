"""make_batched_protocol_fn == per-image make_protocol_fn on the tiny config.

The image-batched protocol runs the (image, chunk) cross product in one
dispatch (B images x G chunk groups, head batch B*CP, image-major). It must
produce exactly what running the single-image protocol per image produces —
same boxes, scores, labels, validity. Reference counterpart: the sequential
per-(image, chunk) loop in maskrcnn_benchmark/engine/inference.py:577-648.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from mqdet_tpu.engine.predict import make_batched_protocol_fn, make_protocol_fn
from mqdet_tpu.utils.builders import (
    build_model,
    init_params_fast,
    synthetic_batch,
    tiny_test_config,
)


@pytest.mark.slow  # B+1 full-model compiles; verified in round 2 (93 s CPU)
def test_batched_protocol_matches_per_image():
    cfg = tiny_test_config()
    cfg.MODEL.ATSS.DETECTIONS_PER_IMG = 10
    cfg.TPU.COMPUTE_DTYPE = "float32"
    hw = tuple(cfg.TPU.IMAGE_BUCKETS[0])
    B, CP, G = 2, 2, 2
    n_labels, k_shot = 3, 2

    model = build_model(cfg)
    b = synthetic_batch(cfg, batch=CP, image_hw=hw, num_labels=n_labels,
                        k_shot=k_shot)
    init_args = tuple(
        jnp.asarray(b[k])
        for k in ["images", "input_ids", "attention_mask", "queries",
                  "query_mask"]
    )
    params = init_params_fast(model, *init_args)

    rng = np.random.default_rng(3)
    images = jnp.asarray(
        rng.standard_normal((B,) + hw + (3,)).astype(np.float32))
    image_sizes = jnp.asarray(
        np.array([[hw[0], hw[1]], [hw[0] - 6, hw[1] - 10]], np.float32))

    # distinct text inputs per (group, chunk) so a layout mistake shows up
    def gstack(key, shape_tail):
        g = np.stack([
            np.stack([
                synthetic_batch(cfg, 1, hw, n_labels, k_shot,
                                seed=17 * gi + ci)[key][0]
                for ci in range(CP)
            ]) for gi in range(G)
        ])
        assert g.shape[2:] == shape_tail or shape_tail is None
        return jnp.asarray(g)

    ii = gstack("input_ids", None)
    am = gstack("attention_mask", None)
    q = gstack("queries", None)
    qm = gstack("query_mask", None)
    ag = gstack("agg_map", None)

    batched = make_batched_protocol_fn(model, hw, cfg, image_batch=B)
    out_b = batched(params, images, image_sizes, ii, am, q, qm, ag)

    single = make_protocol_fn(model, hw, cfg)
    for i in range(B):
        sz = jnp.broadcast_to(image_sizes[i][None, None], (G, CP, 2))
        out_s = single(params, images[i : i + 1], ii, am, q, qm, ag, sz)
        for gi in range(G):
            for ci in range(CP):
                flat = i * CP + ci  # image-major layout
                np.testing.assert_allclose(
                    np.asarray(out_b.boxes[gi, flat]),
                    np.asarray(out_s.boxes[gi, ci]), rtol=0, atol=1e-5)
                np.testing.assert_allclose(
                    np.asarray(out_b.scores[gi, flat]),
                    np.asarray(out_s.scores[gi, ci]), rtol=0, atol=1e-5)
                np.testing.assert_array_equal(
                    np.asarray(out_b.labels[gi, flat]),
                    np.asarray(out_s.labels[gi, ci]))
                np.testing.assert_array_equal(
                    np.asarray(out_b.valid[gi, flat]),
                    np.asarray(out_s.valid[gi, ci]))
