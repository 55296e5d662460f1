"""GOLDEN full-model parity with USE_DFCONV=True (production head config).

VERDICT round-2 ask #5: the production mq-glip-t.yaml runs deformable conv in
every DyConv step (vldyhead.py:122-217); the original golden test covers the
composite pipeline only with DCN off. Here the ACTUAL reference detector runs
with ModulatedDeformConv backed by a pure-torch CUDA-semantics twin
(ref_harness.torch_mdconv_apply — including the offset-buffer strided
reinterpretation the CUDA kernel performs when level-L offsets drive the
conv over level L+1), and our stack runs the exact-gather DCN path with
offset_compat="strided". End-to-end detections must agree through NMS.
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference tree not mounted"
)

CLASS_NAMES = {1: "cat", 2: "dog", 3: "zebra"}
IMG = 224
T = 48
K = 3


def test_torch_dcn_twin_matches_our_gather(rng):
    """The torch oracle and our JAX gather composite are independent
    implementations of the same CUDA semantics — they must agree."""
    import jax.numpy as jnp

    import ref_harness as rh
    from mqdet_tpu.ops.deform_conv import modulated_deform_conv

    b, h, w, c, cout = 2, 9, 11, 8, 12
    for stride in (1, 2):
        ho = -(-h // stride)
        wo = -(-w // stride)
        x = rng.standard_normal((b, h, w, c)).astype(np.float32)
        off = (rng.standard_normal((b, ho, wo, 18)) * 2.0).astype(np.float32)
        m = rng.uniform(0, 1, (b, ho, wo, 9)).astype(np.float32)
        wt = rng.standard_normal((3, 3, c, cout)).astype(np.float32)
        bias = rng.standard_normal((cout,)).astype(np.float32)

        ours = np.asarray(
            modulated_deform_conv(
                jnp.asarray(x), jnp.asarray(off), jnp.asarray(m),
                jnp.asarray(wt), jnp.asarray(bias), stride=stride,
            )
        )
        ref = rh.torch_mdconv_apply(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(off.transpose(0, 3, 1, 2)),
            torch.from_numpy(m.transpose(0, 3, 1, 2)),
            torch.from_numpy(wt.transpose(3, 2, 0, 1)),
            torch.from_numpy(bias), stride=stride, padding=1,
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_strided_misread_twin(rng):
    """Our reinterpret_offsets_strided == feeding the torch twin a too-large
    offset buffer (the CUDA wrong-strides read) at the reference's eval
    batch size of 1."""
    import jax.numpy as jnp

    import ref_harness as rh
    from mqdet_tpu.ops.deform_conv import (
        modulated_deform_conv,
        reinterpret_offsets_strided,
    )

    b, hl, wl, c, cout = 1, 10, 12, 8, 8
    h, w = 5, 6  # input at level L+1 (half res); output == input (stride 1)
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    off = (rng.standard_normal((b, hl, wl, 18)) * 2.0).astype(np.float32)
    m = rng.uniform(0, 1, (b, hl, wl, 9)).astype(np.float32)
    wt = rng.standard_normal((3, 3, c, cout)).astype(np.float32)
    bias = np.zeros((cout,), np.float32)

    off_r, m_r = reinterpret_offsets_strided(
        jnp.asarray(off), jnp.asarray(m), h, w
    )
    ours = np.asarray(
        modulated_deform_conv(
            jnp.asarray(x), off_r, m_r, jnp.asarray(wt), jnp.asarray(bias),
            stride=1,
        )
    )
    ref = rh.torch_mdconv_apply(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(off.transpose(0, 3, 1, 2)),  # over-sized buffer
        torch.from_numpy(m.transpose(0, 3, 1, 2)),
        torch.from_numpy(wt.transpose(3, 2, 0, 1)),
        torch.from_numpy(bias), stride=1, padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    import ref_harness as rh

    root = tmp_path_factory.mktemp("golden_dcn")
    bert_dir = rh.make_bert_assets(root)
    bank_path = root / "bank.pth"
    bank = rh.make_tiny_bank(
        bank_path, labels=tuple(CLASS_NAMES), n_queries=K, channels=64, seed=3
    )
    return {"bert_dir": bert_dir, "bank_path": str(bank_path), "bank": bank}


@pytest.fixture(scope="module")
def ref_side(assets):
    import ref_harness as rh

    cfg = rh.tiny_ref_cfg(assets["bert_dir"], assets["bank_path"], IMG)
    cfg.MODEL.LANGUAGE_BACKBONE.MAX_QUERY_LEN = T
    cfg.MODEL.DYHEAD.USE_DFCONV = True
    model = rh.build_ref_model(cfg, seed=0, excite_gates=True)

    inf = rh.ref_import("maskrcnn_benchmark.engine.inference")
    labels = sorted(CLASS_NAMES)
    caption, label_to_token = inf.create_queries_and_maps(
        labels, [CLASS_NAMES[i] for i in labels], cfg=cfg, disable_print=True
    )
    rng = np.random.default_rng(7)
    image = rng.standard_normal((IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        out = model(
            torch.from_numpy(image.transpose(2, 0, 1)[None]),
            captions=[caption],
            positive_map=label_to_token,
        )
    box = out[0]
    return {
        "cfg": cfg,
        "model": model,
        "caption": caption,
        "label_to_token": label_to_token,
        "image": image,
        "boxes": box.bbox.numpy(),
        "scores": box.get_field("scores").numpy(),
        "labels": box.get_field("labels").numpy(),
    }


@pytest.fixture(scope="module")
def our_side(assets, ref_side, monkeypatch_module):
    import jax
    import jax.numpy as jnp

    from mqdet_tpu.data.grounding import build_prompt
    from mqdet_tpu.data.tokenizer import get_tokenizer
    from mqdet_tpu.engine.predict import make_predict_fn
    from mqdet_tpu.io.torch_import import import_glip_checkpoint
    from mqdet_tpu.mq.bank import QueryBank
    from mqdet_tpu.mq.selector import QuerySelector
    from mqdet_tpu.utils.builders import build_model, mq_glip_t_config

    monkeypatch_module.setenv("MQDET_DEFORM_IMPL", "gather")

    cfg = mq_glip_t_config()
    cfg.MODEL.SWINT.EMBED_DIM = 32
    cfg.MODEL.SWINT.DEPTHS = (1, 1, 1, 1)
    cfg.MODEL.SWINT.NUM_HEADS = (1, 2, 4, 8)
    cfg.MODEL.SWINT.WINDOW_SIZE = 7
    cfg.MODEL.SWINT.DROP_PATH_RATE = 0.0
    cfg.MODEL.BACKBONE.OUT_CHANNELS = 64
    cfg.MODEL.DYHEAD.NUM_CONVS = 2
    cfg.MODEL.DYHEAD.CHANNELS = 64
    cfg.MODEL.DYHEAD.USE_DFCONV = True
    cfg.MODEL.DYHEAD.SCORE_AGG = "MEAN"
    cfg.MODEL.LANGUAGE_BACKBONE.HIDDEN_LAYERS = 8
    cfg.MODEL.LANGUAGE_BACKBONE.LANG_DIM = 128
    cfg.MODEL.LANGUAGE_BACKBONE.HIDDEN_SIZE = 128
    cfg.MODEL.LANGUAGE_BACKBONE.NUM_HEADS = 4
    cfg.MODEL.LANGUAGE_BACKBONE.INTERMEDIATE_SIZE = 256
    cfg.MODEL.LANGUAGE_BACKBONE.MAX_QUERY_LEN = T
    cfg.VISION_QUERY.START_QV_LAYER = 6
    cfg.VISION_QUERY.NUM_QUERY_PER_CLASS = K
    cfg.MODEL.ATSS.INFERENCE_TH = 0.01
    cfg.MODEL.ATSS.PRE_NMS_TOP_N = 200
    cfg.MODEL.ATSS.NMS_TH = 0.6
    cfg.MODEL.ATSS.DETECTIONS_PER_IMG = 20
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.IMAGE_BUCKETS = ((IMG, IMG),)
    with open(os.path.join(assets["bert_dir"], "vocab.txt")) as f:
        cfg.MODEL.LANGUAGE_BACKBONE.VOCAB_SIZE = sum(1 for _ in f)

    tok = get_tokenizer(assets["bert_dir"])
    labels = sorted(CLASS_NAMES)
    bundle = build_prompt(labels, CLASS_NAMES, tok, max_text_len=T)

    bank = QueryBank(channels=64)
    for l, v in assets["bank"].items():
        bank.add(int(l), v.numpy())
    selector = QuerySelector(bank, num_query_per_class=K, max_labels=len(labels))
    queries, query_mask, _ = selector.select(labels, bundle.all_map, training=False)

    model = build_model(cfg)
    args = (
        jnp.asarray(ref_side["image"][None]),
        jnp.asarray(bundle.input_ids[None]),
        jnp.asarray(bundle.attention_mask[None]),
        jnp.asarray(queries[None]),
        jnp.asarray(query_mask[None]),
    )
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)
    params = jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), params)
    state = {
        k: v.detach().cpu().numpy()
        for k, v in ref_side["model"].state_dict().items()
    }
    params, report = import_glip_checkpoint(params, state)

    predict = make_predict_fn(lambda p, *a, **kw: model.apply(p, *a, **kw),
                              (IMG, IMG), cfg)
    dets = predict(
        params, *args, jnp.asarray(bundle.agg_map[None]),
        jnp.asarray([[IMG, IMG]], np.float32),
    )
    return {
        "report": report,
        "dets": jax.tree_util.tree_map(np.asarray, dets),
    }


def test_importer_covers_dcn_weights(our_side):
    rep = our_side["report"]
    assert rep["missing"] == [], f"unfilled flax leaves: {rep['missing'][:10]}"


def test_final_detections_parity_dcn_on(ref_side, our_side):
    dets = our_side["dets"]
    valid = np.asarray(dets.valid[0]).astype(bool)
    boxes = np.asarray(dets.boxes[0])[valid]
    scores = np.asarray(dets.scores[0])[valid]
    labels = np.asarray(dets.labels[0])[valid]
    order = np.argsort(-scores)
    boxes, scores, labels = boxes[order], scores[order], labels[order]

    r_order = np.argsort(-ref_side["scores"])
    r_boxes = ref_side["boxes"][r_order]
    r_scores = ref_side["scores"][r_order]
    r_labels = ref_side["labels"][r_order]

    assert len(scores) == len(r_scores), (
        f"detection count {len(scores)} vs reference {len(r_scores)}"
    )
    np.testing.assert_allclose(scores, r_scores, atol=2e-4)
    np.testing.assert_array_equal(labels, r_labels)
    np.testing.assert_allclose(boxes, r_boxes, atol=0.05)
