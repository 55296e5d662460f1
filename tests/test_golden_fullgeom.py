"""GOLDEN full-model parity at PRODUCTION mq-glip-t geometry.

Round-3 verdict: every golden e2e ran at toy shapes (224x224, EMBED_DIM 32,
48-token text), so the shape-dependent logic the LVIS AP claim lives at —
Swin-T window padding at real strides (100x168 level-0 features from an
800x1344 bucket), the strided DCN offset-buffer reinterpretation across all
5 FPN levels, 256-token text with a real 40-class LVIS-protocol chunk, and
the k=5 query bank — had never been parity-checked.

This suite instantiates the ACTUAL reference GeneralizedVLRCNN_New at the
configs/pretrain/mq-glip-t.yaml geometry (Swin-T EMBED_DIM 96 /
DEPTHS (2,2,6,2), 12-layer 768-dim BERT, DYHEAD 256ch x 6 convs,
USE_DFCONV on, MAX_QUERY_LEN 256) with random-but-shared weights on CPU,
pushes one padded 800x1344 image + a 40-class caption + a k=5 bank through
both stacks, and requires the final detections (through NMS, cap 300) to
agree. Weights are random (no real checkpoint in this environment); weight
VALUES don't change which shape-dependent code paths execute.

Slow tier: the reference torch forward alone is minutes on this 1-CPU box.
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir("/root/reference"), reason="reference tree not mounted"
    ),
]

# 800x1333 eval resolution (INPUT.MIN/MAX_SIZE_TEST in
# configs/pretrain/mq-glip-t.yaml) padded to SIZE_DIVISIBILITY=32 by the
# collator -> the 800x1344 bucket every LVIS eval image lands in.
IMG_H, IMG_W = 800, 1344
TRUE_W = 1333  # pre-padding width; right edge is zero-padded like the collator
T = 256  # MAX_QUERY_LEN (config/defaults.py:271)
K = 5  # NUM_QUERY_PER_CLASS (lvis_minival.yaml)
CHANNELS = 256  # BACKBONE.OUT_CHANNELS

_NOUNS = [
    "cat", "dog", "zebra", "person", "bicycle", "car", "bird", "horse",
    "sheep", "cow", "elephant", "bear", "giraffe", "umbrella", "pie",
    "apple", "banana", "chair", "couch", "table", "tv", "laptop", "mouse",
    "remote", "keyboard", "phone", "book", "clock", "vase", "toy", "ball",
]
# one full LVIS-protocol chunk: 40 classes (TEST.CHUNKED_EVALUATION: 40),
# including multi-word names so positive spans cover several tokens
_TWO_WORD = [
    "hot dog", "big cat", "small bird", "cold apple", "big table",
    "small toy", "hot pie", "cold mouse", "big bear",
]
CLASS_NAMES = {i + 1: n for i, n in enumerate(_NOUNS + _TWO_WORD)}
assert len(CLASS_NAMES) == 40


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    import ref_harness as rh

    root = tmp_path_factory.mktemp("golden_fullgeom")
    # real bert-base-uncased geometry (random weights, tiny vocab)
    bert_dir = rh.make_bert_assets(
        root, hidden_size=768, num_layers=12, num_heads=12,
        intermediate_size=3072, seed=11,
    )
    bank_path = root / "bank.pth"
    bank = rh.make_tiny_bank(
        bank_path, labels=tuple(CLASS_NAMES), n_queries=K,
        channels=CHANNELS, seed=13,
    )
    return {"bert_dir": bert_dir, "bank_path": str(bank_path), "bank": bank}


def _fullgeom_ref_cfg(assets):
    import ref_harness as rh

    c = rh.tiny_ref_cfg(assets["bert_dir"], assets["bank_path"], IMG_H)
    M = c.MODEL
    # production mq-glip-t geometry (configs/pretrain/mq-glip-t.yaml)
    M.BACKBONE.OUT_CHANNELS = CHANNELS
    M.SWINT.EMBED_DIM = 96
    M.SWINT.DEPTHS = (2, 2, 6, 2)
    M.SWINT.NUM_HEADS = (3, 6, 12, 24)
    M.SWINT.WINDOW_SIZE = 7
    M.SWINT.OUT_CHANNELS = (96, 192, 384, 768)
    M.LANGUAGE_BACKBONE.HIDDEN_LAYERS = 12
    M.LANGUAGE_BACKBONE.LANG_DIM = 768
    M.LANGUAGE_BACKBONE.MAX_QUERY_LEN = T
    M.DYHEAD.CHANNELS = CHANNELS
    M.DYHEAD.NUM_CONVS = 6
    M.DYHEAD.USE_DFCONV = True
    M.DYHEAD.FUSE_CONFIG.JOINT_EMB_SIZE = CHANNELS
    # production eval thresholds (lvis_minival.yaml / defaults); INFERENCE_TH
    # lowered so random-weight scores (sigmoid of ~bias0=-4.6 logits) clear
    # it and the topk/NMS/cap pipeline actually runs at full occupancy
    M.ATSS.INFERENCE_TH = 0.001
    M.ATSS.PRE_NMS_TOP_N = 1000
    M.ATSS.NMS_TH = 0.6
    M.ATSS.DETECTIONS_PER_IMG = 300
    V = c.VISION_QUERY
    V.NUM_QUERY_PER_CLASS = K
    return c


@pytest.fixture(scope="module")
def ref_side(assets):
    import ref_harness as rh

    cfg = _fullgeom_ref_cfg(assets)
    model = rh.build_ref_model(cfg, seed=5, excite_gates=True)

    inf = rh.ref_import("maskrcnn_benchmark.engine.inference")
    labels = sorted(CLASS_NAMES)
    caption, label_to_token = inf.create_queries_and_maps(
        labels, [CLASS_NAMES[i] for i in labels], cfg=cfg, disable_print=True
    )

    rng = np.random.default_rng(17)
    image = np.zeros((IMG_H, IMG_W, 3), np.float32)
    image[:, :TRUE_W] = rng.standard_normal((IMG_H, TRUE_W, 3)).astype(
        np.float32
    )

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

    # exact unclipped bilinear DCN (same semantics as the CUDA kernel); the
    # window/pallas paths clip offsets to TPU.DEFORM_RADIUS which random
    # offset-conv weights can exceed
    monkeypatch_module.setenv("MQDET_DEFORM_IMPL", "gather")

    cfg = mq_glip_t_config()
    # production geometry == the defaults of mq_glip_t_config; pin the ones
    # the tiny golden tests override so drift there can't silently shrink
    # this test's coverage
    cfg.MODEL.SWINT.EMBED_DIM = 96
    cfg.MODEL.SWINT.DEPTHS = (2, 2, 6, 2)
    cfg.MODEL.SWINT.NUM_HEADS = (3, 6, 12, 24)
    cfg.MODEL.SWINT.WINDOW_SIZE = 7
    cfg.MODEL.SWINT.DROP_PATH_RATE = 0.0
    cfg.MODEL.BACKBONE.OUT_CHANNELS = CHANNELS
    cfg.MODEL.DYHEAD.NUM_CONVS = 6
    cfg.MODEL.DYHEAD.CHANNELS = CHANNELS
    cfg.MODEL.DYHEAD.USE_DFCONV = True
    cfg.MODEL.DYHEAD.SCORE_AGG = "MEAN"
    cfg.MODEL.LANGUAGE_BACKBONE.HIDDEN_LAYERS = 12
    cfg.MODEL.LANGUAGE_BACKBONE.LANG_DIM = 768
    cfg.MODEL.LANGUAGE_BACKBONE.HIDDEN_SIZE = 768
    cfg.MODEL.LANGUAGE_BACKBONE.NUM_HEADS = 12
    cfg.MODEL.LANGUAGE_BACKBONE.INTERMEDIATE_SIZE = 3072
    cfg.MODEL.LANGUAGE_BACKBONE.MAX_QUERY_LEN = T
    cfg.VISION_QUERY.START_QV_LAYER = 6
    cfg.VISION_QUERY.NUM_QUERY_PER_CLASS = K
    cfg.MODEL.ATSS.INFERENCE_TH = 0.001
    cfg.MODEL.ATSS.PRE_NMS_TOP_N = 1000
    cfg.MODEL.ATSS.NMS_TH = 0.6
    cfg.MODEL.ATSS.DETECTIONS_PER_IMG = 300
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.IMAGE_BUCKETS = ((IMG_H, IMG_W),)
    with open(os.path.join(assets["bert_dir"], "vocab.txt")) as f:
        cfg.MODEL.LANGUAGE_BACKBONE.VOCAB_SIZE = sum(1 for _ in f)

    tok = get_tokenizer(assets["bert_dir"])
    labels = sorted(CLASS_NAMES)
    bundle = build_prompt(labels, CLASS_NAMES, tok, max_text_len=T)

    bank = QueryBank(channels=CHANNELS)
    for l, v in assets["bank"].items():
        bank.add(int(l), v.numpy())
    selector = QuerySelector(
        bank, num_query_per_class=K, max_labels=len(labels)
    )
    queries, query_mask, has_query = selector.select(
        labels, bundle.all_map, training=False
    )

    model = build_model(cfg)
    args = (
        jnp.asarray(ref_side["image"][None]),
        jnp.asarray(bundle.input_ids[None]),
        jnp.asarray(bundle.attention_mask[None]),
        jnp.asarray(queries[None]),
        jnp.asarray(query_mask[None]),
    )
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)
    params = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), params
    )
    state = {
        k: v.detach().cpu().numpy()
        for k, v in ref_side["model"].state_dict().items()
    }
    params, report = import_glip_checkpoint(params, state)

    predict = make_predict_fn(
        lambda p, *a, **kw: model.apply(p, *a, **kw), (IMG_H, IMG_W), cfg
    )
    dets = predict(
        params, *args, jnp.asarray(bundle.agg_map[None]),
        jnp.asarray([[IMG_H, IMG_W]], np.float32),
    )
    dets = jax.tree_util.tree_map(np.asarray, dets)
    return {"bundle": bundle, "report": report, "dets": dets}


def test_importer_full_coverage_fullgeom(our_side):
    """The importer fills every flax leaf and consumes every reference weight
    at REAL depths (12 BERT layers, (2,2,6,2) Swin stages, 6 tower stages)."""
    rep = our_side["report"]
    assert rep["missing"] == [], f"unfilled flax leaves: {rep['missing'][:10]}"
    real_unused = [
        k
        for k in rep["unused"]
        if "position_ids" not in k and "relative_position_index" not in k
        and "attn_mask" not in k
        and "anchor_generator.cell_anchors" not in k
    ]
    assert real_unused == [], f"unconsumed reference weights: {real_unused[:10]}"


def test_caption_parity_fullgeom(ref_side, our_side):
    assert our_side["bundle"].caption == ref_side["caption"]


def test_positive_map_parity_fullgeom(ref_side, our_side):
    """40-class / 256-token positive map, incl. multi-word-name spans."""
    label_to_token = ref_side["label_to_token"]
    labels = sorted(CLASS_NAMES)
    want = np.zeros((len(labels), T), np.float32)
    for j, l in enumerate(labels):
        want[j, label_to_token[l]] = 1.0
    want = want / (want.sum(-1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(our_side["bundle"].all_map, want, atol=1e-6)


def test_final_detections_parity_fullgeom(ref_side, our_side):
    """Detections through NMS agree at production geometry with DCN ON."""
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

    assert len(scores) > 0, "degenerate test: no detections survived"
    assert len(scores) == len(r_scores), (
        f"detection count {len(scores)} vs reference {len(r_scores)}"
    )
    np.testing.assert_allclose(scores, r_scores, atol=1e-3)

    # Near-tie scores (random weights cluster tightly) legitimately argsort
    # differently across stacks, so element-wise label/box comparison at a
    # fixed rank is over-strict. Require a PERFECT 1:1 matching instead:
    # every reference detection pairs with exactly one of ours with the same
    # label, IoU > 0.9, score within 1e-3 and box within 0.5 px.
    def pairwise_iou(a, b):
        tl = np.maximum(a[:, None, :2], b[None, :, :2])
        br = np.minimum(a[:, None, 2:], b[None, :, 2:])
        inter = np.prod(np.clip(br - tl, 0, None), -1)
        area = lambda x: np.prod(np.clip(x[:, 2:] - x[:, :2], 0, None), -1)
        return inter / (area(a)[:, None] + area(b)[None, :] - inter + 1e-9)

    iou = pairwise_iou(boxes, r_boxes)
    cand = (iou > 0.9) & (labels[:, None] == r_labels[None, :]) & (
        np.abs(scores[:, None] - r_scores[None, :]) <= 1e-3
    )
    matched = np.full(len(scores), -1)
    for i in range(len(r_scores)):  # ref dets already score-descending
        js = np.where(cand[:, i] & (matched == -1))[0]
        assert len(js), (
            f"reference detection {i} (label {r_labels[i]}, score "
            f"{r_scores[i]:.4f}, box {r_boxes[i]}) has no unmatched twin"
        )
        j = js[np.argmax(iou[js, i])]
        matched[j] = i
        # 0.5 px at 800x1344 — well inside the 0.3-AP budget
        np.testing.assert_allclose(boxes[j], r_boxes[i], atol=0.5)
    assert np.all(matched >= 0)
