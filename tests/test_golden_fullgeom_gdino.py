"""GOLDEN MQ-GroundingDINO parity at PRODUCTION geometry.

Companion of test_golden_fullgeom.py for the GDINO family (round-3 verdict
ask #1, second half): the tiny golden GDINO test runs 224x224 / 2 enc / 2
dec / 50 queries / 48-token text; the production mq-groundingdino-t config
is Swin-T 96/(2,2,6,2), BERT-base 768x12, 6+6 transformer layers at
dim_feedforward 2048, 900 two-stage queries, 256-token text, 800x1344
bucket (configs/pretrain/mq-groundingdino-t.yaml +
config/defaults.py:944-1001). Shape-dependent logic exercised only here:
4-level MSDA sampling grids at real strides, topk-900 over 22k encoder
tokens, 256-token sub-sentence masks over a 40-class caption, k=5 banks.

Weights are random-but-shared through the production importer; random
values don't change which shape-dependent code paths execute.
"""
import json
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

IMG_H, IMG_W = 800, 1344
TRUE_W = 1333
TXT = 256   # GDINO pads to model_max_length (groundingdino.py:528)
K = 5
NQ = 900
ENC = 6
DEC = 6
DFF = 2048

_NOUNS = [
    "cat", "dog", "zebra", "person", "bicycle", "car", "bird", "horse",
    "sheep", "cow", "elephant", "bear", "giraffe", "umbrella", "pie",
    "apple", "banana", "chair", "couch", "table", "tv", "laptop", "mouse",
    "remote", "keyboard", "phone", "book", "clock", "vase", "toy", "ball",
]
_TWO_WORD = [
    "hot dog", "big cat", "small bird", "cold apple", "big table",
    "small toy", "hot pie", "cold mouse", "big bear",
]
CLASS_NAMES = {i + 1: n for i, n in enumerate(_NOUNS + _TWO_WORD)}
assert len(CLASS_NAMES) == 40


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    import ref_harness as rh

    root = tmp_path_factory.mktemp("golden_fullgeom_gdino")
    bert_dir = rh.make_bert_assets(
        root, hidden_size=768, num_layers=12, num_heads=12,
        intermediate_size=3072, seed=23,
    )
    with open(os.path.join(bert_dir, "tokenizer_config.json"), "w") as f:
        json.dump({"do_lower_case": True, "tokenizer_class": "BertTokenizer",
                   "model_max_length": TXT}, f)
    bank_path = root / "bank.pth"
    bank = rh.make_tiny_bank(
        bank_path, labels=tuple(CLASS_NAMES), n_queries=K, channels=256,
        seed=29,
    )
    return {"bert_dir": bert_dir, "bank_path": str(bank_path), "bank": bank}


def _ref_cfg(assets):
    import ref_harness as rh

    c = rh.tiny_ref_cfg(assets["bert_dir"], assets["bank_path"], IMG_H)
    M = c.MODEL
    M.BACKBONE.OUT_CHANNELS = 256
    M.SWINT.EMBED_DIM = 96
    M.SWINT.DEPTHS = (2, 2, 6, 2)
    M.SWINT.NUM_HEADS = (3, 6, 12, 24)
    M.SWINT.WINDOW_SIZE = 7
    M.SWINT.OUT_CHANNELS = (96, 192, 384, 768)
    M.LANGUAGE_BACKBONE.HIDDEN_LAYERS = 12
    M.LANGUAGE_BACKBONE.LANG_DIM = 768
    M.LANGUAGE_BACKBONE.MAX_QUERY_LEN = TXT
    V = c.VISION_QUERY
    V.NUM_QUERY_PER_CLASS = K
    g = c.GROUNDINGDINO
    g.enabled = True
    g.enc_layers = ENC
    g.dec_layers = DEC
    g.num_queries = NQ
    g.dim_feedforward = DFF
    g.use_checkpoint = False
    g.use_transformer_ckpt = False
    g.text_encoder_type = assets["bert_dir"]
    g.fusion_droppath = 0.0
    return c


@pytest.fixture(scope="module")
def ref_side(assets):
    import ref_harness as rh

    cfg = _ref_cfg(assets)
    model = rh.build_ref_model(cfg, seed=31, excite_gates=True)

    inf = rh.ref_import("maskrcnn_benchmark.engine.inference")
    labels = sorted(CLASS_NAMES)
    caption, label_to_token = inf.create_queries_and_maps(
        labels, [CLASS_NAMES[i] for i in labels], cfg=cfg, disable_print=True
    )

    rng = np.random.default_rng(37)
    image = np.zeros((IMG_H, IMG_W, 3), np.float32)
    image[:, :TRUE_W] = rng.standard_normal((IMG_H, TRUE_W, 3)).astype(
        np.float32
    )

    ImageList = rh.ref_import(
        "maskrcnn_benchmark.structures.image_list"
    ).ImageList
    samples = ImageList(
        torch.from_numpy(image.transpose(2, 0, 1)[None]), [(IMG_H, IMG_W)]
    )

    captured = {}
    orig_convert = model.convert_groundingdino_to_glip_output

    def capture(out, positive_map, image_sizes):
        captured.update({k: v.detach() for k, v in out.items()})
        return orig_convert(out, positive_map, image_sizes)

    model.convert_groundingdino_to_glip_output = capture
    with torch.no_grad():
        results = model(
            samples, captions=[caption], positive_map=label_to_token
        )
    box = results[0]
    return {
        "cfg": cfg,
        "model": model,
        "caption": caption,
        "label_to_token": label_to_token,
        "image": image,
        "probs": captured["pred_logits"].numpy(),
        "pred_boxes": captured["pred_boxes"].numpy(),
        "boxes": box.bbox.numpy(),
        "scores": box.get_field("scores").numpy(),
        "labels": box.get_field("labels").numpy(),
    }


def _our_cfg(assets):
    from mqdet_tpu.core.config import default_config

    cfg = default_config()
    g = cfg.GROUNDINGDINO
    g.enabled = True
    g.hidden_dim = 256
    g.nheads = 8
    g.dim_feedforward = DFF
    g.enc_layers = ENC
    g.dec_layers = DEC
    g.num_queries = NQ
    g.max_text_len = 256
    cfg.MODEL.SWINT.EMBED_DIM = 96
    cfg.MODEL.SWINT.DEPTHS = (2, 2, 6, 2)
    cfg.MODEL.SWINT.NUM_HEADS = (3, 6, 12, 24)
    cfg.MODEL.SWINT.WINDOW_SIZE = 7
    cfg.MODEL.SWINT.DROP_PATH_RATE = 0.0
    cfg.MODEL.BACKBONE.OUT_CHANNELS = 256
    cfg.MODEL.LANGUAGE_BACKBONE.HIDDEN_LAYERS = 12
    cfg.MODEL.LANGUAGE_BACKBONE.LANG_DIM = 768
    cfg.MODEL.LANGUAGE_BACKBONE.HIDDEN_SIZE = 768
    cfg.MODEL.LANGUAGE_BACKBONE.NUM_HEADS = 12
    cfg.MODEL.LANGUAGE_BACKBONE.INTERMEDIATE_SIZE = 3072
    cfg.MODEL.LANGUAGE_BACKBONE.MAX_QUERY_LEN = TXT
    cfg.VISION_QUERY.ENABLED = True
    cfg.VISION_QUERY.NUM_QUERY_PER_CLASS = K
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.IMAGE_BUCKETS = ((IMG_H, IMG_W),)
    with open(os.path.join(assets["bert_dir"], "vocab.txt")) as f:
        cfg.MODEL.LANGUAGE_BACKBONE.VOCAB_SIZE = sum(1 for _ in f)
    return cfg


@pytest.fixture(scope="module")
def our_side(assets, ref_side):
    import jax
    import jax.numpy as jnp

    from mqdet_tpu.data.tokenizer import get_tokenizer
    from mqdet_tpu.io.torch_import import import_gdino_checkpoint
    from mqdet_tpu.models.gdino import MQGroundingDINO, gdino_postprocess
    from mqdet_tpu.mq.bank import QueryBank
    from mqdet_tpu.mq.selector import QuerySelector

    cfg = _our_cfg(assets)
    tok = get_tokenizer(assets["bert_dir"])
    special_ids = [
        tok.convert_tokens_to_ids(t) for t in ("[CLS]", "[SEP]", ".", "?")
    ]

    caption = ref_side["caption"].lower().strip()
    if not caption.endswith("."):
        caption = caption + "."
    enc = tok(
        [caption], max_length=TXT, padding="max_length", truncation=True,
        return_tensors="np",
    )
    input_ids = enc["input_ids"].astype(np.int32)
    attention_mask = enc["attention_mask"].astype(np.int32)

    labels = sorted(CLASS_NAMES)
    all_map = np.zeros((len(labels), TXT), np.float32)
    for j, l in enumerate(labels):
        all_map[j, ref_side["label_to_token"][l]] = 1.0
    agg_map = all_map / (all_map.sum(-1, keepdims=True) + 1e-6)

    bank = QueryBank(channels=256)
    for l, v in assets["bank"].items():
        bank.add(int(l), v.numpy())
    selector = QuerySelector(
        bank, num_query_per_class=K, max_labels=len(labels)
    )
    queries, query_mask, _ = selector.select(labels, all_map, training=False)

    model = MQGroundingDINO.from_config(cfg, special_ids=special_ids)
    args = (
        jnp.asarray(ref_side["image"][None]),
        jnp.asarray(input_ids),
        jnp.asarray(attention_mask),
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
    params, report = import_gdino_checkpoint(
        params, state, enc_layers=ENC, dec_layers=DEC
    )

    out = jax.jit(model.apply)(params, *args)
    dets = gdino_postprocess(
        out["pred_logits"], out["pred_boxes"], jnp.asarray(agg_map[None]),
        jnp.asarray([[IMG_H, IMG_W]], np.float32),
        box_threshold=ref_side["cfg"].GROUNDINGDINO.box_threshold,
    )
    return {
        "report": report,
        "out": jax.tree_util.tree_map(np.asarray, out),
        "dets": jax.tree_util.tree_map(np.asarray, dets),
    }


def test_gdino_fullgeom_importer_full_coverage(our_side):
    rep = our_side["report"]
    assert rep["missing"] == [], f"unfilled flax leaves: {rep['missing'][:10]}"
    real_unused = [
        k for k in rep["unused"]
        if "position_ids" not in k
        and "relative_position_index" not in k
        and "attn_mask" not in k
        and "pooler" not in k
    ]
    assert real_unused == [], f"unconsumed reference weights: {real_unused[:10]}"


def test_gdino_fullgeom_token_probs_parity(ref_side, our_side):
    """Sigmoided token logits of the final decoder layer at 900 queries /
    256 text tokens / 22k encoder tokens."""
    ours_logits = our_side["out"]["pred_logits"]
    ours = 1.0 / (1.0 + np.exp(-np.where(np.isfinite(ours_logits),
                                         ours_logits, -1e9)))
    ref = ref_side["probs"]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_gdino_fullgeom_box_parity(ref_side, our_side):
    np.testing.assert_allclose(
        our_side["out"]["pred_boxes"], ref_side["pred_boxes"], atol=2e-3
    )


def test_gdino_fullgeom_final_detections_parity(ref_side, our_side):
    """Converted detections (threshold + per-box top-1 class + clip)."""
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
    np.testing.assert_allclose(scores, r_scores, atol=1e-3)

    def pairwise_iou(a, b):
        tl = np.maximum(a[:, None, :2], b[None, :, :2])
        br = np.minimum(a[:, None, 2:], b[None, :, 2:])
        inter = np.prod(np.clip(br - tl, 0, None), -1)
        area = lambda x: np.prod(np.clip(x[:, 2:] - x[:, :2], 0, None), -1)
        return inter / (area(a)[:, None] + area(b)[None, :] - inter + 1e-9)

    if len(scores) == 0:
        return
    # box gate in PIXELS: pred_boxes agree to 2e-3 in normalized cxcywh
    # (asserted above) which is up to ~2.7 px at 1344 — an IoU gate would
    # spuriously reject tiny boxes, so match on coordinate distance.
    # (random weights saturate many scores at exactly 1.0, so the score
    # gate alone cannot disambiguate)
    dist = np.abs(boxes[:, None, :] - r_boxes[None, :, :]).max(-1)
    # label equality is required only below the sigmoid saturation plateau:
    # random weights at production depth saturate many class scores to
    # ~1.0, where the per-box argmax (convert_groundingdino_to_glip_output)
    # tie-breaks on sub-1e-6 noise — genuinely ambiguous, not a parity
    # signal. (Trained weights don't saturate; the tiny golden GDINO test
    # asserts exact labels.)
    label_ok = (labels[:, None] == r_labels[None, :]) | (
        r_scores[None, :] > 0.999
    )
    cand = (dist <= 3.0) & label_ok & (
        np.abs(scores[:, None] - r_scores[None, :]) <= 1e-3
    )
    matched = np.full(len(scores), -1)
    for i in range(len(r_scores)):
        js = np.where(cand[:, i] & (matched == -1))[0]
        if not len(js):
            near = np.argsort(dist[:, i])[:3]
            diag = [
                (int(labels[j]), float(scores[j]), boxes[j].round(2).tolist(),
                 float(dist[j, i]), int(matched[j]))
                for j in near
            ]
            raise AssertionError(
                f"reference detection {i} (label {r_labels[i]}, score "
                f"{r_scores[i]:.4f}, box {r_boxes[i]}) has no unmatched "
                f"twin; nearest ours (label, score, box, dist, matched): "
                f"{diag}"
            )
        j = js[np.argmin(dist[js, i])]
        matched[j] = i
    assert np.all(matched >= 0)
