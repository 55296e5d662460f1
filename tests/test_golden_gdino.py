"""GOLDEN full-model parity: our MQ-GroundingDINO vs the reference GroundingDINO.

VERDICT round-2 ask #4: compose the WHOLE reference GDINO pipeline —
swin backbone -> input_proj + level embeds -> QVBert+GCP text encoder ->
6x(fusion + text-enhancer + deformable) encoder -> gen_encoder_output_proposals
+ topk two-stage init -> decoder with iterative box refinement ->
ContrastiveEmbed -> convert_groundingdino_to_glip_output — at a small-but-real
config on CPU, copy its torch weights through the production GDINO importer
(io/torch_import.py), and require the sigmoided token logits, the refined
boxes, and the final converted detections to agree.

Reference: groundingdino.py:93-709, transformer.py:211-398, utils.py:56-110.
"""
import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference tree not mounted"
)

CLASS_NAMES = {1: "cat", 2: "dog", 3: "zebra"}
IMG = 224
TXT = 48   # tokenizer pad length (<< max_text_len=256, like real captions)
K = 3      # queries per class == bank size -> deterministic selection
NQ = 50    # num_queries (tiny; production 900)
ENC = 2
DEC = 2


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    import ref_harness as rh

    root = tmp_path_factory.mktemp("golden_gdino")
    bert_dir = rh.make_bert_assets(root)
    # the reference tokenizes GDINO captions with padding='max_length' and NO
    # explicit max_length (groundingdino.py:528) -> pads to model_max_length
    with open(os.path.join(bert_dir, "tokenizer_config.json"), "w") as f:
        json.dump({"do_lower_case": True, "tokenizer_class": "BertTokenizer",
                   "model_max_length": TXT}, f)
    bank_path = root / "bank.pth"
    bank = rh.make_tiny_bank(
        bank_path, labels=tuple(CLASS_NAMES), n_queries=K, channels=256, seed=5
    )
    return {"bert_dir": bert_dir, "bank_path": str(bank_path), "bank": bank}


def _ref_cfg(assets):
    import ref_harness as rh

    c = rh.tiny_ref_cfg(assets["bert_dir"], assets["bank_path"], IMG)
    g = c.GROUNDINGDINO
    g.enabled = True
    g.enc_layers = ENC
    g.dec_layers = DEC
    g.num_queries = NQ
    g.dim_feedforward = 256
    g.use_checkpoint = False
    g.use_transformer_ckpt = False
    g.text_encoder_type = assets["bert_dir"]
    g.fusion_droppath = 0.0
    return c


@pytest.fixture(scope="module")
def ref_side(assets):
    import ref_harness as rh

    cfg = _ref_cfg(assets)
    model = rh.build_ref_model(cfg, seed=11, excite_gates=True)

    inf = rh.ref_import("maskrcnn_benchmark.engine.inference")
    labels = sorted(CLASS_NAMES)
    caption, label_to_token = inf.create_queries_and_maps(
        labels, [CLASS_NAMES[i] for i in labels], cfg=cfg, disable_print=True
    )

    rng = np.random.default_rng(17)
    image = rng.standard_normal((IMG, IMG, 3)).astype(np.float32)

    ImageList = rh.ref_import(
        "maskrcnn_benchmark.structures.image_list"
    ).ImageList
    samples = ImageList(
        torch.from_numpy(image.transpose(2, 0, 1)[None]), [(IMG, IMG)]
    )

    captured = {}
    orig_convert = model.convert_groundingdino_to_glip_output

    def capture(out, positive_map, image_sizes):
        captured.update({k: v.detach() for k, v in out.items()})
        return orig_convert(out, positive_map, image_sizes)

    model.convert_groundingdino_to_glip_output = capture
    with torch.no_grad():
        results = model(samples, captions=[caption], positive_map=label_to_token)
    box = results[0]
    return {
        "cfg": cfg,
        "model": model,
        "caption": caption,
        "label_to_token": label_to_token,
        "image": image,
        "probs": captured["pred_logits"].numpy(),   # SIGMOIDED (1, NQ, 256)
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
    g.dim_feedforward = 256
    g.enc_layers = ENC
    g.dec_layers = DEC
    g.num_queries = NQ
    g.max_text_len = 256  # reference hardcodes 256 (groundingdino.py:137)
    cfg.MODEL.SWINT.DROP_PATH_RATE = 0.0
    cfg.MODEL.BACKBONE.OUT_CHANNELS = 256
    cfg.MODEL.LANGUAGE_BACKBONE.HIDDEN_LAYERS = 8
    cfg.MODEL.LANGUAGE_BACKBONE.LANG_DIM = 128
    cfg.MODEL.LANGUAGE_BACKBONE.HIDDEN_SIZE = 128
    cfg.MODEL.LANGUAGE_BACKBONE.NUM_HEADS = 4
    cfg.MODEL.LANGUAGE_BACKBONE.INTERMEDIATE_SIZE = 256
    cfg.MODEL.LANGUAGE_BACKBONE.MAX_QUERY_LEN = TXT
    cfg.VISION_QUERY.ENABLED = True
    cfg.VISION_QUERY.NUM_QUERY_PER_CLASS = K
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.IMAGE_BUCKETS = ((IMG, IMG),)
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

    # the reference preprocesses the caption (lower + trailing '.',
    # groundingdino.py:89-93,462)
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
    selector = QuerySelector(bank, num_query_per_class=K, max_labels=len(labels))
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
        jnp.asarray([[IMG, IMG]], np.float32),
        box_threshold=ref_side["cfg"].GROUNDINGDINO.box_threshold,
    )
    return {
        "cfg": cfg,
        "report": report,
        "out": jax.tree_util.tree_map(np.asarray, out),
        "dets": jax.tree_util.tree_map(np.asarray, dets),
    }


def test_gdino_importer_full_coverage(our_side):
    rep = our_side["report"]
    assert rep["missing"] == [], f"unfilled flax leaves: {rep['missing'][:10]}"
    real_unused = [
        k for k in rep["unused"]
        if "position_ids" not in k
        and "relative_position_index" not in k
        and "attn_mask" not in k
        and "pooler" not in k  # bert pooler: frozen, unused by GDINO forward
    ]
    assert real_unused == [], f"unconsumed reference weights: {real_unused[:10]}"


def test_gdino_token_probs_parity(ref_side, our_side):
    """Sigmoided token logits of the final decoder layer agree (the ref
    output is already sigmoided at eval, groundingdino.py:643)."""
    ours_logits = our_side["out"]["pred_logits"]
    ours = 1.0 / (1.0 + np.exp(-np.where(np.isfinite(ours_logits),
                                         ours_logits, -1e9)))
    ref = ref_side["probs"]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_gdino_box_parity(ref_side, our_side):
    """Refined boxes (cxcywh, [0,1]) after two-stage init + DEC decoder
    layers of iterative refinement agree."""
    np.testing.assert_allclose(
        our_side["out"]["pred_boxes"], ref_side["pred_boxes"], atol=1e-3
    )


def test_gdino_final_detections_parity(ref_side, our_side):
    """Converted detections (threshold + per-box top-1 class + clip) agree."""
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
