"""Multi-image AP-delta harness: |AP_ours − AP_ref| ≤ 0.3, end to end.

Round-4 verdict missing item #1: the BASELINE contract is an AP table
(reference README.md:118-123; eval loop engine/inference.py:502-763), but
all golden tests proved parity per-image on ONE image, and the evaluator
was oracle-tested separately. Nothing ran BOTH stacks over a multi-image
set and compared the end metric the claim is defined on. This harness does:

  * 12 synthetic 224x224 images, 6 classes, TEST.CHUNKED_EVALUATION=3
    (2 prompt chunks — the cross-chunk merge runs on both sides);
  * the ACTUAL reference GeneralizedVLRCNN_New (random-but-shared weights,
    tiny-but-real geometry, k=3 vision-query bank) runs its own chunked
    protocol: create_queries_and_maps per chunk -> forward -> BoxList,
    chunk results concatenated mdetr-style (inference.py:640-650);
  * ground truth is DEFINED as the reference's top-4 detections per image,
    so AP_ref saturates and the delta measures end-to-end detection
    agreement in AP units — the BASELINE quantity itself;
  * our stack runs its production path: CocoDetectionDataset ->
    ChunkedEvaluationPlan -> run_inference (chunk groups, query bank, NMS,
    box rescale) -> DetectionEvaluator(style='lvis_fixed');
  * the reference detections are scored with the SAME evaluator on the
    same GT, and |AP_ours − AP_ref| ≤ 0.3 is asserted (plus AP_ref high
    enough that the bound is meaningful).

Slow tier: 24 reference torch forwards + one jit compile (~2-4 min CPU).
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

IMG = 224
T = 48
K = 3
N_IMAGES = 12
CHUNK = 3
CLASS_NAMES = {1: "cat", 2: "dog", 3: "zebra", 4: "person", 5: "car", 6: "bird"}
GT_PER_IMAGE = 4


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    import ref_harness as rh

    root = tmp_path_factory.mktemp("ap_delta")
    bert_dir = rh.make_bert_assets(root)
    bank_path = root / "bank.pth"
    bank = rh.make_tiny_bank(
        bank_path, labels=tuple(CLASS_NAMES), n_queries=K, channels=64, seed=3
    )
    rng = np.random.default_rng(42)
    # uint8 RGB images: BOTH stacks must consume byte-identical pixels —
    # the reference gets these normalized with OUR EvalTransform's exact
    # normalize() (the reference applies the same Detectron normalization
    # in its dataloader), and our side reads the saved PNGs through
    # run_inference's own EvalTransform.
    images = [
        rng.integers(0, 256, (IMG, IMG, 3), dtype=np.uint8)
        for _ in range(N_IMAGES)
    ]
    return {
        "root": root,
        "bert_dir": bert_dir,
        "bank_path": str(bank_path),
        "bank": bank,
        "images": images,
    }


@pytest.fixture(scope="module")
def ref_results(assets):
    """Reference chunked protocol over all images: per image, the
    cross-chunk concatenated (boxes, scores, labels) in 224-space."""
    import ref_harness as rh

    cfg = rh.tiny_ref_cfg(assets["bert_dir"], assets["bank_path"], IMG)
    cfg.MODEL.LANGUAGE_BACKBONE.MAX_QUERY_LEN = T
    model = rh.build_ref_model(cfg, seed=0, excite_gates=True)

    inf = rh.ref_import("maskrcnn_benchmark.engine.inference")
    labels_all = sorted(CLASS_NAMES)
    chunks = [
        labels_all[i : i + CHUNK] for i in range(0, len(labels_all), CHUNK)
    ]
    chunk_prompts = []
    for chunk in chunks:
        caption, l2t = inf.create_queries_and_maps(
            chunk, [CLASS_NAMES[i] for i in chunk], cfg=cfg, disable_print=True
        )
        chunk_prompts.append((caption, l2t))

    from mqdet_tpu.data.transforms import normalize

    our_cfg = _our_cfg(assets)
    per_image = []
    with torch.no_grad():
        for image in assets["images"]:
            normed = normalize(
                image, our_cfg.INPUT.PIXEL_MEAN, our_cfg.INPUT.PIXEL_STD,
                our_cfg.INPUT.TO_BGR255,
            ).astype(np.float32)
            boxes, scores, labels = [], [], []
            for caption, l2t in chunk_prompts:
                out = model(
                    torch.from_numpy(normed.transpose(2, 0, 1).copy()[None]),
                    captions=[caption],
                    positive_map=l2t,
                )[0]
                boxes.append(out.bbox.numpy())
                scores.append(out.get_field("scores").numpy())
                labels.append(out.get_field("labels").numpy())
            per_image.append(
                (
                    np.concatenate(boxes),
                    np.concatenate(scores),
                    np.concatenate(labels),
                )
            )
    return {"model": model, "cfg": cfg, "per_image": per_image}


def _gt_from_ref(per_image):
    """GT := the reference's top-GT_PER_IMAGE detections per image."""
    gts = []
    for boxes, scores, labels in per_image:
        order = np.argsort(-scores)[:GT_PER_IMAGE]
        gts.append((boxes[order], labels[order]))
    return gts


@pytest.fixture(scope="module")
def coco_dataset(assets, ref_results, tmp_path_factory):
    from PIL import Image

    from mqdet_tpu.data.coco import CocoDetectionDataset

    root = tmp_path_factory.mktemp("ap_delta_coco")
    img_dir = root / "images"
    img_dir.mkdir()
    gts = _gt_from_ref(ref_results["per_image"])
    images_meta, annotations = [], []
    ann_id = 1
    for i, image in enumerate(assets["images"]):
        Image.fromarray(image).save(img_dir / f"{i}.png")  # lossless uint8
        images_meta.append(
            {"id": i, "file_name": f"{i}.png", "height": IMG, "width": IMG}
        )
        for box, lab in zip(*gts[i]):
            x0, y0, x1, y1 = [float(v) for v in box]
            annotations.append(
                {
                    "id": ann_id, "image_id": i, "category_id": int(lab),
                    "bbox": [x0, y0, max(x1 - x0, 1.0), max(y1 - y0, 1.0)],
                    "area": max((x1 - x0) * (y1 - y0), 1.0), "iscrowd": 0,
                }
            )
            ann_id += 1
    ann = {
        "images": images_meta,
        "annotations": annotations,
        "categories": [
            {"id": i, "name": n} for i, n in CLASS_NAMES.items()
        ],
    }
    ann_file = root / "ann.json"
    ann_file.write_text(json.dumps(ann))
    return CocoDetectionDataset(str(ann_file), str(img_dir))


def _our_cfg(assets):
    from mqdet_tpu.utils.builders import mq_glip_t_config

    cfg = mq_glip_t_config()
    cfg.MODEL.SWINT.EMBED_DIM = 32
    cfg.MODEL.SWINT.DEPTHS = (1, 1, 1, 1)
    cfg.MODEL.SWINT.NUM_HEADS = (1, 2, 4, 8)
    cfg.MODEL.SWINT.WINDOW_SIZE = 7
    cfg.MODEL.SWINT.DROP_PATH_RATE = 0.0
    cfg.MODEL.BACKBONE.OUT_CHANNELS = 64
    cfg.MODEL.DYHEAD.NUM_CONVS = 2
    cfg.MODEL.DYHEAD.CHANNELS = 64
    cfg.MODEL.DYHEAD.USE_DFCONV = False
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
    cfg.TEST.CHUNKED_EVALUATION = CHUNK
    cfg.TEST.CHUNK_PARALLELISM = 2
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.IMAGE_BUCKETS = ((IMG, IMG),)
    cfg.INPUT.MIN_SIZE_TEST = IMG
    cfg.INPUT.MAX_SIZE_TEST = IMG
    with open(os.path.join(assets["bert_dir"], "vocab.txt")) as f:
        vocab_size = sum(1 for _ in f)
    cfg.MODEL.LANGUAGE_BACKBONE.VOCAB_SIZE = vocab_size
    return cfg


def test_ap_delta_vs_reference(assets, ref_results, coco_dataset):
    import jax
    import jax.numpy as jnp

    from mqdet_tpu.data.tokenizer import get_tokenizer
    from mqdet_tpu.engine.evaluator import DetectionEvaluator
    from mqdet_tpu.engine.inference import run_inference
    from mqdet_tpu.io.torch_import import import_glip_checkpoint
    from mqdet_tpu.mq.bank import QueryBank
    from mqdet_tpu.mq.selector import QuerySelector
    from mqdet_tpu.utils.builders import build_model

    cfg = _our_cfg(assets)
    tok = get_tokenizer(assets["bert_dir"])
    bank = QueryBank(channels=64)
    for l, v in assets["bank"].items():
        bank.add(int(l), v.numpy())
    selector = QuerySelector(
        bank, num_query_per_class=K, max_labels=len(CLASS_NAMES)
    )

    model = build_model(cfg)
    # shape-init with a dummy batch, then fill from the reference weights
    from mqdet_tpu.utils.builders import synthetic_batch

    b = synthetic_batch(cfg, 1, (IMG, IMG), num_labels=CHUNK, k_shot=K)
    args = tuple(
        jnp.asarray(b[k])
        for k in ["images", "input_ids", "attention_mask", "queries",
                  "query_mask"]
    )
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)
    params = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), params
    )
    state = {
        k: v.detach().cpu().numpy()
        for k, v in ref_results["model"].state_dict().items()
    }
    params, report = import_glip_checkpoint(params, state)
    assert not report["missing"], report["missing"][:8]

    gts = _gt_from_ref(ref_results["per_image"])

    # --- AP_ref: reference detections on the shared GT -------------------
    ev_ref = DetectionEvaluator(style="lvis_fixed")
    ev_ref.register_categories(CLASS_NAMES.keys())
    for i, (boxes, scores, labels) in enumerate(ref_results["per_image"]):
        ev_ref.add_image(
            image_id=i,
            gt_boxes=gts[i][0], gt_labels=gts[i][1],
            det_boxes=boxes, det_scores=scores, det_labels=labels,
        )
    ap_ref = ev_ref.summarize()["AP"]

    # --- AP_ours: the production chunked pipeline ------------------------
    ev_ours = DetectionEvaluator(style="lvis_fixed")
    results = run_inference(
        cfg, model, params, coco_dataset, tok, selector,
        evaluator=ev_ours, verbose=False,
    )
    ap_ours = results["AP"]

    # GT is the reference's own top detections, so its AP must saturate —
    # otherwise the delta bound below is vacuous.
    assert ap_ref > 0.6, f"harness degenerate: AP_ref={ap_ref:.3f}"
    # BASELINE.md states the contract in absolute AP points on a 0-100
    # scale ("within 0.3 of 30.4"); our evaluator reports AP in [0, 1].
    delta_points = abs(ap_ours - ap_ref) * 100.0
    assert delta_points <= 0.3, (
        f"AP delta {delta_points:.2f} points: ours={ap_ours:.4f} "
        f"ref={ap_ref:.4f}"
    )
