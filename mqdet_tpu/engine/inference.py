"""Finetuning-free evaluation orchestration.

Capability twin of maskrcnn_benchmark/engine/inference.py:39-763:
  * builds per-chunk class prompts (CHUNKED_EVALUATION, :165-283)
  * runs the detector over every (image, chunk) pair
  * converts chunk-local labels back to global category ids
  * feeds a DetectionEvaluator (COCO mAP / LVIS fixed AP)
  * optional test-time online query update (online_update, :383-499)

TPU-first execution: the image tower runs ONCE per image; class chunks are
batched CHUNK_PARALLELISM at a time through the compiled head (the reference
loops 31 sequential batch-1 forwards per LVIS image). All outputs stay on
device until the final small detection arrays are fetched.
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from mqdet_tpu.core.detections import Detections
from mqdet_tpu.data import grounding as G
from mqdet_tpu.data.transforms import EvalTransform
from mqdet_tpu.engine.evaluator import DetectionEvaluator
from mqdet_tpu.engine.predict import make_split_predict_fns
from mqdet_tpu.mq.selector import QuerySelector


class ChunkedEvaluationPlan:
    """Precomputed prompts/maps/queries for every class chunk (static)."""

    def __init__(self, cfg, dataset, tokenizer, selector: Optional[QuerySelector]):
        self.cfg = cfg
        chunk_size = cfg.TEST.CHUNKED_EVALUATION
        max_labels = cfg.VISION_QUERY.MAX_CLASSES_PER_PROMPT
        t_len = cfg.MODEL.LANGUAGE_BACKBONE.MAX_QUERY_LEN

        all_labels = sorted(dataset.ind_to_class.keys())
        # TEST.SELECT_CLASSES: restrict evaluation to a category subset
        if cfg.TEST.SELECT_CLASSES:
            keep = set(int(c) for c in cfg.TEST.SELECT_CLASSES)
            all_labels = [l for l in all_labels if l in keep]
        # DATASETS.CAPTION_PROMPT (ODinW prefix/name/suffix prompts,
        # engine/inference.py:212-283): json string or list of dicts,
        # indexed in caption (chunk-local) order
        cap_prompt = cfg.DATASETS.CAPTION_PROMPT
        if isinstance(cap_prompt, str):
            import json as _json

            cap_prompt = _json.loads(cap_prompt) if cap_prompt else None
        if isinstance(cap_prompt, dict):
            # tools/convert_knowledge.py artifact: {class_name: prompt};
            # resolve to caption order, raw name for classes not covered
            cap_prompt = [
                cap_prompt.get(dataset.ind_to_class[l])
                or {"prefix": "", "name": dataset.ind_to_class[l], "suffix": ""}
                for l in all_labels
            ]
        if cap_prompt is None and cfg.GLIPKNOW.KNOWLEDGE_FILE:
            # GLIPKNOW knowledge expansion (generalized_vl_rcnn_new.py:521-666):
            # clean_name + ": <knowledge>" suffix per class, span on the name
            from mqdet_tpu.data.knowledge import knowledge_caption_prompts

            cap_prompt = knowledge_caption_prompts(
                cfg, [dataset.ind_to_class[l] for l in all_labels]
            )
        self.chunks = G.chunk_classes(all_labels, chunk_size)
        label_pos = {l: i for i, l in enumerate(all_labels)}
        self.bundles = [
            G.build_prompt(
                chunk, dataset.ind_to_class, tokenizer, max_text_len=t_len,
                separation_tokens=cfg.DATASETS.SEPARATION_TOKENS,
                caption_prompt=(
                    [cap_prompt[label_pos[l]] for l in chunk]
                    if cap_prompt is not None
                    else None
                ),
            )
            for chunk in self.chunks
        ]
        self.max_labels = max(max_labels, max(b.num_labels for b in self.bundles))

        n = len(self.bundles)
        vocab = cfg.MODEL.LANGUAGE_BACKBONE.VOCAB_SIZE
        top = max(int(b.input_ids.max(initial=0)) for b in self.bundles)
        assert top < vocab, (
            f"tokenizer produced id {top} >= VOCAB_SIZE {vocab}: the "
            "embedding table would read out of range (NaN text features). "
            "Align MODEL.LANGUAGE_BACKBONE.VOCAB_SIZE with the tokenizer."
        )
        self.input_ids = np.stack([b.input_ids for b in self.bundles])
        self.attention_mask = np.stack([b.attention_mask for b in self.bundles])
        padded = [G.pad_prompt_maps(b, self.max_labels) for b in self.bundles]
        self.all_map = np.stack([p[0] for p in padded])      # (N, L, T)
        self.agg_map = np.stack([p[1] for p in padded])      # (N, L, T)
        # chunk-local slot -> global contiguous label
        self.slot_to_label = np.zeros((n, self.max_labels), np.int32)
        for i, b in enumerate(self.bundles):
            self.slot_to_label[i, : b.num_labels] = b.label_ids

        if selector is not None and selector.bank is not None:
            qs, qms = [], []
            for i, b in enumerate(self.bundles):
                q, qm, _ = selector.select(b.label_ids, b.all_map, training=False)
                qs.append(q)
                qms.append(qm)
            self.queries = np.stack(qs)          # (N, V, C)
            self.query_mask = np.stack(qms)      # (N, V, T)
        else:
            self.queries = None
            self.query_mask = None

    def __len__(self):
        return len(self.bundles)


def run_inference(
    cfg,
    model,
    params,
    dataset,
    tokenizer,
    selector: Optional[QuerySelector] = None,
    evaluator: Optional[DetectionEvaluator] = None,
    max_images: Optional[int] = None,
    verbose: bool = True,
) -> Dict[str, float]:
    """Full finetuning-free evaluation over a dataset."""
    import jax

    plan = ChunkedEvaluationPlan(cfg, dataset, tokenizer, selector)
    transform = EvalTransform(cfg)

    # per-bucket compiled fns, created lazily: EvalTransform picks the
    # smallest TPU.IMAGE_BUCKETS entry that fits each resized image, and
    # the anchor grid baked into the head is bucket-specific
    bucket_fns = {}

    def get_fns(bucket):
        if bucket not in bucket_fns:
            bucket_fns[bucket] = make_split_predict_fns(model, bucket, cfg)
        return bucket_fns[bucket]

    encode_fn, head_fn = get_fns(tuple(cfg.TPU.IMAGE_BUCKETS[0]))

    cp = max(1, cfg.TEST.CHUNK_PARALLELISM)
    n_chunks = len(plan)
    # pad the chunk list to a multiple of cp (re-evaluates a chunk; harmless)
    chunk_order = list(range(n_chunks))
    while len(chunk_order) % cp:
        chunk_order.append(n_chunks - 1)

    use_q = plan.queries is not None
    dummy_q = jnp.zeros((cp, 1, cfg.MODEL.BACKBONE.OUT_CHANNELS), jnp.float32)
    dummy_qm = jnp.zeros((cp, 1, cfg.MODEL.LANGUAGE_BACKBONE.MAX_QUERY_LEN), jnp.float32)

    groups = []
    for g in range(0, len(chunk_order), cp):
        sel = chunk_order[g : g + cp]
        groups.append(
            dict(
                sel=sel,
                input_ids=jnp.asarray(plan.input_ids[sel]),
                attention_mask=jnp.asarray(plan.attention_mask[sel]),
                agg_map=jnp.asarray(plan.agg_map[sel]),
                queries=jnp.asarray(plan.queries[sel]) if use_q else dummy_q,
                query_mask=jnp.asarray(plan.query_mask[sel]) if use_q else dummy_qm,
            )
        )

    # vision-conditioned masking at INFERENCE (MASK_DURING_INFERENCE,
    # generalized_vl_rcnn_new.py:397-407): class-name tokens whose class has
    # >=1 vision query are replaced by [MASK] with prob TEXT_DROPOUT, using
    # the all-classes map (all_map) rather than the positives-only map.
    if (
        cfg.VISION_QUERY.ENABLED
        and cfg.VISION_QUERY.MASK_DURING_INFERENCE
        and cfg.VISION_QUERY.TEXT_DROPOUT > 0
        and use_q
    ):
        assert cfg.VISION_QUERY.PURE_TEXT_RATE == 0.0, (
            "MASK_DURING_INFERENCE requires PURE_TEXT_RATE == 0 "
            "(generalized_vl_rcnn_new.py:399)"
        )
        mask_id = getattr(tokenizer, "mask_token_id", None) or 103
        rng_m = np.random.RandomState(cfg.SOLVER.SEED)
        for gdict in groups:
            ids_np = np.asarray(gdict["input_ids"]).copy()
            allm = plan.all_map[gdict["sel"]]          # (cp, L, T)
            qm = np.asarray(gdict["query_mask"])       # (cp, V, T)
            for i in range(ids_np.shape[0]):
                tok_has_q = qm[i].any(axis=0)          # (T,)
                for j in range(allm.shape[1]):
                    span = allm[i, j] > 0
                    if not span.any() or not tok_has_q[span].any():
                        continue
                    if rng_m.random_sample() < cfg.VISION_QUERY.TEXT_DROPOUT:
                        ids_np[i, span] = mask_id
            gdict["input_ids"] = jnp.asarray(ids_np)

    if evaluator is None:
        evaluator = DetectionEvaluator(style="coco")
    evaluator.register_categories(dataset.ind_to_class.keys())

    ids = dataset.ids[:max_images] if max_images else dataset.ids
    if cfg.VISION_QUERY.DEBUG:
        # VISION_QUERY.DEBUG (engine/inference.py:578-580): stop after a
        # couple of images for fast smoke runs
        ids = ids[:2]
    # host-sharded evaluation (reference: DistributedSampler shards images
    # per rank, samplers/distributed.py:12-72): each process scores a
    # strided shard; evaluator states are all_gathered and merged below
    if jax.process_count() > 1:
        ids = ids[jax.process_index() :: jax.process_count()]
    t0 = time.time()

    def detect(img, tfm):
        """One full chunked pass over `img` with transform `tfm` ->
        (boxes, scores, labels) in the original image frame."""
        padded, (oh, ow), (sy, sx) = tfm(img)
        encode_fn, head_fn = get_fns(padded.shape[:2])
        images = jnp.asarray(padded[None])
        feats = encode_fn(params, images)
        sizes = jnp.asarray([[oh, ow]] * cp, jnp.float32)

        det_boxes, det_scores, det_labels = [], [], []
        for gdict in groups:
            dets: Detections = head_fn(
                params, feats, gdict["input_ids"], gdict["attention_mask"],
                gdict["queries"], gdict["query_mask"], gdict["agg_map"], sizes,
            )
            boxes = np.asarray(dets.boxes)
            scores = np.asarray(dets.scores)
            labels = np.asarray(dets.labels)
            valid = np.asarray(dets.valid)
            for row, ci in enumerate(gdict["sel"]):
                v = valid[row]
                if not v.any():
                    continue
                # chunk-local 1-based slot -> global contiguous label
                local = labels[row][v] - 1
                glob = plan.slot_to_label[ci][local]
                b = boxes[row][v]
                det_boxes.append(b * np.array([sx, sy, sx, sy], np.float32))
                det_scores.append(scores[row][v])
                det_labels.append(glob)
        return det_boxes, det_scores, det_labels

    use_tta = cfg.TEST.USE_MULTISCALE
    for count, img_id in enumerate(ids):
        img = dataset.load_image(img_id)
        if use_tta:
            # TEST.USE_MULTISCALE: multi-scale + flip TTA with box merging
            # (box_aug.py im_detect_bbox_aug semantics)
            from mqdet_tpu.engine.box_aug import im_detect_bbox_aug

            def predict_at_scale(im, min_size, max_size, hflip):
                c2 = cfg.clone()
                c2.INPUT.MIN_SIZE_TEST = min_size
                c2.INPUT.MAX_SIZE_TEST = max_size
                im_in = im[:, ::-1] if hflip else im
                bs, ss, ls = detect(im_in, EvalTransform(c2))
                if not bs:
                    return dict(
                        boxes=np.zeros((0, 4), np.float32),
                        scores=np.zeros((0,), np.float32),
                        labels=np.zeros((0,), np.int32),
                    )
                b = np.concatenate(bs)
                if hflip:
                    w = im.shape[1]
                    b = np.stack(
                        [w - b[:, 2], b[:, 1], w - b[:, 0], b[:, 3]], -1
                    )
                return dict(
                    boxes=b, scores=np.concatenate(ss),
                    labels=np.concatenate(ls),
                )

            merged = im_detect_bbox_aug(
                predict_at_scale, img,
                scales=tuple(cfg.TEST.SCALES or (cfg.INPUT.MIN_SIZE_TEST,)),
                max_size=cfg.TEST.MAX_SIZE or cfg.INPUT.MAX_SIZE_TEST,
                flip=cfg.TEST.FLIP,
                nms_type=cfg.TEST.SPECIAL_NMS,
                thresh=cfg.TEST.TH,
                max_detections=cfg.MODEL.ATSS.DETECTIONS_PER_IMG,
            )
            det_boxes = [merged["boxes"]]
            det_scores = [merged["scores"]]
            det_labels = [merged["labels"]]
        else:
            det_boxes, det_scores, det_labels = detect(img, transform)

        if det_boxes:
            db = np.concatenate(det_boxes)
            ds = np.concatenate(det_scores)
            dl = np.concatenate(det_labels)
        else:
            db = np.zeros((0, 4), np.float32)
            ds = np.zeros((0,), np.float32)
            dl = np.zeros((0,), np.int32)

        gt_boxes, gt_labels = dataset.annotations(img_id)
        neg = [
            dataset.cat_id_to_contiguous[c]
            for c in dataset.img_neg_cats.get(img_id, ())
            if c in dataset.cat_id_to_contiguous
        ]
        evaluator.add_image(
            img_id, gt_boxes, gt_labels, db, ds, dl, neg_category_ids=neg
        )
        if verbose and (count + 1) % 50 == 0:
            rate = (count + 1) / (time.time() - t0)
            print(f"[inference] {count + 1}/{len(ids)} images, {rate:.3f} img/s")

    # cross-host merge before scoring (twin of the reference's
    # _accumulate_predictions_from_multiple_gpus, engine/inference.py:293-312)
    if jax.process_count() > 1:
        from mqdet_tpu.parallel import comm

        for r, st in enumerate(comm.all_gather(evaluator.state_dict())):
            if r != jax.process_index():
                evaluator.merge_state(st)

    results = evaluator.summarize()
    results["images_per_second"] = len(ids) / max(time.time() - t0, 1e-6)

    # gate telemetry (RETURN_ATTN_GATE_VALUE, engine/inference.py:571-572,
    # 626-628,710-712): mean |tanh(gate)| of every GCP block, from one
    # representative forward with the intermediates collection enabled
    if cfg.VISION_QUERY.RETURN_ATTN_GATE_VALUE and use_q and len(ids):
        g0 = groups[0]
        padded0, _, _ = transform(dataset.load_image(ids[0]))
        encode0, _ = get_fns(padded0.shape[:2])
        feats0 = encode0(params, jnp.asarray(padded0[None]))
        _, inter = model.apply(
            params,
            list(feats0),
            g0["input_ids"],
            g0["attention_mask"],
            g0["queries"],
            g0["query_mask"],
            method=type(model).forward_head,
            mutable=["intermediates"],
        )
        import jax

        gates = [
            float(np.mean(np.asarray(v, np.float32)))
            for path, v in jax.tree_util.tree_leaves_with_path(inter)
        ]
        if gates:
            results["attn_gate_value"] = float(np.mean(gates))
    return results


def online_update(
    cfg,
    model,
    params,
    dataset,
    tokenizer,
    selector: QuerySelector,
    extract_fn,
    num_turns: Optional[int] = None,
    max_images: Optional[int] = None,
):
    """Test-time online query update (engine/inference.py:383-499).

    Runs the eval loop NUM_TURNS times; detections above SCORE_THRESHOLD are
    pooled back through extract_query(exclude_similar=True) into a growing
    bank capped at MAX_TEST_QUERY_NUMBER; the selector sees the updated bank
    on the next turn.
    """
    import jax.numpy as jnp_

    turns = num_turns or cfg.VISION_QUERY.NUM_TURNS
    thresh = cfg.VISION_QUERY.SCORE_THRESHOLD
    cap = cfg.VISION_QUERY.MAX_TEST_QUERY_NUMBER
    transform = EvalTransform(cfg)
    bucket = tuple(cfg.TPU.IMAGE_BUCKETS[0])
    encode_fn, head_fn = make_split_predict_fns(model, bucket, cfg)

    for turn in range(turns):
        plan = ChunkedEvaluationPlan(cfg, dataset, tokenizer, selector)
        cp = max(1, cfg.TEST.CHUNK_PARALLELISM)
        ids = dataset.ids[:max_images] if max_images else dataset.ids
        for img_id in ids:
            img = dataset.load_image(img_id)
            padded, (oh, ow), _ = transform(img)
            images = jnp_.asarray(padded[None])
            feats = encode_fn(params, images)
            sizes = jnp_.asarray([[oh, ow]] * cp, jnp_.float32)
            for g in range(0, len(plan), cp):
                sel = list(range(g, min(g + cp, len(plan))))
                while len(sel) < cp:
                    sel.append(len(plan) - 1)
                dets = head_fn(
                    params, feats,
                    jnp_.asarray(plan.input_ids[sel]),
                    jnp_.asarray(plan.attention_mask[sel]),
                    jnp_.asarray(plan.queries[sel]) if plan.queries is not None
                    else jnp_.zeros((cp, 1, cfg.MODEL.BACKBONE.OUT_CHANNELS)),
                    jnp_.asarray(plan.query_mask[sel]) if plan.query_mask is not None
                    else jnp_.zeros((cp, 1, cfg.MODEL.LANGUAGE_BACKBONE.MAX_QUERY_LEN)),
                    jnp_.asarray(plan.agg_map[sel]),
                    sizes,
                )
                boxes = np.asarray(dets.boxes)
                scores = np.asarray(dets.scores)
                labels = np.asarray(dets.labels)
                valid = np.asarray(dets.valid)
                for row, ci in enumerate(sel):
                    keep = valid[row] & (scores[row] > thresh)
                    if not keep.any():
                        continue
                    local = labels[row][keep] - 1
                    glob = plan.slot_to_label[ci][local]
                    pooled = np.asarray(
                        extract_fn(
                            params, images,
                            jnp_.asarray(boxes[row][keep], jnp_.float32),
                            float(oh), float(ow),
                        )
                    )
                    for feat, lab in zip(pooled, glob):
                        selector.bank.add(
                            int(lab), feat[None], exclude_similar=True,
                            capacity=cap,
                        )
    return selector
