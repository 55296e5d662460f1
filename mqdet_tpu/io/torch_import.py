"""Reference-checkpoint importer: GLIP/MQ-Det torch .pth -> flax param tree.

Capability twin of DetectronCheckpointer's loading path
(maskrcnn_benchmark/utils/checkpoint.py:140-190 +
utils/model_serialization.py fuzzy key alignment): maps the reference's
module names (incl. the released EMA-wrapped checkpoints) onto this
framework's parameter paths, with layout transforms:

  torch Conv2d  (O, I, kH, kW) -> flax Conv   (kH, kW, I, O)
  torch Linear  (O, I)         -> flax Dense  (I, O)
  torch LayerNorm weight       -> flax LayerNorm scale
  torch GroupNorm weight       -> flax GroupNorm scale

The mapping below is written against GLIP-T/L naming
(module.backbone.body / module.language_backbone.body.model /
module.rpn.head; generalized_vl_rcnn_new.py module attributes). Unmatched
reference keys and unfilled target leaves are reported, mirroring the
reference's load-state-dict logging.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np


def _t_conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _t_linear(w):
    return np.transpose(w, (1, 0))


def _ident(w):
    return w


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "model" in raw:
        raw = raw["model"]
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    out = {}
    for k, v in raw.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def strip_prefixes(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop 'module.' wrappers; prefer EMA weights when present
    (released MQ-Det checkpoints store model_ema alongside)."""
    ema = {k[len("model_ema."):]: v for k, v in state.items() if k.startswith("model_ema.")}
    if ema:
        state = ema
    return {re.sub(r"^module\.", "", k): v for k, v in state.items()}


# ---------------------------------------------------------------------------
# mapping rules: (regex on our flax path, template for reference key, transform)
# our paths use '/' separators under params/...
# ---------------------------------------------------------------------------


def _swin_rules() -> List[Tuple[str, str, object]]:
    r = []
    b = "backbone.body"
    r += [
        (r"backbone/patch_embed_proj/kernel", f"{b}.patch_embed.proj.weight", _t_conv),
        (r"backbone/patch_embed_proj/bias", f"{b}.patch_embed.proj.bias", _ident),
        (r"backbone/patch_embed_norm/scale", f"{b}.patch_embed.norm.weight", _ident),
        (r"backbone/patch_embed_norm/bias", f"{b}.patch_embed.norm.bias", _ident),
    ]
    # blocks: our name layers_{i}_blocks_{j}
    def blk(i, j, ours, theirs, tf):
        return (
            rf"backbone/layers_{i}_blocks_{j}/{ours}",
            f"{b}.layers.{i}.blocks.{j}.{theirs}",
            tf,
        )

    for i in range(4):
        for j in range(24):  # upper bound; unmatched rules are skipped
            r += [
                blk(i, j, "norm1/scale", "norm1.weight", _ident),
                blk(i, j, "norm1/bias", "norm1.bias", _ident),
                blk(i, j, "attn/qkv/kernel", "attn.qkv.weight", _t_linear),
                blk(i, j, "attn/qkv/bias", "attn.qkv.bias", _ident),
                blk(i, j, "attn/proj/kernel", "attn.proj.weight", _t_linear),
                blk(i, j, "attn/proj/bias", "attn.proj.bias", _ident),
                blk(i, j, "attn/relative_position_bias_table",
                    "attn.relative_position_bias_table", _ident),
                blk(i, j, "norm2/scale", "norm2.weight", _ident),
                blk(i, j, "norm2/bias", "norm2.bias", _ident),
                blk(i, j, "mlp/fc1/kernel", "mlp.fc1.weight", _t_linear),
                blk(i, j, "mlp/fc1/bias", "mlp.fc1.bias", _ident),
                blk(i, j, "mlp/fc2/kernel", "mlp.fc2.weight", _t_linear),
                blk(i, j, "mlp/fc2/bias", "mlp.fc2.bias", _ident),
            ]
        r += [
            (rf"backbone/layers_{i}_downsample/norm/scale",
             f"{b}.layers.{i}.downsample.norm.weight", _ident),
            (rf"backbone/layers_{i}_downsample/norm/bias",
             f"{b}.layers.{i}.downsample.norm.bias", _ident),
            (rf"backbone/layers_{i}_downsample/reduction/kernel",
             f"{b}.layers.{i}.downsample.reduction.weight", _t_linear),
            (rf"backbone/norm{i}/scale", f"{b}.norm{i}.weight", _ident),
            (rf"backbone/norm{i}/bias", f"{b}.norm{i}.bias", _ident),
        ]
    return r


def _fpn_rules():
    b = "backbone.fpn"
    r = []
    for lvl in (2, 3, 4):
        r += [
            (rf"fpn/fpn_inner{lvl}/kernel", f"{b}.fpn_inner{lvl}.weight", _t_conv),
            (rf"fpn/fpn_inner{lvl}/bias", f"{b}.fpn_inner{lvl}.bias", _ident),
            (rf"fpn/fpn_layer{lvl}/kernel", f"{b}.fpn_layer{lvl}.weight", _t_conv),
            (rf"fpn/fpn_layer{lvl}/bias", f"{b}.fpn_layer{lvl}.bias", _ident),
        ]
    r += [
        (r"fpn/p6/kernel", f"{b}.top_blocks.p6.weight", _t_conv),
        (r"fpn/p6/bias", f"{b}.top_blocks.p6.bias", _ident),
        (r"fpn/p7/kernel", f"{b}.top_blocks.p7.weight", _t_conv),
        (r"fpn/p7/bias", f"{b}.top_blocks.p7.bias", _ident),
    ]
    return r


def _bert_rules():
    lb = "language_backbone.body.model"
    r = [
        (r"language_backbone/bert/embeddings/word_embeddings/embedding",
         f"{lb}.embeddings.word_embeddings.weight", _ident),
        (r"language_backbone/bert/embeddings/position_embeddings/embedding",
         f"{lb}.embeddings.position_embeddings.weight", _ident),
        (r"language_backbone/bert/embeddings/token_type_embeddings/embedding",
         f"{lb}.embeddings.token_type_embeddings.weight", _ident),
        (r"language_backbone/bert/embeddings/ln/scale",
         f"{lb}.embeddings.LayerNorm.weight", _ident),
        (r"language_backbone/bert/embeddings/ln/bias",
         f"{lb}.embeddings.LayerNorm.bias", _ident),
    ]
    for i in range(12):
        p = rf"language_backbone/bert/layer_{i}"
        q = f"{lb}.encoder.layer.{i}"
        r += [
            (p + r"/attention_self/query/kernel", q + ".attention.self.query.weight", _t_linear),
            (p + r"/attention_self/query/bias", q + ".attention.self.query.bias", _ident),
            (p + r"/attention_self/key/kernel", q + ".attention.self.key.weight", _t_linear),
            (p + r"/attention_self/key/bias", q + ".attention.self.key.bias", _ident),
            (p + r"/attention_self/value/kernel", q + ".attention.self.value.weight", _t_linear),
            (p + r"/attention_self/value/bias", q + ".attention.self.value.bias", _ident),
            (p + r"/attention_output_dense/kernel", q + ".attention.output.dense.weight", _t_linear),
            (p + r"/attention_output_dense/bias", q + ".attention.output.dense.bias", _ident),
            (p + r"/attention_output_ln/scale", q + ".attention.output.LayerNorm.weight", _ident),
            (p + r"/attention_output_ln/bias", q + ".attention.output.LayerNorm.bias", _ident),
            (p + r"/intermediate_dense/kernel", q + ".intermediate.dense.weight", _t_linear),
            (p + r"/intermediate_dense/bias", q + ".intermediate.dense.bias", _ident),
            (p + r"/output_dense/kernel", q + ".output.dense.weight", _t_linear),
            (p + r"/output_dense/bias", q + ".output.dense.bias", _ident),
            (p + r"/output_ln/scale", q + ".output.LayerNorm.weight", _ident),
            (p + r"/output_ln/bias", q + ".output.LayerNorm.bias", _ident),
        ]
    # GCP qv layers + pre-select
    def gcp(our_prefix, their_prefix):
        rr = []
        for ours, theirs, tf in [
            ("attn/norm/scale", "attn.norm.weight", _ident),
            ("attn/norm/bias", "attn.norm.bias", _ident),
            ("attn/norm_kv_ln/scale", "attn.norm_kv.weight", _ident),
            ("attn/norm_kv_ln/bias", "attn.norm_kv.bias", _ident),
            ("attn/to_q/kernel", "attn.to_q.weight", _t_linear),
            ("attn/to_kv/kernel", "attn.to_kv.weight", _t_linear),
            ("attn/to_out/kernel", "attn.to_out.weight", _t_linear),
            ("attn_gate/norm/scale", "attn_gate.norm.weight", _ident),
            ("attn_gate/norm/bias", "attn_gate.norm.bias", _ident),
            ("attn_gate/linear1/kernel", "attn_gate.linear1.weight", _t_linear),
            ("attn_gate/linear2/kernel", "attn_gate.linear2.weight", _t_linear),
            ("ff/norm/scale", "ff.norm.weight", _ident),
            ("ff/norm/bias", "ff.norm.bias", _ident),
            ("ff/linear1/kernel", "ff.linear1.weight", _t_linear),
            ("ff/linear2/kernel", "ff.linear2.weight", _t_linear),
            ("ff_gate", "ff_gate", lambda w: np.asarray(w).reshape(())),
        ]:
            rr.append((our_prefix + "/" + ours, their_prefix + "." + theirs, tf))
        return rr

    for i in range(6):
        r += gcp(
            rf"language_backbone/bert/qv_layer_{i}",
            f"{lb}.encoder.qv_layer.{i}",
        )
    for i in range(2):
        p = rf"language_backbone/bert/pre_select/layers_{i}"
        q = f"{lb}.pre_select.layers.{i}"
        r += [
            (p + r"/image_condition/norm/scale", q + ".image_condition.norm.weight", _ident),
            (p + r"/image_condition/norm/bias", q + ".image_condition.norm.bias", _ident),
            (p + r"/image_condition/norm_kv_ln/scale", q + ".image_condition.norm_kv.weight", _ident),
            (p + r"/image_condition/norm_kv_ln/bias", q + ".image_condition.norm_kv.bias", _ident),
            (p + r"/image_condition/to_q/kernel", q + ".image_condition.to_q.weight", _t_linear),
            (p + r"/image_condition/to_kv/kernel", q + ".image_condition.to_kv.weight", _t_linear),
            (p + r"/image_condition/to_out/kernel", q + ".image_condition.to_out.weight", _t_linear),
            (p + r"/ff/norm/scale", q + ".ff.norm.weight", _ident),
            (p + r"/ff/norm/bias", q + ".ff.norm.bias", _ident),
            (p + r"/ff/linear1/kernel", q + ".ff.linear1.weight", _t_linear),
            (p + r"/ff/linear2/kernel", q + ".ff.linear2.weight", _t_linear),
            (p + r"/res_mapping/kernel", q + ".res_mapping.weight", _t_linear),
        ]
    return r


def _head_rules():
    h = "rpn.head"
    r = []
    for i in range(8):  # up to NUM_CONVS=8 (GLIP-L)
        # tower ordering per stage: VLFuse (3i), BertEncoderLayer (3i+1),
        # DyConv (3i+2) — vldyhead.py dyhead_tower construction
        fuse = f"{h}.dyhead_tower.{3 * i}.b_attn"
        ours_f = rf"rpn/fuse_{i}/b_attn"
        r += [
            (ours_f + r"/layer_norm_v/scale", fuse + ".layer_norm_v.weight", _ident),
            (ours_f + r"/layer_norm_v/bias", fuse + ".layer_norm_v.bias", _ident),
            (ours_f + r"/layer_norm_l/scale", fuse + ".layer_norm_l.weight", _ident),
            (ours_f + r"/layer_norm_l/bias", fuse + ".layer_norm_l.bias", _ident),
            (ours_f + r"/gamma_v", fuse + ".gamma_v", _ident),
            (ours_f + r"/gamma_l", fuse + ".gamma_l", _ident),
        ]
        for proj in ("v_proj", "l_proj", "values_v_proj", "values_l_proj",
                     "out_v_proj", "out_l_proj"):
            r += [
                (ours_f + rf"/attn/{proj}/kernel", fuse + f".attn.{proj}.weight", _t_linear),
                (ours_f + rf"/attn/{proj}/bias", fuse + f".attn.{proj}.bias", _ident),
            ]
        lang = f"{h}.dyhead_tower.{3 * i + 1}"
        ours_l = rf"rpn/lang_layer_{i}"
        r += [
            (ours_l + r"/attention_self/query/kernel", lang + ".attention.self.query.weight", _t_linear),
            (ours_l + r"/attention_self/query/bias", lang + ".attention.self.query.bias", _ident),
            (ours_l + r"/attention_self/key/kernel", lang + ".attention.self.key.weight", _t_linear),
            (ours_l + r"/attention_self/key/bias", lang + ".attention.self.key.bias", _ident),
            (ours_l + r"/attention_self/value/kernel", lang + ".attention.self.value.weight", _t_linear),
            (ours_l + r"/attention_self/value/bias", lang + ".attention.self.value.bias", _ident),
            (ours_l + r"/attention_output_dense/kernel", lang + ".attention.output.dense.weight", _t_linear),
            (ours_l + r"/attention_output_dense/bias", lang + ".attention.output.dense.bias", _ident),
            (ours_l + r"/attention_output_ln/scale", lang + ".attention.output.LayerNorm.weight", _ident),
            (ours_l + r"/attention_output_ln/bias", lang + ".attention.output.LayerNorm.bias", _ident),
            (ours_l + r"/intermediate_dense/kernel", lang + ".intermediate.dense.weight", _t_linear),
            (ours_l + r"/intermediate_dense/bias", lang + ".intermediate.dense.bias", _ident),
            (ours_l + r"/output_dense/kernel", lang + ".output.dense.weight", _t_linear),
            (ours_l + r"/output_dense/bias", lang + ".output.dense.bias", _ident),
            (ours_l + r"/output_ln/scale", lang + ".output.LayerNorm.weight", _ident),
            (ours_l + r"/output_ln/bias", lang + ".output.LayerNorm.bias", _ident),
        ]
        dy = f"{h}.dyhead_tower.{3 * i + 2}"
        ours_d = rf"rpn/dyconv_tower_{i}"
        for c in range(3):
            r += [
                (ours_d + rf"/dyconv_{c}/kernel", dy + f".DyConv.{c}.conv.weight", _t_conv),
                (ours_d + rf"/dyconv_{c}/bias", dy + f".DyConv.{c}.conv.bias", _ident),
                # USE_DFCONV=False variant: plain conv nests one level deeper
                # on our side (reference Conv3x3Norm keeps `conv` either way)
                (ours_d + rf"/dyconv_{c}/conv/kernel", dy + f".DyConv.{c}.conv.weight", _t_conv),
                (ours_d + rf"/dyconv_{c}/conv/bias", dy + f".DyConv.{c}.conv.bias", _ident),
                (ours_d + rf"/dyconv_{c}/gn/scale", dy + f".DyConv.{c}.bn.weight", _ident),
                (ours_d + rf"/dyconv_{c}/gn/bias", dy + f".DyConv.{c}.bn.bias", _ident),
            ]
        r += [
            (ours_d + r"/attn_conv/kernel", dy + ".AttnConv.1.weight", _t_conv),
            (ours_d + r"/attn_conv/bias", dy + ".AttnConv.1.bias", _ident),
            (ours_d + r"/offset/kernel", dy + ".offset.weight", _t_conv),
            (ours_d + r"/offset/bias", dy + ".offset.bias", _ident),
            (ours_d + r"/dyrelu/fc1/kernel", dy + ".relu.fc.0.weight", _t_linear),
            (ours_d + r"/dyrelu/fc1/bias", dy + ".relu.fc.0.bias", _ident),
            (ours_d + r"/dyrelu/fc2/kernel", dy + ".relu.fc.2.weight", _t_linear),
            (ours_d + r"/dyrelu/fc2/bias", dy + ".relu.fc.2.bias", _ident),
        ]
        r += [
            (rf"rpn/scale_{i}/scale", f"{h}.scales.{i}.scale",
             lambda w: np.asarray(w).reshape(())),
        ]
    r += [
        (r"rpn/cls_logits/kernel", f"{h}.cls_logits.weight", _t_conv),
        (r"rpn/cls_logits/bias", f"{h}.cls_logits.bias", _ident),
        (r"rpn/bbox_pred/kernel", f"{h}.bbox_pred.weight", _t_conv),
        (r"rpn/bbox_pred/bias", f"{h}.bbox_pred.bias", _ident),
        (r"rpn/centerness/kernel", f"{h}.centerness.weight", _t_conv),
        (r"rpn/centerness/bias", f"{h}.centerness.bias", _ident),
        (r"rpn/dot_product_projection_text/kernel",
         f"{h}.dot_product_projection_text.weight", _t_linear),
        (r"rpn/dot_product_projection_text/bias",
         f"{h}.dot_product_projection_text.bias", _ident),
        (r"rpn/log_scale", f"{h}.log_scale", lambda w: np.asarray(w).reshape(1)),
        (r"rpn/bias_lang", f"{h}.bias_lang", _ident),
        (r"rpn/bias0", f"{h}.bias0", lambda w: np.asarray(w).reshape(1)),
    ]
    return r


def build_rule_table():
    rules = _swin_rules() + _fpn_rules() + _bert_rules() + _head_rules()
    return {our: (theirs, tf) for our, theirs, tf in rules}


def import_glip_checkpoint(params, state: Dict[str, np.ndarray], strict: bool = False):
    """Fill the flax param tree from a reference state dict.

    Returns (new_params, report) where report lists matched / missing /
    unused keys (the model_serialization.py logging equivalent).
    """
    import jax

    state = strip_prefixes(state)
    rules = build_rule_table()

    matched, missing = [], []
    used = set()

    def fill(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        name = re.sub(r"^params/", "", name)
        rule = rules.get(name)
        if rule is None:
            missing.append(name)
            return leaf
        ref_key, tf = rule
        if ref_key not in state:
            missing.append(name)
            return leaf
        val = tf(state[ref_key]).astype(np.float32)
        if val.shape != leaf.shape:
            missing.append(f"{name} (shape {val.shape} vs {leaf.shape})")
            return leaf
        used.add(ref_key)
        matched.append(name)
        return val

    new_params = jax.tree_util.tree_map_with_path(fill, params)
    unused = [k for k in state if k not in used]
    report = {"matched": matched, "missing": missing, "unused": unused}
    if strict and missing:
        raise KeyError(f"{len(missing)} parameters not found: {missing[:20]}")
    return new_params, report
