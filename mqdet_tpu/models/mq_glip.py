"""MQ-GLIP meta-architecture (flax).

Capability twin of GeneralizedVLRCNN_New
(maskrcnn_benchmark/modeling/detector/generalized_vl_rcnn_new.py:90-519):
Swin -> FPN -> [vision queries -> PreSelect -> GCP-BERT] -> VLDyHead.

Device ABI (all static shapes):
  images:        (B, H, W, 3)  normalized, padded to a bucket
  input_ids:     (B, T)        tokenized caption, T = MAX_QUERY_LEN
  attention_mask:(B, T)
  queries:       (B, V, 256)   padded vision-query bank rows (or None)
  query_mask:    (B, V, T)     query->token attention mask (or None)

Ragged work (caption tokenization, bank selection, positive maps) happens
host-side in mqdet_tpu.mq / mqdet_tpu.data; the model is a pure function.

TPU-first split: `encode_image` (Swin+FPN, text-independent) and
`forward_head` (GCP-BERT + VLFuse + VLDyHead, text-dependent) are separately
jittable. Chunked LVIS evaluation runs the image tower ONCE per image and
only the head per class chunk — the reference recomputes the entire network
for each of its 31 sequential chunk forwards (engine/inference.py:603-648).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from mqdet_tpu.models.bert import LanguageBackbone
from mqdet_tpu.models.text_towers import CLIPTextTransformer, RNNEncoder
from mqdet_tpu.models.fpn import FPN
from mqdet_tpu.models.layers import avg_pool_2x
from mqdet_tpu.models.swin import SwinTransformer
from mqdet_tpu.models.vldyhead import VLDyHead

Dtype = Any


def flatten_fpn_features(feats) -> jnp.ndarray:
    """generalized_vl_rcnn_new.py:291-293: AvgPool2d(2) + flatten + concat."""
    parts = []
    for f in feats:
        p = avg_pool_2x(f)
        parts.append(p.reshape(p.shape[0], -1, p.shape[-1]))
    return jnp.concatenate(parts, axis=1)


class MQGLIP(nn.Module):
    """The flagship detector. Configure via from_config()."""

    # Swin
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    drop_path_rate: float = 0.2
    swin_version: str = "v1"
    mlp_ratio: float = 4.0
    # FPN / head
    out_channels: int = 256
    fpn_use_gn: bool = False
    fpn_use_relu: bool = False
    num_convs: int = 6
    num_classes: int = 80
    log_scale_init: float = 0.0
    prior_prob: float = 0.01
    use_deform: bool = True
    use_dyfuse: bool = True
    use_dyrelu: bool = True
    deform_radius: int = 2  # TPU.DEFORM_RADIUS; see utils/calibrate.py
    offset_compat: str = "strided"  # TPU.DEFORM_OFFSET_COMPAT
    early_fuse: bool = True
    use_fused_dot_product: bool = True
    use_mlm: bool = False  # FUSE_CONFIG.MLM_LOSS
    # language
    lang_layers: int = 12
    lang_dim: int = 768
    lang_heads: int = 12
    lang_intermediate: int = 3072
    vocab_size: int = 30522
    start_qv_layer: int = 6
    vision_scale: float = 1.0
    n_agg_layers: int = 1
    # MODEL.LANGUAGE_BACKBONE.MODEL_TYPE registry (backbone.py:15-54):
    # bert-base-uncased (GCP-capable), clip, rnn
    lang_model_type: str = "bert-base-uncased"
    condition_gate: bool = True
    nonlinear_gate: bool = True
    num_pre_select_layers: int = 2
    no_cat: bool = True
    fix_attn_gate: float = -1.0
    add_adapt_layer: bool = False
    share_kv: bool = False
    augment_image_with_query: bool = False
    new_mask_token: bool = False
    # VISION_QUERY.ADD_VISION_LAYER (query_selector.py:26-28,98-99):
    # zero-init additive prompt on the packed query rows
    add_vision_layer: bool = False
    # VISION_QUERY.LEARNABLE_BANK (query_selector.py:14-24): the bank rows
    # are a trainable parameter; `queries` then carries int32 (row, slot)
    # indices and the model gathers. The param name contains qv_layer so the
    # vision_query freeze recipes keep it trainable (reference comment,
    # query_selector.py:19). Shape comes from the bank
    # (QuerySelector.bank_table_shape); values are installed post-init with
    # utils/builders.install_learnable_bank.
    learnable_bank: bool = False
    bank_rows: int = 0
    bank_slots: int = 0
    query_fusion: bool = False
    add_linear_layer: bool = False
    fuse_type: str = "MHA-B"
    fuse_layer_scale: bool = True
    remat: bool = False
    dtype: Dtype = jnp.float32

    @classmethod
    def from_config(cls, cfg, dtype=None, bank_shape=None):
        dt = dtype or getattr(jnp, cfg.TPU.COMPUTE_DTYPE)
        lb = bool(cfg.VISION_QUERY.LEARNABLE_BANK)
        if lb:
            assert bank_shape is not None, (
                "LEARNABLE_BANK needs the bank's (rows, slots, C) — pass "
                "QuerySelector.bank_table_shape() via build_model(cfg, "
                "bank_shape=...)"
            )
        return cls(
            learnable_bank=lb,
            bank_rows=bank_shape[0] if lb else 0,
            bank_slots=bank_shape[1] if lb else 0,
            embed_dim=cfg.MODEL.SWINT.EMBED_DIM,
            depths=tuple(cfg.MODEL.SWINT.DEPTHS),
            num_heads=tuple(cfg.MODEL.SWINT.NUM_HEADS),
            window_size=cfg.MODEL.SWINT.WINDOW_SIZE,
            drop_path_rate=cfg.MODEL.SWINT.DROP_PATH_RATE,
            swin_version=cfg.MODEL.SWINT.VERSION,
            mlp_ratio=cfg.MODEL.SWINT.MLP_RATIO,
            out_channels=cfg.MODEL.BACKBONE.OUT_CHANNELS,
            fpn_use_gn=cfg.MODEL.FPN.USE_GN,
            fpn_use_relu=cfg.MODEL.FPN.USE_RELU,
            num_convs=cfg.MODEL.DYHEAD.NUM_CONVS,
            num_classes=cfg.MODEL.DYHEAD.NUM_CLASSES - 1,
            log_scale_init=cfg.MODEL.DYHEAD.LOG_SCALE,
            prior_prob=cfg.MODEL.DYHEAD.PRIOR_PROB,
            use_deform=cfg.MODEL.DYHEAD.USE_DFCONV,
            use_dyfuse=cfg.MODEL.DYHEAD.USE_DYFUSE,
            use_dyrelu=cfg.MODEL.DYHEAD.USE_DYRELU,
            deform_radius=cfg.TPU.DEFORM_RADIUS,
            offset_compat=cfg.TPU.DEFORM_OFFSET_COMPAT,
            early_fuse=cfg.MODEL.DYHEAD.FUSE_CONFIG.EARLY_FUSE_ON,
            use_fused_dot_product=(
                cfg.MODEL.DYHEAD.FUSE_CONFIG.USE_FUSED_FEATURES_DOT_PRODUCT
            ),
            use_mlm=cfg.MODEL.DYHEAD.FUSE_CONFIG.MLM_LOSS,
            lang_layers=cfg.MODEL.LANGUAGE_BACKBONE.HIDDEN_LAYERS,
            lang_dim=cfg.MODEL.LANGUAGE_BACKBONE.LANG_DIM,
            lang_heads=cfg.MODEL.LANGUAGE_BACKBONE.NUM_HEADS,
            lang_intermediate=cfg.MODEL.LANGUAGE_BACKBONE.INTERMEDIATE_SIZE,
            vocab_size=cfg.MODEL.LANGUAGE_BACKBONE.VOCAB_SIZE,
            start_qv_layer=cfg.VISION_QUERY.START_QV_LAYER,
            vision_scale=cfg.VISION_QUERY.VISION_SCALE,
            n_agg_layers=cfg.MODEL.LANGUAGE_BACKBONE.N_LAYERS,
            lang_model_type=cfg.MODEL.LANGUAGE_BACKBONE.MODEL_TYPE,
            condition_gate=cfg.VISION_QUERY.CONDITION_GATE,
            nonlinear_gate=cfg.VISION_QUERY.NONLINEAR_GATE,
            num_pre_select_layers=cfg.VISION_QUERY.NUM_PRE_SELECT_LAYERS,
            no_cat=cfg.VISION_QUERY.NO_CAT,
            fix_attn_gate=cfg.VISION_QUERY.FIX_ATTN_GATE,
            add_adapt_layer=cfg.VISION_QUERY.ADD_ADAPT_LAYER,
            share_kv=cfg.VISION_QUERY.SHARE_KV,
            augment_image_with_query=cfg.VISION_QUERY.AUGMENT_IMAGE_WITH_QUERY,
            new_mask_token=cfg.VISION_QUERY.NEW_MASK_TOKEN,
            add_vision_layer=cfg.VISION_QUERY.ADD_VISION_LAYER,
            query_fusion=cfg.VISION_QUERY.QUERY_FUSION,
            add_linear_layer=cfg.MODEL.DYHEAD.FUSE_CONFIG.ADD_LINEAR_LAYER,
            fuse_type=cfg.MODEL.DYHEAD.FUSE_CONFIG.TYPE,
            fuse_layer_scale=cfg.MODEL.DYHEAD.FUSE_CONFIG.USE_LAYER_SCALE,
            remat=(
                cfg.TPU.REMAT
                or cfg.MODEL.DYHEAD.USE_CHECKPOINT
                or cfg.MODEL.LANGUAGE_BACKBONE.USE_CHECKPOINT
            ),
            dtype=dt,
        )

    def setup(self):
        if self.learnable_bank:
            self.qv_layer_learnable_bank = self.param(
                "qv_layer_learnable_bank", nn.initializers.zeros,
                (self.bank_rows, self.bank_slots, self.out_channels),
            )
        if self.add_vision_layer:
            self.tunable_vision_linear = self.param(
                "tunable_vision_linear", nn.initializers.zeros,
                (1000, self.out_channels),
            )
        self.backbone = SwinTransformer(
            embed_dim=self.embed_dim,
            depths=self.depths,
            num_heads=self.num_heads,
            window_size=self.window_size,
            mlp_ratio=self.mlp_ratio,
            drop_path_rate=self.drop_path_rate,
            version=self.swin_version,
            dtype=self.dtype,
            name="backbone",
        )
        self.fpn = FPN(
            out_channels=self.out_channels, use_gn=self.fpn_use_gn,
            use_relu=self.fpn_use_relu, dtype=self.dtype, name="fpn",
        )
        import os as _os

        lang_type = _os.path.basename(self.lang_model_type)
        if lang_type == "clip":
            self.language_backbone = CLIPTextTransformer(
                width=self.lang_dim, layers=self.lang_layers,
                heads=self.lang_heads, dtype=self.dtype,
                name="language_backbone",
            )
            return self._setup_rest()
        if lang_type == "rnn":
            # bidirectional output = hidden * 2 (reference rnn_model.py:54),
            # so the per-direction width is lang_dim // 2
            self.language_backbone = RNNEncoder(
                hidden_size=self.lang_dim // 2, dtype=self.dtype,
                name="language_backbone",
            )
            return self._setup_rest()
        self.language_backbone = LanguageBackbone(
            num_layers=self.lang_layers,
            hidden_size=self.lang_dim,
            num_heads=self.lang_heads,
            intermediate_size=self.lang_intermediate,
            vocab_size=self.vocab_size,
            start_qv_layer=self.start_qv_layer,
            vision_dim=self.out_channels,
            vision_scale=self.vision_scale,
            n_agg_layers=self.n_agg_layers,
            condition_gate=self.condition_gate,
            nonlinear_gate=self.nonlinear_gate,
            num_pre_select_layers=self.num_pre_select_layers,
            no_cat=self.no_cat,
            fix_attn_gate=self.fix_attn_gate,
            add_adapt_layer=self.add_adapt_layer,
            share_kv=self.share_kv,
            augment_image_with_query=self.augment_image_with_query,
            new_mask_token=self.new_mask_token,
            remat=self.remat,
            dtype=self.dtype,
            name="language_backbone",
        )
        self._setup_rest()

    def _setup_rest(self):
        self.rpn = VLDyHead(
            query_fusion=self.query_fusion,
            add_linear_layer=self.add_linear_layer,
            fuse_type=self.fuse_type,
            fuse_layer_scale=self.fuse_layer_scale,
            remat=self.remat,
            num_convs=self.num_convs,
            channels=self.out_channels,
            in_channels=self.out_channels,
            lang_dim=self.lang_dim,
            lang_heads=self.lang_heads,
            lang_intermediate=self.lang_intermediate,
            num_classes=self.num_classes,
            log_scale_init=self.log_scale_init,
            prior_prob=self.prior_prob,
            use_deform=self.use_deform,
            use_dyfuse=self.use_dyfuse,
            use_dyrelu=self.use_dyrelu,
            deform_radius=self.deform_radius,
            offset_compat=self.offset_compat,
            early_fuse=self.early_fuse,
            use_fused_dot_product=self.use_fused_dot_product,
            use_mlm=self.use_mlm,
            vocab_size=self.vocab_size,
            dtype=self.dtype,
            name="rpn",
        )

    def encode_image(self, images: jnp.ndarray, deterministic: bool = True):
        """Text-independent image tower: Swin + FPN -> 5 pyramid levels."""
        images = images.astype(self.dtype)
        stage_feats = self.backbone(images, deterministic=deterministic)
        return self.fpn(stage_feats[1:4])

    def forward_head(
        self,
        fpn_feats: List[jnp.ndarray],
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        queries: Optional[jnp.ndarray] = None,
        query_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        """Text-dependent part: GCP-BERT + VLFuse/VLDyHead.

        fpn_feats may have batch 1 while the text inputs have batch C (chunk
        parallelism); features are broadcast to the text batch.
        """
        b_text = input_ids.shape[0]
        if fpn_feats[0].shape[0] == 1 and b_text > 1:
            fpn_feats = [
                jnp.broadcast_to(f, (b_text,) + f.shape[1:]) for f in fpn_feats
            ]

        if queries is not None and jnp.issubdtype(queries.dtype, jnp.integer):
            # learnable-bank path: queries carries (row, slot) indices
            assert self.learnable_bank
            bank = self.qv_layer_learnable_bank
            queries = bank[queries[..., 0], queries[..., 1]]

        if queries is not None and self.add_vision_layer:
            # tunable_vision_linear (query_selector.py:98-99): zero-init
            # row-indexed additive prompt on the packed queries
            v = queries.shape[1]
            queries = queries + self.tunable_vision_linear[None, :v, :].astype(
                queries.dtype
            )

        image_tokens = None
        if queries is not None:
            image_tokens = flatten_fpn_features(fpn_feats)

        if isinstance(self.language_backbone, LanguageBackbone):
            lang = self.language_backbone(
                input_ids,
                attention_mask,
                queries=queries.astype(self.dtype) if queries is not None else None,
                query_mask=query_mask,
                image_tokens=image_tokens,
                deterministic=deterministic,
            )
        else:
            # clip / rnn towers (no GCP pathway -> no vision queries)
            assert queries is None, (
                "vision queries require the bert language backbone"
            )
            lang = self.language_backbone(
                input_ids, attention_mask, deterministic=deterministic
            )

        head_out = self.rpn(
            fpn_feats,
            lang["hidden"],
            lang["masks"],
            embedding=lang["embedded"],
            augmented_vision=lang.get("augmented_vision") if self.query_fusion else None,
            query_mask=query_mask if self.query_fusion else None,
            lang_aggregate=lang.get("aggregate"),
            deterministic=deterministic,
        )
        head_out["lang"] = lang
        return head_out

    def __call__(
        self,
        images: jnp.ndarray,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        queries: Optional[jnp.ndarray] = None,
        query_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        fpn_feats = self.encode_image(images, deterministic)
        out = self.forward_head(
            fpn_feats, input_ids, attention_mask, queries, query_mask, deterministic
        )
        out["fpn_feats"] = fpn_feats
        return out
