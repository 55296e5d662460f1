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
    # FPN / head
    out_channels: int = 256
    num_convs: int = 6
    num_classes: int = 80
    log_scale_init: float = 0.0
    # language
    lang_layers: int = 12
    lang_dim: int = 768
    lang_heads: int = 12
    lang_intermediate: int = 3072
    vocab_size: int = 30522
    start_qv_layer: int = 6
    vision_scale: float = 1.0
    query_fusion: bool = False
    add_linear_layer: bool = False
    fuse_type: str = "MHA-B"
    fuse_layer_scale: bool = True
    remat: bool = False
    dtype: Dtype = jnp.float32

    @classmethod
    def from_config(cls, cfg, dtype=None):
        dt = dtype or getattr(jnp, cfg.TPU.COMPUTE_DTYPE)
        return cls(
            embed_dim=cfg.MODEL.SWINT.EMBED_DIM,
            depths=tuple(cfg.MODEL.SWINT.DEPTHS),
            num_heads=tuple(cfg.MODEL.SWINT.NUM_HEADS),
            window_size=cfg.MODEL.SWINT.WINDOW_SIZE,
            drop_path_rate=cfg.MODEL.SWINT.DROP_PATH_RATE,
            swin_version=cfg.MODEL.SWINT.VERSION,
            out_channels=cfg.MODEL.BACKBONE.OUT_CHANNELS,
            num_convs=cfg.MODEL.DYHEAD.NUM_CONVS,
            num_classes=cfg.MODEL.DYHEAD.NUM_CLASSES - 1,
            log_scale_init=cfg.MODEL.DYHEAD.LOG_SCALE,
            lang_layers=cfg.MODEL.LANGUAGE_BACKBONE.HIDDEN_LAYERS,
            lang_dim=cfg.MODEL.LANGUAGE_BACKBONE.LANG_DIM,
            lang_heads=cfg.MODEL.LANGUAGE_BACKBONE.NUM_HEADS,
            lang_intermediate=cfg.MODEL.LANGUAGE_BACKBONE.INTERMEDIATE_SIZE,
            vocab_size=cfg.MODEL.LANGUAGE_BACKBONE.VOCAB_SIZE,
            start_qv_layer=cfg.VISION_QUERY.START_QV_LAYER,
            vision_scale=cfg.VISION_QUERY.VISION_SCALE,
            query_fusion=cfg.VISION_QUERY.QUERY_FUSION,
            add_linear_layer=cfg.MODEL.DYHEAD.FUSE_CONFIG.ADD_LINEAR_LAYER,
            fuse_type=cfg.MODEL.DYHEAD.FUSE_CONFIG.TYPE,
            fuse_layer_scale=cfg.MODEL.DYHEAD.FUSE_CONFIG.USE_LAYER_SCALE,
            remat=cfg.TPU.REMAT,
            dtype=dt,
        )

    def setup(self):
        self.backbone = SwinTransformer(
            embed_dim=self.embed_dim,
            depths=self.depths,
            num_heads=self.num_heads,
            window_size=self.window_size,
            drop_path_rate=self.drop_path_rate,
            version=self.swin_version,
            dtype=self.dtype,
            name="backbone",
        )
        self.fpn = FPN(out_channels=self.out_channels, dtype=self.dtype, name="fpn")
        self.language_backbone = LanguageBackbone(
            num_layers=self.lang_layers,
            hidden_size=self.lang_dim,
            num_heads=self.lang_heads,
            intermediate_size=self.lang_intermediate,
            vocab_size=self.vocab_size,
            start_qv_layer=self.start_qv_layer,
            vision_dim=self.out_channels,
            vision_scale=self.vision_scale,
            remat=self.remat,
            dtype=self.dtype,
            name="language_backbone",
        )
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

        image_tokens = None
        if queries is not None:
            image_tokens = flatten_fpn_features(fpn_feats)

        lang = self.language_backbone(
            input_ids,
            attention_mask,
            queries=queries.astype(self.dtype) if queries is not None else None,
            query_mask=query_mask,
            image_tokens=image_tokens,
            deterministic=deterministic,
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
