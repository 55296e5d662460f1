"""MQ-GroundingDINO — deformable-DETR grounding detector with GCP (flax).

Capability twin of groundingdino_new/models/GroundingDINO/:
  * groundingdino.py:93-709 (model: Swin -> input_proj -> QVBert text encoder
    with GCP -> 2-stage deformable transformer -> per-layer bbox/class heads)
  * transformer.py:40-959 (encoder 6x [MSDeformAttn + text enhancer +
    BiAttention fusion]; two-stage top-900 proposals; decoder 6x [self-attn,
    text cross-attn, MSDeformAttn] with iterative box refinement)
  * bertwarper.py:271-320 (sub-sentence masks + position ids)
  * utils.py ContrastiveEmbed (:233-268), gen_encoder_output_proposals
    (:56-110), sine embeddings (:24-54, :204-229)
  * fuse_modules.py (BiAttention with vision mask — shares our
    models/fusion.py BiMultiHeadAttention core)

TPU-first: static shapes throughout (bucketed images, fixed 900 queries,
fixed text length); MSDeformAttn via ops/ms_deform_attn (XLA composite);
the GCP layer is REUSED unchanged from models/bert.py — the same QVBertModel
serves both detector families, like the reference
(groundingdino.py:184-189 reuses QVBertModel via BertModelWarper).
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mqdet_tpu.core.boxes import cxcywh_to_xyxy
from mqdet_tpu.models.bert import LanguageBackbone
from mqdet_tpu.models.fusion import BiMultiHeadAttention
from mqdet_tpu.models.swin import SwinTransformer
from mqdet_tpu.ops.ms_deform_attn import ms_deform_attn

Dtype = Any


def inverse_sigmoid(x, eps=1e-3):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def sine_pos_embed_2d(h: int, w: int, valid_hw, num_pos_feats=128, temperature=20):
    """PositionEmbeddingSineHW (position_encoding.py:78-130), normalized."""
    eps = 1e-6
    scale = 2 * math.pi
    y_embed = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
    x_embed = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :] * jnp.ones((h, 1))
    vh, vw = valid_hw
    y_embed = y_embed / (vh + eps) * scale
    x_embed = x_embed / (vw + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_tx = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    dim_ty = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[..., None] / dim_tx
    pos_y = y_embed[..., None] / dim_ty
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], -1).reshape(h, w, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], -1).reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)  # (H, W, 2*num_pos_feats)


def sine_embed_1d(pos, num_pos_feats=256, temperature=10000):
    """get_sine_pos_embed for scalar positions (utils.py:24-54)."""
    scale = 2 * math.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    emb = pos[..., None] * scale / dim_t
    return jnp.stack([jnp.sin(emb[..., 0::2]), jnp.cos(emb[..., 1::2])], -1).reshape(
        *pos.shape, num_pos_feats
    )


def gen_sineembed_for_position(pos):
    """(..., 2 or 4) -> (..., 256 or 512) (utils.py:204-229)."""
    scale = 2 * math.pi
    dim_t = jnp.arange(128, dtype=jnp.float32)
    dim_t = 10000 ** (2 * (dim_t // 2) / 128)

    def emb(v):
        p = v[..., None] * scale / dim_t
        return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], -1).reshape(
            *v.shape, 128
        )

    pos_y = emb(pos[..., 1])
    pos_x = emb(pos[..., 0])
    if pos.shape[-1] == 2:
        return jnp.concatenate([pos_y, pos_x], -1)
    pos_w = emb(pos[..., 2])
    pos_h = emb(pos[..., 3])
    return jnp.concatenate([pos_y, pos_x, pos_w, pos_h], -1)


def sub_sentence_masks(input_ids, special_ids=(101, 102, 1012, 1029)):
    """generate_masks_with_special_tokens_and_transfer_map
    (bertwarper.py:271-320), reference-exact:

    Each INTERIOR special token (position in [1, T-2]) terminates a block
    spanning (previous_special, this_special] — the category tokens plus
    their own terminator attend to each other; position ids restart at 0 at
    the block start. Specials at position 0 ([CLS]) or T-1 are self-only
    with position 0 (bertwarper.py:298-300). Tokens after the last interior
    special (padding) keep only the identity row and position 0.

    Pure jnp; (B, T) int ids -> (attn (B, T, T) bool, position_ids (B, T)).
    """
    b, t = input_ids.shape
    special = jnp.zeros_like(input_ids, bool)
    for s in special_ids:
        special = special | (input_ids == s)

    idx = jnp.arange(t)[None]  # (1, T)
    interior = special & (idx > 0) & (idx < t - 1)

    # previous special STRICTLY before each position (any special)
    prev_incl = jax.lax.associative_scan(
        jnp.maximum, jnp.where(special, idx, -1), axis=1
    )
    prev_strict = jnp.concatenate(
        [jnp.full((b, 1), -1), prev_incl[:, :-1]], axis=1
    )

    # next interior special at-or-after each position (the block terminator)
    big = t + 1
    nxt = jax.lax.associative_scan(
        jnp.minimum, jnp.where(interior, idx, big), axis=1, reverse=True
    )

    # a position belongs to a block iff a terminator exists at-or-after it
    # and it is not a boundary special ([CLS] / final slot). Position 0 is
    # never a member: the reference's previous_col=0 init (bertwarper.py:285)
    # makes the first block span (0, first_special] — exclusive at 0 — even
    # when position 0 is not a special token.
    member = (nxt < big) & ~(special & ~interior) & (idx > 0)
    block = jnp.where(member, nxt, -idx - 1)  # unique sentinel per non-member
    attn = (block[:, :, None] == block[:, None, :]) | jnp.eye(t, dtype=bool)[None]

    # previous_col=0 init also means a block with NO special before it counts
    # positions as if a special sat at index 0 (clamp, no-op when [CLS] is there)
    position_ids = jnp.where(member, idx - jnp.maximum(prev_strict, 0) - 1, 0)
    return attn, position_ids


class MSDeformAttn(nn.Module):
    """ms_deform_attn.py:136-359: value proj + predicted sampling offsets and
    attention weights + the sampling composite + output proj."""

    embed_dim: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, query, value, reference_points, spatial_shapes, value_mask=None
    ):
        """query (B, Q, C); value (B, S, C); reference_points (B, Q, L, 2|4);
        spatial_shapes static [(H, W)]; value_mask (B, S) 1=valid."""
        b, q, c = query.shape
        nh, nl, npt = self.num_heads, self.num_levels, self.num_points
        hd = self.embed_dim // nh

        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="value_proj")(value)
        if value_mask is not None:
            v = v * value_mask[..., None].astype(v.dtype)
        v = v.reshape(b, -1, nh, hd)

        def grid_init(key, shape, dtype=jnp.float32):
            # reference init (ms_deform_attn.py:~200): head directions scaled
            # by point index
            thetas = np.arange(nh) * (2.0 * np.pi / nh)
            grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
            grid = grid / np.abs(grid).max(-1, keepdims=True)
            grid = np.tile(grid[:, None, None, :], (1, nl, npt, 1))
            for i in range(npt):
                grid[:, :, i] *= i + 1
            return jnp.asarray(grid.reshape(-1), dtype)

        offsets = nn.Dense(
            nh * nl * npt * 2, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, bias_init=grid_init,
            name="sampling_offsets",
        )(query).reshape(b, q, nh, nl, npt, 2).astype(jnp.float32)
        attn = nn.Dense(
            nh * nl * npt, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(b, q, nh, nl * npt)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).reshape(b, q, nh, nl, npt)

        shapes_wh = jnp.asarray([[w_, h_] for h_, w_ in spatial_shapes], jnp.float32)
        if reference_points.shape[-1] == 2:
            loc = (
                reference_points[:, :, None, :, None, :]
                + offsets / shapes_wh[None, None, None, :, None, :]
            )
        else:
            loc = (
                reference_points[:, :, None, :, None, :2]
                + offsets / npt * reference_points[:, :, None, :, None, 2:] * 0.5
            )
        out = ms_deform_attn(v, spatial_shapes, loc, attn)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="output_proj")(
            out.astype(self.dtype)
        )


class TextEnhancerLayer(nn.Module):
    """transformer_vanilla.py TransformerEncoderLayer: self-attn + FFN with
    sine positional embeds from position_ids."""

    d_model: int = 256
    n_heads: int = 8
    d_ffn: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, text, attn_matrix, pos, deterministic=True):
        qk = text + pos
        b, t, c = text.shape
        nh = self.n_heads
        hd = c // nh

        def split(x):
            return x.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)

        qh = split(nn.Dense(c, dtype=self.dtype, name="q")(qk))
        kh = split(nn.Dense(c, dtype=self.dtype, name="k")(qk))
        vh = split(nn.Dense(c, dtype=self.dtype, name="v")(text))
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32)
        scores = scores / (hd**0.5)
        scores = jnp.where(attn_matrix[:, None], scores, -1e9)
        probs = jax.nn.softmax(scores, -1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh, preferred_element_type=jnp.float32)
        out = out.astype(self.dtype).transpose(0, 2, 1, 3).reshape(b, t, c)
        out = nn.Dense(c, dtype=self.dtype, name="out")(out)
        text = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(text + out)
        y = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(text)
        y = nn.relu(y)
        y = nn.Dense(c, dtype=self.dtype, name="linear2")(y)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(text + y)


class FusionLayer(nn.Module):
    """fuse_modules.py BiAttentionBlock: pre-LN bi-attention with layer scale
    and (optionally masked) vision tokens."""

    v_dim: int = 256
    l_dim: int = 256
    embed_dim: int = 1024
    num_heads: int = 4
    init_value: float = 1e-4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, v, l, mask_l=None, deterministic=True):
        gamma_v = self.param("gamma_v", nn.initializers.constant(self.init_value), (self.v_dim,))
        gamma_l = self.param("gamma_l", nn.initializers.constant(self.init_value), (self.l_dim,))
        # NOTE: unlike GLIP's BiAttentionBlock (fuse_helper.py, residual on
        # the raw inputs), GDINO's residual base is the NORMALIZED features
        # (fuse_modules.py:287-295: v = LN(v); ... v = v + gamma*dv)
        vn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm_v")(v)
        ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm_l")(l)
        dv, dl = BiMultiHeadAttention(
            v_dim=self.v_dim, l_dim=self.l_dim, embed_dim=self.embed_dim,
            num_heads=self.num_heads, dtype=self.dtype, name="attn",
        )(vn, ln, mask_l, deterministic)
        v = vn + gamma_v.astype(dv.dtype) * dv
        l = ln + gamma_l.astype(dl.dtype) * dl
        return v, l


class DeformableEncoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 2048
    n_heads: int = 8
    n_levels: int = 4
    n_points: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes, deterministic=True):
        src2 = MSDeformAttn(
            embed_dim=self.d_model, num_heads=self.n_heads,
            num_levels=self.n_levels, num_points=self.n_points,
            dtype=self.dtype, name="self_attn",
        )(src + pos, src, reference_points, spatial_shapes)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src + src2)
        y = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(src)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(y)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src + y)


class DecoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 2048
    n_heads: int = 8
    n_levels: int = 4
    n_points: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, tgt, query_pos, reference_points_input, memory, spatial_shapes,
        memory_text, text_mask, deterministic=True,
    ):
        b, q, c = tgt.shape
        nh = self.n_heads
        hd = c // nh

        # self attention
        def split(x):
            return x.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)

        qk = tgt + query_pos
        qh = split(nn.Dense(c, dtype=self.dtype, name="sa_q")(qk))
        kh = split(nn.Dense(c, dtype=self.dtype, name="sa_k")(qk))
        vh = split(nn.Dense(c, dtype=self.dtype, name="sa_v")(tgt))
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32) / (hd**0.5)
        probs = jax.nn.softmax(scores, -1).astype(self.dtype)
        sa = jnp.einsum("bhqk,bhkd->bhqd", probs, vh, preferred_element_type=jnp.float32)
        sa = sa.astype(self.dtype).transpose(0, 2, 1, 3).reshape(b, q, c)
        sa = nn.Dense(c, dtype=self.dtype, name="sa_out")(sa)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt + sa)

        # text cross attention
        qh = split(nn.Dense(c, dtype=self.dtype, name="ca_text_q")(tgt + query_pos))
        kh = split(nn.Dense(c, dtype=self.dtype, name="ca_text_k")(memory_text))
        vh = split(nn.Dense(c, dtype=self.dtype, name="ca_text_v")(memory_text))
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32) / (hd**0.5)
        if text_mask is not None:
            scores = jnp.where(text_mask[:, None, None, :] > 0, scores, -1e9)
        probs = jax.nn.softmax(scores, -1).astype(self.dtype)
        ca = jnp.einsum("bhqk,bhkd->bhqd", probs, vh, preferred_element_type=jnp.float32)
        ca = ca.astype(self.dtype).transpose(0, 2, 1, 3).reshape(b, q, c)
        ca = nn.Dense(c, dtype=self.dtype, name="ca_text_out")(ca)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="catext_norm")(tgt + ca)

        # deformable cross attention over memory
        cross = MSDeformAttn(
            embed_dim=self.d_model, num_heads=self.n_heads,
            num_levels=self.n_levels, num_points=self.n_points,
            dtype=self.dtype, name="cross_attn",
        )(tgt + query_pos, memory, reference_points_input, spatial_shapes)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt + cross)

        y = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(tgt)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(y)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt + y)


class MLP(nn.Module):
    hidden: int
    out: int
    layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name=f"layers_{i}")(x))
        return nn.Dense(self.out, dtype=self.dtype, name=f"layers_{self.layers - 1}")(x)


def contrastive_embed(queries, text, text_mask, max_text_len=256):
    """utils.py:233-268: query-text dot logits padded to max_text_len."""
    res = jnp.einsum("bqc,btc->bqt", queries, text, preferred_element_type=jnp.float32)
    res = jnp.where(text_mask[:, None, :] > 0, res, -jnp.inf)
    t = res.shape[-1]
    if t < max_text_len:
        pad = jnp.full(res.shape[:-1] + (max_text_len - t,), -jnp.inf)
        res = jnp.concatenate([res, pad], -1)
    return res


class MQGroundingDINO(nn.Module):
    """The full MQ-GroundingDINO-T detector."""

    # Swin-T
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads_swin: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    # transformer
    hidden_dim: int = 256
    n_heads: int = 8
    d_ffn: int = 2048
    enc_layers: int = 6
    dec_layers: int = 6
    num_queries: int = 900
    num_feature_levels: int = 4
    enc_points: int = 4
    dec_points: int = 4
    max_text_len: int = 256
    # language (QVBert + GCP, shared with MQ-GLIP)
    lang_layers: int = 12
    lang_dim: int = 768
    lang_heads: int = 12
    lang_intermediate: int = 3072
    vocab_size: int = 30522
    start_qv_layer: int = 6
    vision_scale: float = 1.0
    # [CLS] [SEP] . ?  ids (bertwarper.py special tokens; groundingdino.py:196
    # derives them from the tokenizer — override for non-standard vocabs)
    special_ids: Sequence[int] = (101, 102, 1012, 1029)
    # append encoder/two-stage intermediates to the output dict (parity tests)
    debug_outputs: bool = False
    dtype: Dtype = jnp.float32

    @classmethod
    def from_config(cls, cfg, dtype=None, special_ids=None):
        dt = dtype or getattr(jnp, cfg.TPU.COMPUTE_DTYPE)
        g = cfg.GROUNDINGDINO
        extra = {}
        if special_ids is not None:
            extra["special_ids"] = tuple(int(i) for i in special_ids)
        return cls(
            **extra,
            embed_dim=cfg.MODEL.SWINT.EMBED_DIM,
            depths=tuple(cfg.MODEL.SWINT.DEPTHS),
            num_heads_swin=tuple(cfg.MODEL.SWINT.NUM_HEADS),
            window_size=cfg.MODEL.SWINT.WINDOW_SIZE,
            hidden_dim=g.hidden_dim,
            n_heads=g.nheads,
            d_ffn=g.dim_feedforward,
            enc_layers=g.enc_layers,
            dec_layers=g.dec_layers,
            num_queries=g.num_queries,
            num_feature_levels=g.num_feature_levels,
            enc_points=g.enc_n_points,
            dec_points=g.dec_n_points,
            max_text_len=g.max_text_len,
            lang_layers=cfg.MODEL.LANGUAGE_BACKBONE.HIDDEN_LAYERS,
            lang_dim=cfg.MODEL.LANGUAGE_BACKBONE.LANG_DIM,
            lang_heads=cfg.MODEL.LANGUAGE_BACKBONE.NUM_HEADS,
            lang_intermediate=cfg.MODEL.LANGUAGE_BACKBONE.INTERMEDIATE_SIZE,
            vocab_size=cfg.MODEL.LANGUAGE_BACKBONE.VOCAB_SIZE,
            start_qv_layer=cfg.VISION_QUERY.START_QV_LAYER,
            vision_scale=cfg.VISION_QUERY.VISION_SCALE,
            dtype=dt,
        )

    def setup(self):
        c = self.hidden_dim
        # GDINO's swin norms only out_indices=(1, 2, 3)
        # (backbone.py:140,202, defaults.py:951) — no norm0
        self.backbone = SwinTransformer(
            embed_dim=self.embed_dim, depths=self.depths,
            num_heads=self.num_heads_swin, window_size=self.window_size,
            norm_stage0=False, dtype=self.dtype, name="backbone",
        )
        n_proj = min(self.num_feature_levels, 4)
        self.input_proj_convs = [
            nn.Conv(c, (1, 1), dtype=self.dtype, name=f"input_proj_{i}_conv")
            for i in range(3)
        ] + (
            [nn.Conv(c, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                     name="input_proj_3_conv")]
            if n_proj > 3 else []
        )
        self.input_proj_gns = [
            nn.GroupNorm(num_groups=min(32, c), dtype=self.dtype,
                         name=f"input_proj_{i}_gn")
            for i in range(n_proj)
        ]
        self.language_backbone = LanguageBackbone(
            num_layers=self.lang_layers, hidden_size=self.lang_dim,
            num_heads=self.lang_heads, intermediate_size=self.lang_intermediate,
            vocab_size=self.vocab_size, start_qv_layer=self.start_qv_layer,
            vision_dim=c, vision_scale=self.vision_scale, dtype=self.dtype,
            name="language_backbone",
        )
        self.feat_map = nn.Dense(c, dtype=self.dtype, name="feat_map")
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.num_feature_levels, c),
        )
        # fusion embed = dim_feedforward // 2, heads = nhead // 2; the text
        # enhancer likewise halves both (transformer.py:89-103)
        self.enc_fusions = [
            FusionLayer(v_dim=c, l_dim=c, embed_dim=self.d_ffn // 2,
                        num_heads=self.n_heads // 2, dtype=self.dtype,
                        name=f"enc_fusion_{i}")
            for i in range(self.enc_layers)
        ]
        self.enc_texts = [
            TextEnhancerLayer(d_model=c, n_heads=self.n_heads // 2,
                              d_ffn=self.d_ffn // 2, dtype=self.dtype,
                              name=f"enc_text_{i}")
            for i in range(self.enc_layers)
        ]
        self.enc_deforms = [
            DeformableEncoderLayer(
                d_model=c, d_ffn=self.d_ffn, n_heads=self.n_heads,
                n_levels=self.num_feature_levels, n_points=self.enc_points,
                dtype=self.dtype, name=f"enc_layer_{i}")
            for i in range(self.enc_layers)
        ]
        self.enc_output = nn.Dense(c, dtype=self.dtype, name="enc_output")
        self.enc_output_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="enc_output_norm")
        self.enc_out_bbox_embed = MLP(c, 4, dtype=self.dtype, name="enc_out_bbox_embed")
        self.tgt_embed = self.param(
            "tgt_embed", nn.initializers.normal(1.0), (self.num_queries, c)
        )
        self.ref_point_head = MLP(c, c, layers=2, dtype=self.dtype, name="ref_point_head")
        self.dec_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="dec_norm")  # shared
        self.dec_layers_mods = [
            DecoderLayer(
                d_model=c, d_ffn=self.d_ffn, n_heads=self.n_heads,
                n_levels=self.num_feature_levels, n_points=self.dec_points,
                dtype=self.dtype, name=f"dec_layer_{i}")
            for i in range(self.dec_layers)
        ]
        self.bbox_embeds = [
            MLP(c, 4, dtype=self.dtype, name=f"bbox_embed_{i}")
            for i in range(self.dec_layers)
        ]

    def encode_image(self, images: jnp.ndarray, deterministic: bool = True):
        """Text-independent image tower: Swin stages 1..3 + input_proj ->
        `num_feature_levels` NHWC maps at strides 8/16/32/64
        (groundingdino.py:475-496 backbone + input_proj)."""
        images = images.astype(self.dtype)
        stages = self.backbone(images, deterministic=deterministic)
        feats = stages[1:4]  # strides 8, 16, 32 (groundingdino.py return_interm)
        srcs = []
        for i, f in enumerate(feats):
            x = self.input_proj_convs[i](f)
            srcs.append(self.input_proj_gns[i](x))
        if self.num_feature_levels > len(srcs):
            x = self.input_proj_convs[3](feats[-1])
            srcs.append(self.input_proj_gns[3](x))
        return srcs

    def forward_head(
        self,
        srcs: List[jnp.ndarray],
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        queries: Optional[jnp.ndarray] = None,
        query_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        """Text-dependent part: QVBert+GCP -> deformable encoder/decoder ->
        per-layer heads. `srcs` may have batch 1 while text has batch C
        (chunk parallelism); features are broadcast to the text batch."""
        b = input_ids.shape[0]
        c = self.hidden_dim
        if srcs[0].shape[0] == 1 and b > 1:
            srcs = [jnp.broadcast_to(s, (b,) + s.shape[1:]) for s in srcs]

        spatial_shapes = [(s.shape[1], s.shape[2]) for s in srcs]

        # ---- text encoder: QVBert + GCP (shared module) --------------------
        image_tokens = None
        if queries is not None:
            parts = []
            for s in srcs:
                p = nn.avg_pool(s, (2, 2), strides=(2, 2))
                parts.append(p.reshape(b, -1, c))
            image_tokens = jnp.concatenate(parts, axis=1)

        attn_matrix, position_ids = sub_sentence_masks(
            input_ids, self.special_ids
        )
        lang = self.language_backbone(
            input_ids, attention_mask,
            queries=queries.astype(self.dtype) if queries is not None else None,
            query_mask=query_mask, image_tokens=image_tokens,
            attention_matrix=attn_matrix, position_ids=position_ids,
            deterministic=deterministic,
        )
        text = self.feat_map(lang["hidden"])
        text_mask = attention_mask

        # ---- flatten levels + positional embeds ----------------------------
        src_flat, pos_flat = [], []
        for lvl, s in enumerate(srcs):
            h, w = spatial_shapes[lvl]
            pos = sine_pos_embed_2d(h, w, (h, w), num_pos_feats=c // 2)
            pos = pos[None].astype(self.dtype) + self.level_embed[lvl].astype(self.dtype)
            src_flat.append(s.reshape(b, -1, c))
            pos_flat.append(jnp.broadcast_to(pos.reshape(1, -1, c), (b, h * w, c)))
        memory = jnp.concatenate(src_flat, 1)
        pos_embed = jnp.concatenate(pos_flat, 1)

        # encoder reference points (transformer.py:466-481, valid_ratios=1)
        refs = []
        for h, w in spatial_shapes:
            ry = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            rx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
            grid = jnp.stack(jnp.meshgrid(rx, ry, indexing="xy"), -1).reshape(-1, 2)
            refs.append(grid)
        enc_ref = jnp.concatenate(refs, 0)[None, :, None, :]
        enc_ref = jnp.broadcast_to(
            enc_ref, (b, enc_ref.shape[1], self.num_feature_levels, 2)
        )

        pos_text = sine_embed_1d(position_ids.astype(jnp.float32), c).astype(self.dtype)

        # ---- encoder --------------------------------------------------------
        for i in range(self.enc_layers):
            memory, text = self.enc_fusions[i](memory, text, text_mask, deterministic)
            text = self.enc_texts[i](text, attn_matrix, pos_text, deterministic)
            memory = self.enc_deforms[i](
                memory, pos_embed, enc_ref, spatial_shapes, deterministic
            )

        # ---- two-stage proposals (utils.py gen_encoder_output_proposals) ---
        proposals = []
        for lvl, (h, w) in enumerate(spatial_shapes):
            gy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            gx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
            grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), -1).reshape(-1, 2)
            wh = jnp.full_like(grid, 0.05 * (2.0**lvl))
            proposals.append(jnp.concatenate([grid, wh], -1))
        output_proposals = jnp.concatenate(proposals, 0)[None]  # (1, S, 4)
        valid_prop = jnp.all(
            (output_proposals > 0.01) & (output_proposals < 0.99), -1, keepdims=True
        )
        output_proposals = inverse_sigmoid(output_proposals)
        output_proposals = jnp.where(valid_prop, output_proposals, jnp.inf)
        output_proposals = jnp.broadcast_to(
            output_proposals, (b,) + output_proposals.shape[1:]
        )

        # invalid-proposal positions are ZEROED in the memory before the
        # enc_output projection, and the topk runs UNMASKED over the class
        # maxima (gen_encoder_output_proposals utils.py:96-99 +
        # transformer.py:292-306) — invalid cells all carry the identical
        # zeroed-feature score and lose naturally
        output_memory = jnp.where(valid_prop, memory, 0.0)
        output_memory = self.enc_output_norm(self.enc_output(output_memory))
        enc_logits = contrastive_embed(
            output_memory.astype(jnp.float32), text.astype(jnp.float32),
            text_mask, self.max_text_len,
        )
        enc_boxes_unsig = self.enc_out_bbox_embed(
            output_memory
        ).astype(jnp.float32) + output_proposals

        topk_scores = jnp.max(
            jnp.where(jnp.isfinite(enc_logits), enc_logits, -jnp.inf), -1
        )
        _, topk_idx = jax.lax.top_k(topk_scores, self.num_queries)  # (B, nq)
        ref_unsig = jnp.take_along_axis(
            enc_boxes_unsig, topk_idx[..., None], axis=1
        )
        ref_unsig = jax.lax.stop_gradient(ref_unsig)
        init_ref = jax.nn.sigmoid(ref_unsig)

        tgt = jnp.broadcast_to(
            self.tgt_embed[None].astype(self.dtype), (b, self.num_queries, c)
        )

        # ---- decoder with iterative refinement ------------------------------
        reference = init_ref
        outputs_classes, outputs_coords = [], []
        for i in range(self.dec_layers):
            ref_input = jnp.broadcast_to(
                reference[:, :, None, :],
                (b, self.num_queries, self.num_feature_levels, 4),
            )
            sine = gen_sineembed_for_position(reference).astype(self.dtype)  # (B, Q, 512)
            query_pos = self.ref_point_head(sine)
            tgt = self.dec_layers_mods[i](
                tgt, query_pos, ref_input, memory, spatial_shapes, text,
                text_mask, deterministic,
            )
            normed = self.dec_norm(tgt)
            delta = self.bbox_embeds[i](normed)
            new_ref = jax.nn.sigmoid(
                delta.astype(jnp.float32) + inverse_sigmoid(reference)
            )
            logits = contrastive_embed(
                normed.astype(jnp.float32), text.astype(jnp.float32),
                text_mask, self.max_text_len,
            )
            outputs_classes.append(logits)
            outputs_coords.append(new_ref)
            reference = jax.lax.stop_gradient(new_ref)

        out = {
            "pred_logits": outputs_classes[-1],   # (B, Q, max_text_len)
            "pred_boxes": outputs_coords[-1],     # (B, Q, 4) cxcywh in [0,1]
            "aux_logits": outputs_classes[:-1],
            "aux_boxes": outputs_coords[:-1],
            "enc_logits": enc_logits,
            "enc_boxes": jax.nn.sigmoid(enc_boxes_unsig),
            "lang": lang,
        }
        if self.debug_outputs:
            out["dbg_memory"] = memory
            out["dbg_text"] = text
            out["dbg_output_memory"] = output_memory
            out["dbg_topk_idx"] = topk_idx
            out["dbg_init_ref"] = init_ref
        return out

    def __call__(
        self,
        images: jnp.ndarray,           # (B, H, W, 3)
        input_ids: jnp.ndarray,        # (B, T)
        attention_mask: jnp.ndarray,   # (B, T)
        queries: Optional[jnp.ndarray] = None,      # (B, V, 256)
        query_mask: Optional[jnp.ndarray] = None,   # (B, V, T)
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        srcs = self.encode_image(images, deterministic)
        return self.forward_head(
            srcs, input_ids, attention_mask, queries, query_mask, deterministic
        )


def gdino_postprocess(
    pred_logits, pred_boxes, agg_map, image_sizes, box_threshold: float = 0.05
):
    """convert_groundingdino_to_glip_output (groundingdino.py:291-335):
    sigmoid token logits -> per-class MEAN over positive-map tokens
    (convert_grounding_to_od_logits, rpn/inference.py:772-790) -> per-box
    TOP-1 class with GROUNDINGDINO.box_threshold, cxcywh -> xyxy scaled to
    the true image size, clipped (clip_to_image remove_empty=False). No NMS
    — DETR-style outputs are already a sparse query set.

    agg_map rows are row-normalized, so the einsum IS the per-class MEAN.
    Output is the fixed-capacity Detections array (one slot per query)."""
    probs = jax.nn.sigmoid(
        jnp.where(jnp.isfinite(pred_logits), pred_logits, -1e9)
    )  # (B, Q, max_text_len)
    # logits are padded to max_text_len >= T; the pad region sigmoids to 0
    # and carries no positive-map mass, so restrict to the caption's T
    probs = probs[..., : agg_map.shape[-1]]
    scores_cls = jnp.einsum("bqt,blt->bql", probs, agg_map)  # (B, Q, L)
    best = jnp.max(scores_cls, axis=-1)                      # (B, Q)
    lab = jnp.argmax(scores_cls, axis=-1).astype(jnp.int32) + 1
    boxes = cxcywh_to_xyxy(pred_boxes)
    scale = jnp.stack(
        [image_sizes[:, 1], image_sizes[:, 0], image_sizes[:, 1], image_sizes[:, 0]],
        -1,
    )[:, None, :]
    boxes = boxes * scale
    boxes = jnp.clip(boxes, 0.0, jnp.maximum(scale - 1.0, 0.0))
    from mqdet_tpu.core.detections import Detections

    return Detections(
        boxes=boxes.astype(jnp.float32),
        scores=best.astype(jnp.float32),
        labels=lab,
        valid=best > box_threshold,
    )
