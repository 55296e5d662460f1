"""BERT language backbone with interleaved GCP gated cross-attention.

Capability twin of the reference QVBertModel stack
(maskrcnn_benchmark/modeling/language_backbone/modeling_bert_new.py:
 MaskedCrossAttention :129-249, GatedCrossAttentionBlock :251-374,
 PreSelectModule :377-448, QVBertEncoder :522-639, QVBertModel :642-848)
and the BertEncoder wrapper (bert_model_new.py:13-104).

TPU-first notes:
  * The reference builds a *sparse* per-token gather so each text token only
    attends to its own class's <=k queries (`_construct_sparse_inputs`). Here
    the default is an equivalent *dense masked* cross-attention: with
    T=256 tokens and V<=40*k queries per chunk the masked QK^T is a tiny MXU
    matmul and XLA fuses the mask. The numerics match the reference path:
    additive -1e4 on masked logits then hard zeroing of masked probabilities,
    so a token with no queries receives exactly zero attention output and the
    gated residual reduces to identity.
  * All shapes are static: (B, V, 256) padded query tensors and
    (B, V, T) masks form the device ABI; ragged selection happens host-side.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mqdet_tpu.models.layers import GCPFeedForward

Dtype = Any

MASK_FILL = -1e4  # modeling_bert_new.py:221 (half-safe additive mask)


class MaskedCrossAttention(nn.Module):
    """Cross-attention where key/value tokens are masked per query token.

    attention_mask convention follows the reference: (B, V, T) with 1 where
    vision token v may be attended by text token t.
    """

    input_dim: int
    output_dim: Optional[int] = None
    dim_head: int = 64
    heads: int = 8
    norm_kv: bool = True
    # VISION_QUERY.SHARE_KV (modeling_bert_new.py MaskedCrossAttention):
    # keys and values share one projection ("only for efficiency")
    share_kv: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, vision, attention_mask=None):
        """x: (B, T, D); vision: (B, V, Dv); mask: (B, V, T) or None."""
        out_dim = self.output_dim or self.input_dim
        inner = self.dim_head * self.heads
        h = self.heads

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        if self.norm_kv:
            vision = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_kv_ln")(vision)

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        if self.share_kv:
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_kv")(vision)
            v = k
        else:
            kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype, name="to_kv")(vision)
            k, v = jnp.split(kv, 2, axis=-1)

        b, t, _ = q.shape
        vlen = k.shape[1]
        q = q.reshape(b, t, h, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(b, vlen, h, self.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(b, vlen, h, self.dim_head).transpose(0, 2, 1, 3)

        q = q * (self.dim_head**-0.5)
        # scores stay in the compute dtype: an f32 materialization of the
        # (B, H, T, V) tensor is what made PreSelect (T=200 queries x ~6k
        # image tokens at LVIS eval shapes) ~70x slower than this form. The
        # softmax still reduces in f32 (exp below).
        sim = jnp.einsum("bhtd,bhvd->bhtv", q, k)

        if attention_mask is not None:
            mask_tv = attention_mask.transpose(0, 2, 1)  # (B, T, V)
            sim = sim + jnp.where(
                mask_tv[:, None] == 0, MASK_FILL, 0.0
            ).astype(sim.dtype)

        m = jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
        e = jnp.exp((sim - m).astype(jnp.float32))
        attn = e / e.sum(axis=-1, keepdims=True)
        if attention_mask is not None:
            # hard-zero masked probs so no-query tokens output exactly 0
            attn = attn * (mask_tv[:, None] != 0)

        out = jnp.einsum(
            "bhtv,bhvd->bhtd", attn.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, inner)
        return nn.Dense(out_dim, use_bias=False, dtype=self.dtype, name="to_out")(out)


class GatedCrossAttentionBlock(nn.Module):
    """GCP block (modeling_bert_new.py:251-374).

    x <- attn(x, queries) * tanh(gate(attn_out)) + x
    x <- ff(x) * tanh(ff_gate) + x
    Gates initialize to 0 -> the block is an identity at step 0, so the
    frozen detector's behavior is untouched before modulated training.
    """

    dim: int
    dim_head: int = 64
    heads: int = 8
    ff_mult: float = 4.0
    condition_gate: bool = True
    nonlinear_gate: bool = True
    # VISION_QUERY.NO_CAT (default True, all MQ-Det configs): gate input is
    # the attention output alone; False is the reference's debug variant
    # that concatenates [attn_out, x] (modeling_bert_new.py:272-277,358-361)
    no_cat: bool = True
    # VISION_QUERY.FIX_ATTN_GATE: -1 = learned gates; otherwise both gates
    # are this constant and no gate params exist (modeling_bert_new.py:354-371)
    fix_attn_gate: float = -1.0
    # VISION_QUERY.ADD_ADAPT_LAYER: residual FeedForward adaptor on the
    # queries before cross-attention (modeling_bert_new.py:291-292,347-348)
    add_adapt_layer: bool = False
    share_kv: bool = False
    enable_ffn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, vision, attention_mask=None):
        if self.add_adapt_layer:
            vision = GCPFeedForward(
                dim=vision.shape[-1], mult=2.0, dtype=self.dtype,
                name="adaptor",
            )(vision) + vision

        supported = MaskedCrossAttention(
            input_dim=self.dim, dim_head=self.dim_head, heads=self.heads,
            norm_kv=True, share_kv=self.share_kv, dtype=self.dtype,
            name="attn",
        )(x, vision, attention_mask)

        fixed = self.fix_attn_gate != -1.0
        if fixed:
            attn_gate = jnp.asarray(self.fix_attn_gate, x.dtype)
        elif self.condition_gate:
            if self.nonlinear_gate:
                gate_in = (
                    supported
                    if self.no_cat
                    else jnp.concatenate([supported, x], axis=-1)
                )
                gate_logit = GCPFeedForward(
                    dim=gate_in.shape[-1], mult=0.5, out_dim=1,
                    zero_init_out=True, dtype=self.dtype, name="attn_gate",
                )(gate_in)
            else:
                gate_logit = nn.Dense(
                    1, use_bias=False, kernel_init=nn.initializers.zeros,
                    dtype=self.dtype, name="attn_gate",
                )(supported)
            attn_gate = jnp.tanh(gate_logit)
        else:
            g = self.param("attn_gate", nn.initializers.zeros, ())
            attn_gate = jnp.tanh(g).astype(x.dtype)

        # gate telemetry (VISION_QUERY.RETURN_ATTN_GATE_VALUE,
        # generalized_vl_rcnn_new.py:512-514): visible when callers apply
        # with mutable=["intermediates"]; free otherwise
        self.sow(
            "intermediates", "attn_gate_value",
            jnp.mean(jnp.abs(attn_gate.astype(jnp.float32))),
        )

        x = supported * attn_gate + x

        if self.enable_ffn:
            y = GCPFeedForward(dim=self.dim, mult=self.ff_mult, dtype=self.dtype, name="ff")(x)
            if fixed:
                x = y * jnp.asarray(self.fix_attn_gate, x.dtype) + x
            else:
                ff_gate = self.param("ff_gate", nn.initializers.zeros, ())
                x = y * jnp.tanh(ff_gate).astype(x.dtype) + x
        return x


class PreSelectBlock(nn.Module):
    """modeling_bert_new.py:377-412: queries cross-attend to image tokens."""

    dim: int
    out_dim: int
    dim_head: int = 32
    heads: int = 8
    ff_mult: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, vision, image):
        attended = MaskedCrossAttention(
            input_dim=self.dim, output_dim=self.out_dim, dim_head=self.dim_head,
            heads=self.heads, norm_kv=True, dtype=self.dtype, name="image_condition",
        )(vision, image)
        if self.dim != self.out_dim:
            res = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype, name="res_mapping")(vision)
        else:
            res = vision
        vision = attended + res
        vision = GCPFeedForward(dim=self.out_dim, mult=self.ff_mult, dtype=self.dtype, name="ff")(vision) + vision
        return vision


class PreSelectModule(nn.Module):
    """modeling_bert_new.py:414-448: condition bank queries on this image."""

    dim: int = 256
    out_dim: int = 768
    num_layers: int = 2
    vision_scale: float = 1.0
    # VISION_QUERY.AUGMENT_IMAGE_WITH_QUERY (modeling_bert_new.py:429-445):
    # the first block runs with roles swapped — image tokens attend to the
    # queries — and later blocks condition queries on the augmented image
    augment_image_with_query: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, vision, image):
        vision = vision * self.vision_scale
        image = image * self.vision_scale
        start = 0
        if self.augment_image_with_query:
            assert self.num_layers > 1
            image = PreSelectBlock(
                dim=self.dim, out_dim=self.dim, dtype=self.dtype, name="layers_0"
            )(image, vision)
            start = 1
        for i in range(start, self.num_layers - 1):
            vision = PreSelectBlock(
                dim=self.dim, out_dim=self.dim, dtype=self.dtype, name=f"layers_{i}"
            )(vision, image)
        vision = PreSelectBlock(
            dim=self.dim, out_dim=self.out_dim, dtype=self.dtype,
            name=f"layers_{self.num_layers - 1}",
        )(vision, image)
        return vision


# ---------------------------------------------------------------------------
# BERT proper
# ---------------------------------------------------------------------------


class BertSelfAttention(nn.Module):
    hidden_size: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, deterministic=True):
        h = self.num_heads
        d = self.hidden_size // h
        b, t, _ = x.shape
        q = nn.Dense(self.hidden_size, dtype=self.dtype, name="query")(x)
        k = nn.Dense(self.hidden_size, dtype=self.dtype, name="key")(x)
        v = nn.Dense(self.hidden_size, dtype=self.dtype, name="value")(x)
        q = q.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
        scores = scores / (d**0.5) + attn_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", probs, v, preferred_element_type=jnp.float32)
        return out.astype(self.dtype).transpose(0, 2, 1, 3).reshape(b, t, self.hidden_size)


class BertLayer(nn.Module):
    hidden_size: int = 768
    num_heads: int = 12
    intermediate_size: int = 3072
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, deterministic=True):
        attn = BertSelfAttention(
            self.hidden_size, self.num_heads, dtype=self.dtype, name="attention_self"
        )(x, attn_bias, deterministic)
        attn = nn.Dense(self.hidden_size, dtype=self.dtype, name="attention_output_dense")(attn)
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="attention_output_ln")(x + attn)

        inter = nn.Dense(self.intermediate_size, dtype=self.dtype, name="intermediate_dense")(x)
        inter = nn.gelu(inter, approximate=False)
        out = nn.Dense(self.hidden_size, dtype=self.dtype, name="output_dense")(inter)
        return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="output_ln")(x + out)


class BertEmbeddings(nn.Module):
    vocab_size: int = 30522
    hidden_size: int = 768
    max_position: int = 512
    type_vocab_size: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, deterministic=True, position_ids=None):
        b, t = input_ids.shape
        we = nn.Embed(self.vocab_size, self.hidden_size, dtype=self.dtype, name="word_embeddings")(input_ids)
        pos_ids = jnp.arange(t)[None] if position_ids is None else position_ids
        pe = nn.Embed(self.max_position, self.hidden_size, dtype=self.dtype, name="position_embeddings")(pos_ids)
        te = nn.Embed(self.type_vocab_size, self.hidden_size, dtype=self.dtype, name="token_type_embeddings")(
            jnp.zeros_like(input_ids)
        )
        x = we + pe + te
        return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="ln")(x)


class QVBertModel(nn.Module):
    """BERT-base with GCP blocks before layers >= start_qv_layer.

    Returns dict with last_hidden, hidden_states (per layer), and the
    ff-gate params it used (for the gate regularization loss).
    """

    num_layers: int = 12
    hidden_size: int = 768
    num_heads: int = 12
    intermediate_size: int = 3072
    vocab_size: int = 30522
    start_qv_layer: int = 6
    vision_dim: int = 256
    num_pre_select_layers: int = 2
    vision_scale: float = 1.0
    condition_gate: bool = True
    nonlinear_gate: bool = True
    no_cat: bool = True
    fix_attn_gate: float = -1.0
    add_adapt_layer: bool = False
    share_kv: bool = False
    augment_image_with_query: bool = False
    # VISION_QUERY.NEW_MASK_TOKEN (modeling_bert_new.py:454-460): replace the
    # embeddings of [MASK]-dropped tokens with a freshly learned token
    new_mask_token: bool = False
    mask_token_id: int = 103
    # activation recomputation for the 12 text layers (reference BERT
    # gradient checkpointing, modeling_bert_new.py:577-598); TPU.REMAT
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,         # (B, T)
        attention_mask: jnp.ndarray,    # (B, T) 1 = valid
        queries: Optional[jnp.ndarray] = None,        # (B, V, vision_dim)
        query_mask: Optional[jnp.ndarray] = None,     # (B, V, T)
        image_tokens: Optional[jnp.ndarray] = None,   # (B, I, vision_dim)
        attention_matrix: Optional[jnp.ndarray] = None,  # (B, T, T) bool
        position_ids: Optional[jnp.ndarray] = None,   # (B, T)
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        x = BertEmbeddings(
            vocab_size=self.vocab_size, hidden_size=self.hidden_size,
            dtype=self.dtype, name="embeddings",
        )(input_ids, deterministic, position_ids=position_ids)

        if self.new_mask_token:
            # replace dropped tokens' embeddings with a learned mask token
            mt = self.param(
                "mask_token", nn.initializers.normal(0.02),
                (self.hidden_size,),
            )
            is_masked = (input_ids == self.mask_token_id)[..., None]
            x = jnp.where(is_masked, mt.astype(x.dtype), x)

        if attention_matrix is not None:
            # sub-sentence block-diagonal masks (GDINO bertwarper.py:271-320);
            # the reference feeds the matrix ALONE as the BERT attention mask
            # (groundingdino.py:550-551) — padding tokens are already
            # self-only blocks, so no intersection with attention_mask
            attn_bias = (
                1.0 - attention_matrix[:, None].astype(jnp.float32)
            ) * -10000.0
        else:
            attn_bias = (
                1.0 - attention_mask[:, None, None, :].astype(jnp.float32)
            ) * -10000.0

        use_vision = queries is not None
        augmented_vision = None
        if use_vision and image_tokens is not None:
            vision = PreSelectModule(
                augment_image_with_query=self.augment_image_with_query,
                dim=self.vision_dim, out_dim=self.hidden_size,
                num_layers=self.num_pre_select_layers,
                vision_scale=self.vision_scale, dtype=self.dtype, name="pre_select",
            )(queries, image_tokens)
            augmented_vision = vision
        elif use_vision:
            vision = queries
        else:
            vision = None

        hidden_states = []
        for i in range(self.num_layers):
            if use_vision and i >= self.start_qv_layer:
                x = GatedCrossAttentionBlock(
                    dim=self.hidden_size, condition_gate=self.condition_gate,
                    nonlinear_gate=self.nonlinear_gate, no_cat=self.no_cat,
                    fix_attn_gate=self.fix_attn_gate,
                    add_adapt_layer=self.add_adapt_layer,
                    share_kv=self.share_kv, dtype=self.dtype,
                    name=f"qv_layer_{i - self.start_qv_layer}",
                )(x, vision, query_mask)
            layer_cls = (
                nn.remat(BertLayer, static_argnums=(3,))
                if self.remat
                else BertLayer
            )
            x = layer_cls(
                hidden_size=self.hidden_size, num_heads=self.num_heads,
                intermediate_size=self.intermediate_size, dtype=self.dtype,
                name=f"layer_{i}",
            )(x, attn_bias, deterministic)
            hidden_states.append(x)

        return {
            "last_hidden": x,
            "hidden_states": hidden_states,
            "augmented_vision": augmented_vision,
        }


class MLMHead(nn.Module):
    """BertLMPredictionHead (utils/fuse_helper.py:27-44): dense + gelu + LN +
    vocab decoder, used when MODEL.DYHEAD.FUSE_CONFIG.MLM_LOSS."""

    hidden_size: int = 768
    vocab_size: int = 30522
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="transform_dense")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="transform_ln")(x)
        return nn.Dense(self.vocab_size, dtype=self.dtype, name="decoder")(x)


class LanguageBackbone(nn.Module):
    """The BertEncoder wrapper (bert_model_new.py:13-104).

    Produces language_dict_features: aggregate / embedded / masks / hidden.
    """

    num_layers: int = 12
    hidden_size: int = 768
    num_heads: int = 12
    intermediate_size: int = 3072
    vocab_size: int = 30522
    n_agg_layers: int = 1
    start_qv_layer: int = 6
    vision_dim: int = 256
    vision_scale: float = 1.0
    condition_gate: bool = True
    nonlinear_gate: bool = True
    num_pre_select_layers: int = 2
    no_cat: bool = True
    fix_attn_gate: float = -1.0
    add_adapt_layer: bool = False
    share_kv: bool = False
    augment_image_with_query: bool = False
    new_mask_token: bool = False
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask,
        queries=None,
        query_mask=None,
        image_tokens=None,
        attention_matrix=None,
        position_ids=None,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        out = QVBertModel(
            num_layers=self.num_layers, hidden_size=self.hidden_size,
            num_heads=self.num_heads, intermediate_size=self.intermediate_size,
            vocab_size=self.vocab_size, start_qv_layer=self.start_qv_layer,
            vision_dim=self.vision_dim, vision_scale=self.vision_scale,
            condition_gate=self.condition_gate,
            nonlinear_gate=self.nonlinear_gate,
            num_pre_select_layers=self.num_pre_select_layers,
            no_cat=self.no_cat, fix_attn_gate=self.fix_attn_gate,
            add_adapt_layer=self.add_adapt_layer, share_kv=self.share_kv,
            augment_image_with_query=self.augment_image_with_query,
            new_mask_token=self.new_mask_token,
            remat=self.remat, dtype=self.dtype, name="bert",
        )(input_ids, attention_mask, queries, query_mask, image_tokens,
          attention_matrix, position_ids, deterministic)

        encoded = out["hidden_states"]
        n = self.n_agg_layers
        # bert_model_new.py:62-67: mean of last n layers, then / n again
        features = jnp.mean(jnp.stack(encoded[-n:], axis=1), axis=1) / n
        mask_f = attention_mask[..., None].astype(features.dtype)
        embedded = features * mask_f
        aggregate = embedded.sum(1) / attention_mask.sum(-1, keepdims=True).astype(features.dtype)

        return {
            "aggregate": aggregate,
            "embedded": embedded,
            "masks": attention_mask,
            "hidden": encoded[-1],
            "augmented_vision": out["augmented_vision"],
        }
