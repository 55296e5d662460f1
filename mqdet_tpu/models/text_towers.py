"""Alternative language backbones: CLIP text transformer and RNN encoder.

Capability twins of the non-BERT entries in the reference language-backbone
registry (modeling/language_backbone/backbone.py:15-54):
  * CLIPTransformer (clip_model.py:69-199): token+positional embeddings,
    pre-LN residual attention blocks with QuickGELU MLP and key-padding
    masking (no causal mask — the reference passes attn_mask=None), final
    LayerNorm; returns the same language_dict {aggregate, embedded, masks,
    hidden} the detector consumes.
  * RNNEncoder (rnn_model.py): embedding -> dropout -> MLP -> (bi)LSTM/GRU,
    returning hidden/output/embedded.

The MQ-Det GCP only plugs into the BERT tower (as in the reference); these
towers serve the plain GLIP text path.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPResidualBlock(nn.Module):
    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_padding_bias, deterministic=True):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="attn",
        )(y, y, mask=key_padding_bias)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        y = nn.Dense(self.width * 4, dtype=self.dtype, name="mlp_fc")(y)
        y = quick_gelu(y)
        y = nn.Dense(self.width, dtype=self.dtype, name="mlp_proj")(y)
        return x + y


class CLIPTextTransformer(nn.Module):
    context_length: int = 256
    width: int = 512
    layers: int = 12
    heads: int = 8
    vocab_size: int = 49408
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic=True):
        emb = nn.Embed(
            self.vocab_size, self.width, dtype=self.dtype,
            name="token_embedding",
        )(input_ids)
        pos = self.param(
            "positional_embedding",
            nn.initializers.truncated_normal(0.02),
            (self.context_length, self.width),
        )
        x = emb + pos[None, : input_ids.shape[1], :].astype(emb.dtype)

        # key-padding mask -> boolean attention mask (B, 1, T, T)
        kp = attention_mask.astype(bool)
        attn_mask = kp[:, None, None, :] & jnp.ones(
            (1, 1, input_ids.shape[1], 1), bool
        )
        for i in range(self.layers):
            x = CLIPResidualBlock(
                self.width, self.heads, dtype=self.dtype, name=f"resblock_{i}"
            )(x, attn_mask, deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        return {
            "aggregate": x,
            "embedded": x,
            "masks": attention_mask,
            "hidden": x,
        }


class RNNEncoder(nn.Module):
    vocab_size: int = 30522
    word_embedding_size: int = 512
    word_vec_size: int = 512
    hidden_size: int = 512
    bidirectional: bool = True
    rnn_type: str = "lstm"  # lstm | gru
    input_dropout_p: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, deterministic=True):
        emb = nn.Embed(
            self.vocab_size, self.word_embedding_size, dtype=self.dtype,
            name="embedding",
        )(input_ids)
        emb = nn.Dropout(self.input_dropout_p)(emb, deterministic=deterministic)
        emb = nn.relu(nn.Dense(self.word_vec_size, dtype=self.dtype, name="mlp")(emb))

        cell = (
            nn.OptimizedLSTMCell(self.hidden_size, dtype=self.dtype)
            if self.rnn_type == "lstm"
            else nn.GRUCell(self.hidden_size, dtype=self.dtype)
        )
        fwd = nn.RNN(cell, name="rnn_fwd")(emb)
        if self.bidirectional:
            cell_b = (
                nn.OptimizedLSTMCell(self.hidden_size, dtype=self.dtype)
                if self.rnn_type == "lstm"
                else nn.GRUCell(self.hidden_size, dtype=self.dtype)
            )
            bwd = nn.RNN(cell_b, reverse=True, name="rnn_bwd")(emb)
            out = jnp.concatenate([fwd, bwd], axis=-1)
        else:
            out = fwd
        # masked final state (last valid step per sequence)
        if attention_mask is not None:
            lengths = attention_mask.sum(axis=1).astype(jnp.int32)
        else:
            lengths = jnp.full((input_ids.shape[0],), input_ids.shape[1], jnp.int32)
        idx = jnp.clip(lengths - 1, 0, input_ids.shape[1] - 1)
        final = jnp.take_along_axis(out, idx[:, None, None], axis=1)[:, 0]
        return {
            "hidden": out,
            "output": out,
            "embedded": emb,
            "final_output": final,
            "aggregate": final,
            "masks": attention_mask,
        }
