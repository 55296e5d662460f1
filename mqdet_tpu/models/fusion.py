"""Deep early fusion (X-MHA) between image pyramid and text.

Capability twin of BiMultiHeadAttention / BiAttentionBlockForCheckpoint
(maskrcnn_benchmark/utils/fuse_helper.py:171-427), MHA-B config: the five
FPN levels are flattened into one visual sequence, a single bidirectional
cross-attention updates both modalities, layer-scale residuals
(gamma init 1/NUM_CONVS) stabilize training.

bf16 on TPU removes the need for the reference's fp16 +-50000 clamps; the
language-softmax max-subtraction (fuse_helper.py:252-254) is kept since it is
part of the reference numerics (softmax is shift-invariant, so this is free).
"""
from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class BiMultiHeadAttention(nn.Module):
    v_dim: int = 256
    l_dim: int = 768
    embed_dim: int = 2048
    num_heads: int = 8
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, v, l, attention_mask_l=None, deterministic=True):
        """v: (B, N, v_dim); l: (B, T, l_dim); mask_l: (B, T) 1=valid."""
        b, n, _ = v.shape
        t = l.shape[1]
        h = self.num_heads
        d = self.embed_dim // h
        scale = d**-0.5

        q = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(v) * scale
        k = nn.Dense(self.embed_dim, dtype=self.dtype, name="l_proj")(l)
        vv = nn.Dense(self.embed_dim, dtype=self.dtype, name="values_v_proj")(v)
        vl = nn.Dense(self.embed_dim, dtype=self.dtype, name="values_l_proj")(l)

        def split_heads(x):
            return x.reshape(b, -1, h, d).transpose(0, 2, 1, 3)

        q, k, vv, vl = map(split_heads, (q, k, vv, vl))

        # The (B, H, N, T) attention tensor is ~0.5 GB at LVIS eval shapes and
        # is read back twice (v- and l-side) — keep it in the compute dtype
        # (MXU still accumulates f32 internally) and run the softmax with f32
        # reduction; an f32 materialization doubles the HBM bill of the
        # fusion stage.
        attn = jnp.einsum("bhnd,bhtd->bhnt", q, k)

        def softmax_f32acc(x, axis):
            m = jax.lax.stop_gradient(x.max(axis=axis, keepdims=True))
            e = jnp.exp((x - m).astype(jnp.float32))
            return (e / e.sum(axis=axis, keepdims=True)).astype(x.dtype)

        # language attention: softmax over the vision axis, computed in place
        # (the reference transposes first, fuse_helper.py:252-254 — a 0.5 GB
        # relayout at eval shapes; softmax over axis -2 is equivalent)
        attn_l = softmax_f32acc(attn, -2)

        if attention_mask_l is not None:
            bias = jnp.where(
                attention_mask_l[:, None, None, :] == 0, -9e15, 0.0
            ).astype(attn.dtype)
            attn = attn + bias
        attn_v = softmax_f32acc(attn, -1)

        attn_v = nn.Dropout(self.dropout)(attn_v, deterministic=deterministic)
        attn_l = nn.Dropout(self.dropout)(attn_l, deterministic=deterministic)

        out_v = jnp.einsum(
            "bhnt,bhtd->bhnd", attn_v.astype(vl.dtype), vl,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        out_l = jnp.einsum(
            "bhnt,bhnd->bhtd", attn_l.astype(vv.dtype), vv,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)

        out_v = out_v.transpose(0, 2, 1, 3).reshape(b, n, self.embed_dim)
        out_l = out_l.transpose(0, 2, 1, 3).reshape(b, t, self.embed_dim)

        out_v = nn.Dense(self.v_dim, dtype=self.dtype, name="out_v_proj")(out_v)
        out_l = nn.Dense(self.l_dim, dtype=self.dtype, name="out_l_proj")(out_l)
        return out_v, out_l


class BiAttentionBlock(nn.Module):
    """Pre-LN bi-attention with layer-scale residuals (fuse_helper.py:309-427)."""

    v_dim: int = 256
    l_dim: int = 768
    embed_dim: int = 2048
    num_heads: int = 8
    dropout: float = 0.1
    init_value: float = 1.0 / 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, v, l, attention_mask_l=None, deterministic=True):
        gamma_v = self.param("gamma_v", nn.initializers.constant(self.init_value), (self.v_dim,))
        gamma_l = self.param("gamma_l", nn.initializers.constant(self.init_value), (self.l_dim,))
        vn = nn.LayerNorm(dtype=self.dtype, name="layer_norm_v")(v)
        ln = nn.LayerNorm(dtype=self.dtype, name="layer_norm_l")(l)
        dv, dl = BiMultiHeadAttention(
            v_dim=self.v_dim, l_dim=self.l_dim, embed_dim=self.embed_dim,
            num_heads=self.num_heads, dropout=self.dropout, dtype=self.dtype,
            name="attn",
        )(vn, ln, attention_mask_l, deterministic)
        # NOTE (reference semantics, fuse_helper.py:417-421): the residual is
        # added to the NORMED inputs, not the raw ones.
        v = vn + gamma_v.astype(dv.dtype) * dv
        l = ln + gamma_l.astype(dl.dtype) * dl
        return v, l


def flatten_levels(feats: List[jnp.ndarray]) -> Tuple[jnp.ndarray, List[Tuple[int, int]]]:
    """[(B, H, W, C)] -> (B, sum(HW), C) plus sizes for unflattening."""
    sizes = [(f.shape[1], f.shape[2]) for f in feats]
    flat = jnp.concatenate([f.reshape(f.shape[0], -1, f.shape[-1]) for f in feats], axis=1)
    return flat, sizes


def unflatten_levels(flat: jnp.ndarray, sizes) -> List[jnp.ndarray]:
    outs = []
    start = 0
    b, _, c = flat.shape
    for h, w in sizes:
        outs.append(flat[:, start : start + h * w].reshape(b, h, w, c))
        start += h * w
    return outs


class VLFuse(nn.Module):
    """Early-fusion stage (vldyhead.py VLFuse, MHA-B path): flatten the five
    levels, one bi-attention call, unflatten."""

    num_convs: int = 6
    v_dim: int = 256
    l_dim: int = 768
    embed_dim: int = 2048
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, visual: List[jnp.ndarray], lang_hidden, lang_masks, deterministic=True):
        flat, sizes = flatten_levels(visual)
        new_v, new_l = BiAttentionBlock(
            v_dim=self.v_dim, l_dim=self.l_dim, embed_dim=self.embed_dim,
            num_heads=self.num_heads, init_value=1.0 / self.num_convs,
            dtype=self.dtype, name="b_attn",
        )(flat, lang_hidden, lang_masks, deterministic)
        return unflatten_levels(new_v, sizes), new_l
