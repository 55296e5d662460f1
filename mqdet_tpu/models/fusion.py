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

        # Fused flash kernel (ops/pallas/bi_attention_pallas.py): both
        # attention directions in one pass over N, scores never reach HBM.
        # Eval path only — the XLA composite below keeps dropout for train —
        # and N must be large enough to amortize the kernel's tiling.
        import os

        impl = os.environ.get("MQDET_FUSION_IMPL", "pallas")
        use_flash = (
            impl == "pallas"
            and deterministic
            and jax.default_backend() != "cpu"
            and n >= 2048
            and d % 128 == 0
            and t % 128 == 0
        )
        if use_flash:
            from mqdet_tpu.ops.pallas.bi_attention_pallas import (
                flash_bi_attention,
            )

            bias = None
            if attention_mask_l is not None:
                bias = jnp.where(
                    attention_mask_l == 0, -9e15, 0.0
                ).astype(jnp.float32)
            out_v, out_l = flash_bi_attention(
                q, k, vv, vl, bias, num_heads=h
            )
            out_v = nn.Dense(self.v_dim, dtype=self.dtype, name="out_v_proj")(out_v)
            out_l = nn.Dense(self.l_dim, dtype=self.dtype, name="out_l_proj")(out_l)
            return out_v, out_l

        # Heads stay in place — (B, S, H, D) einsums let dot_general fold the
        # head split into the contraction instead of materializing four
        # (B, H, N, D) relayouts (~0.4 GB each at LVIS eval shapes).
        q = q.reshape(b, n, h, d)
        k = k.reshape(b, t, h, d)
        vv = vv.reshape(b, n, h, d)
        vl = vl.reshape(b, t, h, d)

        def softmax_f32acc(x, axis):
            m = jax.lax.stop_gradient(x.max(axis=axis, keepdims=True))
            e = jnp.exp((x - m).astype(jnp.float32))
            return (e / e.sum(axis=axis, keepdims=True)).astype(x.dtype)

        # Each side gets its own score tensor with its softmax axis MINOR
        # (lane-dim reductions; a shared tensor forces one side to reduce
        # across 2800 sublane tiles — measured 3x slower per fusion stage).
        # The duplicated q·k matmul is ~0.5 ms; the layout win is larger.
        # Both stay in compute dtype: the (B,H,N,T) pair is ~0.7 GB in bf16
        # at eval shapes and an f32 materialization doubles that HBM bill.
        attn_v = jnp.einsum("bnhd,bthd->bhnt", q, k)
        # language attention: softmax over the vision axis (the reference
        # transposes the shared tensor, fuse_helper.py:252-254 — same math)
        attn_l = jnp.einsum("bthd,bnhd->bhtn", k, q)
        attn_l = softmax_f32acc(attn_l, -1)

        if attention_mask_l is not None:
            bias = jnp.where(
                attention_mask_l[:, None, None, :] == 0, -9e15, 0.0
            ).astype(attn_v.dtype)
            attn_v = attn_v + bias
        attn_v = softmax_f32acc(attn_v, -1)

        attn_v = nn.Dropout(self.dropout)(attn_v, deterministic=deterministic)
        attn_l = nn.Dropout(self.dropout)(attn_l, deterministic=deterministic)

        out_v = jnp.einsum(
            "bhnt,bthd->bnhd", attn_v.astype(vl.dtype), vl,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        out_l = jnp.einsum(
            "bhtn,bnhd->bthd", attn_l.astype(vv.dtype), vv,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)

        out_v = out_v.reshape(b, n, self.embed_dim)
        out_l = out_l.reshape(b, t, self.embed_dim)

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
