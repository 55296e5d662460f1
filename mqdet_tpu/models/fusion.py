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
        """v: (B, N, v_dim) — or a LIST of per-level (B, N_l, v_dim), in
        which case out_v is returned as a matching list and the levels are
        streamed through the attention without concatenation (the per-stage
        pyramid flatten was a measured ~55 ms/protocol of pure HBM traffic,
        PERF.md round-3 trace); l: (B, T, l_dim); mask_l: (B, T) 1=valid."""
        v_is_list = isinstance(v, (list, tuple))
        vs = list(v) if v_is_list else [v]
        b = vs[0].shape[0]
        n = sum(x.shape[1] for x in vs)
        t = l.shape[1]
        h = self.num_heads
        d = self.embed_dim // h
        scale = d**-0.5

        v_proj = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")
        l_proj = nn.Dense(self.embed_dim, dtype=self.dtype, name="l_proj")
        values_v_proj = nn.Dense(
            self.embed_dim, dtype=self.dtype, name="values_v_proj"
        )
        values_l_proj = nn.Dense(
            self.embed_dim, dtype=self.dtype, name="values_l_proj"
        )
        out_v_proj = nn.Dense(self.v_dim, dtype=self.dtype, name="out_v_proj")
        out_l_proj = nn.Dense(self.l_dim, dtype=self.dtype, name="out_l_proj")

        k = l_proj(l)
        vl = values_l_proj(l)

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
                flash_bi_attention_levels,
            )

            bias = None
            if attention_mask_l is not None:
                bias = jnp.where(
                    attention_mask_l == 0, -9e15, 0.0
                ).astype(jnp.float32)
            # MQDET_FLASH_LEVELS=concat (default) flattens the pyramid into
            # one buffer and runs a single kernel; =stream runs one
            # carried-state kernel per FPN level without concatenating.
            # On-chip A/B (PERF.md round 5): concat 1256 ms protocol p50 vs
            # stream 1352 ms — the 5 extra pallas_call fixed costs plus
            # re-reading k/vl per level outweigh the saved concat traffic,
            # so concat is the default and stream stays behind the env var.
            if v_is_list and os.environ.get(
                "MQDET_FLASH_LEVELS", "concat"
            ) == "concat":
                level_sizes = [x.shape[1] for x in vs]
                v = jnp.concatenate(vs, axis=1)
                q = v_proj(v) * scale
                vv = values_v_proj(v)
                out_v, out_l = flash_bi_attention(
                    q, k, vv, vl, bias, num_heads=h
                )
                out_v = out_v_proj(out_v)
                splits, start = [], 0
                for sz in level_sizes:
                    splits.append(out_v[:, start : start + sz])
                    start += sz
                return splits, out_l_proj(out_l)
            if v_is_list:
                qs = [v_proj(x) * scale for x in vs]
                vvs = [values_v_proj(x) for x in vs]
                out_vs, out_l = flash_bi_attention_levels(
                    qs, k, vvs, vl, bias, num_heads=h
                )
                return [out_v_proj(x) for x in out_vs], out_l_proj(out_l)
            q = v_proj(v) * scale
            vv = values_v_proj(v)
            out_v, out_l = flash_bi_attention(
                q, k, vv, vl, bias, num_heads=h
            )
            return out_v_proj(out_v), out_l_proj(out_l)

        if v_is_list:
            level_sizes = [x.shape[1] for x in vs]
            v = jnp.concatenate(vs, axis=1)
        q = v_proj(v) * scale
        vv = values_v_proj(v)

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

        out_v = out_v_proj(out_v)
        out_l = out_l_proj(out_l)
        if v_is_list:
            splits, start = [], 0
            for sz in level_sizes:
                splits.append(out_v[:, start : start + sz])
                start += sz
            return splits, out_l
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
        """v may be a single (B, N, C) tensor or a per-level list (see
        BiMultiHeadAttention); the return matches the input form."""
        v_is_list = isinstance(v, (list, tuple))
        gamma_v = self.param("gamma_v", nn.initializers.constant(self.init_value), (self.v_dim,))
        gamma_l = self.param("gamma_l", nn.initializers.constant(self.init_value), (self.l_dim,))
        norm_v = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm_v")
        vn = [norm_v(x) for x in v] if v_is_list else norm_v(v)
        ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm_l")(l)
        dv, dl = BiMultiHeadAttention(
            v_dim=self.v_dim, l_dim=self.l_dim, embed_dim=self.embed_dim,
            num_heads=self.num_heads, dropout=self.dropout, dtype=self.dtype,
            name="attn",
        )(vn, ln, attention_mask_l, deterministic)
        # NOTE (reference semantics, fuse_helper.py:417-421): the residual is
        # added to the NORMED inputs, not the raw ones.
        if v_is_list:
            v = [a + gamma_v.astype(b_.dtype) * b_ for a, b_ in zip(vn, dv)]
        else:
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
    """Early-fusion stage (vldyhead.py VLFuse, MHA-B path): the five levels
    form one visual sequence for a single bi-attention. The levels are
    passed as (B, HW_l, C) token views — on the flash path they stream
    through a carried-state kernel without ever being concatenated (the
    reference and the XLA composite flatten into one (B, sum HW, C) buffer;
    mathematically identical)."""

    num_convs: int = 6
    v_dim: int = 256
    l_dim: int = 768
    embed_dim: int = 2048
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, visual: List[jnp.ndarray], lang_hidden, lang_masks, deterministic=True):
        shapes = [f.shape for f in visual]
        tokens = [f.reshape(f.shape[0], -1, f.shape[-1]) for f in visual]
        new_v, new_l = BiAttentionBlock(
            v_dim=self.v_dim, l_dim=self.l_dim, embed_dim=self.embed_dim,
            num_heads=self.num_heads, init_value=1.0 / self.num_convs,
            dtype=self.dtype, name="b_attn",
        )(tokens, lang_hidden, lang_masks, deterministic)
        return [t.reshape(s) for t, s in zip(new_v, shapes)], new_l


class MultiHeadCrossAttention(nn.Module):
    """fuse_helper.py MultiHeadAttention (:430-552): plain q->kv cross
    attention with separate q/k dims, scaled queries, text-mask bias."""

    q_dim: int
    k_dim: int
    embed_dim: int = 2048
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in, attention_mask=None):
        h = self.num_heads
        d = self.embed_dim // h
        b, n, _ = q_in.shape
        t = k_in.shape[1]
        q = nn.Dense(self.embed_dim, dtype=self.dtype, name="q_proj")(q_in)
        q = q * (d**-0.5)
        k = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_proj")(k_in)
        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(v_in)
        q = q.reshape(b, n, h, d)
        k = k.reshape(b, t, h, d)
        v = v.reshape(b, t, h, d)
        s = jnp.einsum("bnhd,bthd->bhnt", q, k)
        if attention_mask is not None:
            s = s + jnp.where(
                attention_mask[:, None, None, :] == 0, -9e15, 0.0
            ).astype(s.dtype)
        m = jax.lax.stop_gradient(s.max(axis=-1, keepdims=True))
        e = jnp.exp((s - m).astype(jnp.float32))
        p = (e / e.sum(axis=-1, keepdims=True)).astype(v.dtype)
        out = jnp.einsum(
            "bhnt,bthd->bnhd", p, v, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        return nn.Dense(self.q_dim, dtype=self.dtype, name="out_proj")(
            out.reshape(b, n, self.embed_dim)
        )


class T2IFuse(nn.Module):
    """FUSE_CONFIG.TYPE == "MHA-S": single-direction text->image fusion
    (AttentionT2I, fuse_helper.py:559-640; wiring vldyhead.py:381-396,
    471-494). The reference applies one shared AttentionT2I per level with
    identical parameters and pre-LN per token, so flattening the five levels
    into one sequence is exactly equivalent. Language stream is unchanged.
    The residual adds to the NORMED queries (fuse_helper.py:625-629), same
    convention as BiAttentionBlock."""

    num_convs: int = 6
    v_dim: int = 256
    l_dim: int = 768
    embed_dim: int = 2048
    num_heads: int = 8
    use_layer_scale: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, visual, lang_hidden, lang_masks, deterministic=True):
        flat, sizes = flatten_levels(visual)
        q = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm_q_1")(flat)
        kv = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm_k_1")(lang_hidden)
        delta = MultiHeadCrossAttention(
            q_dim=self.v_dim, k_dim=self.l_dim, embed_dim=self.embed_dim,
            num_heads=self.num_heads, dtype=self.dtype, name="attn",
        )(q, kv, kv, lang_masks)
        if self.use_layer_scale:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(1.0 / self.num_convs),
                (self.v_dim,),
            )
            q = q + gamma.astype(delta.dtype) * delta
        else:
            q = q + delta
        return unflatten_levels(q, sizes), lang_hidden


def make_coord_channels(b, h, w, dtype):
    """fuse_helper.py:_make_coord (:87-103): 8 relative-position channels
    (x_min, y_min, x_max, y_max, x_ctr, y_ctr, 1/h, 1/w), NHWC."""
    xv, yv = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    xv = xv.astype(jnp.float32)
    yv = yv.astype(jnp.float32)
    xv_min = (xv * 2 - w) / w
    yv_min = (yv * 2 - h) / h
    xv_max = ((xv + 1) * 2 - w) / w
    yv_max = ((yv + 1) * 2 - h) / h
    coord = jnp.stack(
        [
            xv_min, yv_min, xv_max, yv_max,
            (xv_min + xv_max) / 2, (yv_min + yv_max) / 2,
            jnp.full((h, w), 1.0 / h), jnp.full((h, w), 1.0 / w),
        ],
        axis=-1,
    ).astype(dtype)
    return jnp.broadcast_to(coord[None], (b, h, w, 8))


class LangMappingMLP(nn.Module):
    """fuse_helper.py:_make_mlp (:77-85): Linear-BN-ReLU-Dropout-Linear-BN-
    ReLU on the pooled language aggregate."""

    out_dim: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.BatchNorm(
            use_running_average=deterministic, dtype=self.dtype, name="bn1"
        )(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.BatchNorm(
            use_running_average=deterministic, dtype=self.dtype, name="bn2"
        )(x)
        return nn.relu(x)


class SCANFuse(nn.Module):
    """FUSE_CONFIG.TYPE == "SCAN": t2i fusion via func_attention
    (vldyhead.py:415-422, 526-537; fuse_helper.py:122-168).

    Fidelity note: the reference path as written cannot run — it feeds the
    2-D pooled `aggregate` (bert_model.py:57) into the bmm-based
    func_attention, which requires a 3-D context, and its 1x1 joint_fusion
    convs are sized for coord_dim+emb inputs (vldyhead.py:447) that SCAN
    never concatenates. This twin keeps the intended semantics: the mapped
    aggregate acts as a single-token context (func_attention with L=1
    reduces to broadcasting that token), then per-level 1x1 conv+BN+ReLU."""

    v_dim: int = 256
    emb_dim: int = 256
    out_dim: int = 256
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, visual, lang_aggregate, deterministic=True):
        ctx = LangMappingMLP(
            out_dim=self.emb_dim, dropout=self.dropout, dtype=self.dtype,
            name="mapping_lang",
        )(lang_aggregate, deterministic)  # (B, emb)
        outs = []
        for i, f in enumerate(visual):
            b, h, w, _ = f.shape
            attn_feat = jnp.broadcast_to(
                ctx[:, None, None, :], (b, h, w, self.emb_dim)
            ).astype(self.dtype)
            y = nn.Conv(
                self.out_dim, (1, 1), dtype=self.dtype, name=f"joint_fusion_{i}"
            )(attn_feat)
            y = nn.BatchNorm(
                use_running_average=deterministic, dtype=self.dtype,
                name=f"joint_bn_{i}",
            )(y)
            outs.append(nn.relu(y))
        return outs


class FILMFuse(nn.Module):
    """FUSE_CONFIG.TYPE == "FILM": feature-wise linear modulation
    (vldyhead.py:423-431, 538-562): per-level tanh(gamma/beta) from the
    mapped language aggregate, applied to [feat, coord] channels, then 1x1
    conv+BN+ReLU down to out_dim."""

    v_dim: int = 256
    emb_dim: int = 256
    out_dim: int = 256
    coord_dim: int = 8
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, visual, lang_aggregate, deterministic=True):
        ctx = LangMappingMLP(
            out_dim=self.emb_dim, dropout=self.dropout, dtype=self.dtype,
            name="mapping_lang",
        )(lang_aggregate, deterministic)
        inp_dim = self.v_dim + self.coord_dim
        outs = []
        for i, f in enumerate(visual):
            b, h, w, _ = f.shape
            coord = make_coord_channels(b, h, w, self.dtype)
            feat = jnp.concatenate([f, coord], axis=-1)
            g = jnp.tanh(
                nn.Dense(inp_dim, dtype=self.dtype, name=f"gamma_{i}")(ctx)
            )
            bt = jnp.tanh(
                nn.Dense(inp_dim, dtype=self.dtype, name=f"beta_{i}")(ctx)
            )
            feat = nn.relu(g[:, None, None, :] * feat + bt[:, None, None, :])
            y = nn.Conv(
                self.out_dim, (1, 1), dtype=self.dtype, name=f"joint_fusion_{i}"
            )(feat)
            y = nn.BatchNorm(
                use_running_average=deterministic, dtype=self.dtype,
                name=f"joint_bn_{i}",
            )(y)
            outs.append(nn.relu(y))
        return outs
