"""Swin Transformer backbone (v1/v2/vl/v2_vl) — TPU-native flax implementation.

Capability twin of the reference GLIP backbone
(maskrcnn_benchmark/modeling/backbone/swint.py:431-649): patch embed 4x4,
four stages with windowed attention + relative position bias, shifted
windows, patch merging, per-output LayerNorm (identity for stage2 under the
RETINANET arch, swint.py:544-552).

Version dispatch (SWINT.VERSION, modeling/backbone/__init__.py:44-54):
  * "v1"  — swint.py: scaled dot-product window attention, pre-norm.
  * "v2"  — swint_v2.py: cosine attention with learnable log-temperature,
    log-CPB MLP relative bias, post-norm residuals.
  * "vl"  — swint_vl.py: v1 attention plus joint image<->text window
    attention in the LAST stage (swint_vl.py:618-620 gates ntext/dim_text to
    the final BasicLayer): image windows attend over [window tokens; text
    tokens] and text attends over [all image tokens; text tokens], with
    learned additive biases i2t (2, nH, ntext — row 0 biases i2t columns,
    row 1 biases t2i rows) and t2t (nH, ntext, ntext)
    (swint_vl.py:113-211). The backbone consumes and updates
    language_dict['hidden'] (swint_vl.py:712-735).
  * "v2_vl" — swint_v2_vl.py: same scaled dot-product attention + text branch
    as "vl" (its WindowAttention forward is identical); the file's only extra
    is an optional layer_scale gamma that defaults OFF in the reference, so
    we map it to the "vl" math.

TPU-first choices:
  * NHWC throughout; all spatial sizes are static at trace time, so window
    padding, shift masks and relative-position indices are precomputed in
    numpy — zero dynamic shapes inside jit.
  * windows are batched into a single (B*nW, ws*ws, C) attention — one large
    MXU matmul per block instead of per-window loops.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import math

import numpy as np
from flax import linen as nn

from mqdet_tpu.models.layers import DropPath, Mlp

Dtype = Any


def _rel_pos_index(ws: int) -> np.ndarray:
    """Static relative-position index for a (ws, ws) window."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, n, n)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (n, n)


def _shift_attn_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """Static SW-MSA mask (swint.py BasicLayer img_mask): (nW, n, n) additive."""
    img_mask = np.zeros((hp, wp))
    h_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    w_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    cnt = 0
    for h in h_slices:
        for w in w_slices:
            img_mask[h, w] = cnt
            cnt += 1
    mw = img_mask.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    mw = mw.reshape(-1, ws * ws)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws*ws, C); H, W must be multiples of ws."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(win: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    b = win.shape[0] // ((h // ws) * (w // ws))
    x = win.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    version: str = "v1"  # v1: scaled dot product; v2: cosine attn + log-CPB
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, x_text=None, text_mask=None, deterministic=True):
        """x: (B_, n, C); mask: (nW, n, n) additive or None.

        x_text: (B, ntext, C_text) text features for the vl variants (the
        window batch B_ must be B * nW); text_mask: (B, ntext) additive
        (0 keep / large-negative drop). Returns (x, x_text) when text is
        given, else x.
        """
        b_, n, c = x.shape
        h = self.num_heads
        head_dim = c // h
        scale = head_dim**-0.5

        qkv = nn.Dense(c * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, h, head_dim).transpose(2, 0, 3, 1, 4)

        if self.version == "v2":
            # Swin-v2 (swint_v2.py): cosine similarity attention with a
            # learnable per-head temperature clamped at log(100)
            q, k, v = qkv[0], qkv[1], qkv[2]
            q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-6)
            k = k / jnp.linalg.norm(k, axis=-1, keepdims=True).clip(1e-6)
            logit_scale = self.param(
                "logit_scale",
                nn.initializers.constant(math.log(10.0)),
                (h, 1, 1),
            )
            attn = jnp.einsum(
                "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
            )
            attn = attn * jnp.exp(
                jnp.minimum(logit_scale, math.log(100.0))
            )[None].astype(attn.dtype)

            # log-spaced continuous position bias MLP (CPB)
            ws = self.window_size
            coords = np.arange(-(ws - 1), ws, dtype=np.float32)
            grid = np.stack(np.meshgrid(coords, coords, indexing="ij"), -1)
            grid = grid / (ws - 1) * 8.0
            grid = np.sign(grid) * np.log2(np.abs(grid) + 1.0) / np.log2(8.0)
            tbl = jnp.asarray(grid.reshape(-1, 2), self.dtype)
            cpb = nn.Dense(512, dtype=self.dtype, name="cpb_mlp_fc1")(tbl)
            cpb = nn.relu(cpb)
            cpb = nn.Dense(h, use_bias=False, dtype=self.dtype, name="cpb_mlp_fc2")(cpb)
            idx = _rel_pos_index(self.window_size).reshape(-1)
            bias = cpb[idx].reshape(n, n, h).transpose(2, 0, 1)
            bias = 16.0 * nn.sigmoid(bias)
            attn = attn + bias[None].astype(attn.dtype)
        else:
            q, k, v = qkv[0] * scale, qkv[1], qkv[2]
            attn = jnp.einsum(
                "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
            )
            table = self.param(
                "relative_position_bias_table",
                nn.initializers.truncated_normal(0.02),
                ((2 * self.window_size - 1) ** 2, h),
            )
            idx = _rel_pos_index(self.window_size).reshape(-1)
            bias = table[idx].reshape(n, n, h).transpose(2, 0, 1)  # (h, n, n)
            attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, h, n, n) + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(b_, h, n, n)

        if x_text is None:
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32)
            out = out.astype(self.dtype).transpose(0, 2, 1, 3).reshape(b_, n, c)
            return nn.Dense(c, dtype=self.dtype, name="proj")(out)

        # ---- vl variants: joint image<->text attention (swint_vl.py:149-207)
        bt, ntext, _ = x_text.shape
        nw = b_ // bt
        assert bt * nw == b_, "window batch must be a multiple of text batch"
        qkv_t = nn.Dense(
            c * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv_text"
        )(x_text)
        qkv_t = qkv_t.reshape(bt, ntext, 3, h, head_dim).transpose(2, 0, 3, 1, 4)
        q_t, k_t, v_t = qkv_t[0] * scale, qkv_t[1], qkv_t[2]  # (bt, h, ntext, d)

        i2t_bias = self.param(
            "i2t_relative_position_bias",
            nn.initializers.truncated_normal(0.02),
            (2, h, ntext),
        )
        t2t_bias = self.param(
            "t2t_relative_position_bias",
            nn.initializers.truncated_normal(0.02),
            (h, ntext, ntext),
        )

        # image side: each window's tokens also attend to the text tokens
        qw = q.reshape(bt, nw, h, n, head_dim)
        attn_i2t = jnp.einsum(
            "bwhnd,bhmd->bwhnm", qw, k_t, preferred_element_type=jnp.float32
        )
        col_bias = i2t_bias[0][None, :, None, :]  # (1, h, 1, ntext)
        if text_mask is not None:
            col_bias = col_bias + text_mask[:, None, None, :]
        attn_i2t = attn_i2t + col_bias[:, None].astype(attn_i2t.dtype)
        attn_full = jnp.concatenate(
            [attn.reshape(bt, nw, h, n, n), attn_i2t], axis=-1
        )
        attn_full = jax.nn.softmax(attn_full, axis=-1).astype(self.dtype)
        a_img, a_txt = attn_full[..., :n], attn_full[..., n:]
        out = jnp.einsum(
            "bwhnm,bwhmd->bwhnd", a_img, v.reshape(bt, nw, h, n, head_dim),
            preferred_element_type=jnp.float32,
        ) + jnp.einsum(
            "bwhnm,bhmd->bwhnd", a_txt, v_t, preferred_element_type=jnp.float32
        )
        out = out.astype(self.dtype).reshape(b_, h, n, head_dim)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)

        # text side: text attends over ALL image tokens + text tokens
        k_all = k.reshape(bt, nw, h, n, head_dim).transpose(0, 2, 1, 3, 4)
        k_all = k_all.reshape(bt, h, nw * n, head_dim)
        v_all = v.reshape(bt, nw, h, n, head_dim).transpose(0, 2, 1, 3, 4)
        v_all = v_all.reshape(bt, h, nw * n, head_dim)
        attn_t2i = jnp.einsum(
            "bhmd,bhkd->bhmk", q_t, k_all, preferred_element_type=jnp.float32
        )
        attn_t2i = attn_t2i + i2t_bias[1][None, :, :, None].astype(attn_t2i.dtype)
        attn_t2t = jnp.einsum(
            "bhmd,bhkd->bhmk", q_t, k_t, preferred_element_type=jnp.float32
        )
        attn_t2t = attn_t2t + t2t_bias[None].astype(attn_t2t.dtype)
        if text_mask is not None:
            attn_t2t = attn_t2t + text_mask[:, None, None, :].astype(attn_t2t.dtype)
        attn_t = jax.nn.softmax(
            jnp.concatenate([attn_t2i, attn_t2t], axis=-1), axis=-1
        ).astype(self.dtype)
        t_img, t_txt = attn_t[..., : nw * n], attn_t[..., nw * n:]
        out_t = jnp.einsum(
            "bhmk,bhkd->bhmd", t_img, v_all, preferred_element_type=jnp.float32
        ) + jnp.einsum(
            "bhmk,bhkd->bhmd", t_txt, v_t, preferred_element_type=jnp.float32
        )
        out_t = out_t.astype(self.dtype).transpose(0, 2, 1, 3).reshape(bt, ntext, c)
        out_t = nn.Dense(
            x_text.shape[-1], dtype=self.dtype, name="proj_text"
        )(out_t)
        return out, out_t


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float
    drop_path_rate: float
    version: str = "v1"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h: int, w: int, x_text=None, text_mask=None, deterministic=True):
        """x: (B, H*W, C) with static (h, w).

        x_text/text_mask: text stream for the vl variants (swint_vl.py
        SwinTransformerBlock.forward:264-332); returns (x, x_text) when text
        is given.
        """
        ws = self.window_size
        # NOTE: the reference (swint.py:186-244) keeps the cyclic shift even
        # when the map is smaller than the window — zeros are rolled through
        # the padded map and the slice mask partitions the single window.
        # The timm-style "disable shift when window >= min(H,W)" rule would
        # diverge from it on small feature maps.
        shift = self.shift_size
        b, _, c = x.shape
        shortcut = x
        shortcut_text = x_text
        if x_text is not None:
            x_text = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1_text")(x_text)
        if self.version != "v2":
            # v1: pre-norm; v2 normalizes AFTER attention (swint_v2.py)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x.reshape(b, h, w, c)

        hp = -(-h // ws) * ws
        wp = -(-w // ws) * ws
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))

        if shift > 0:
            x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
        else:
            mask = None
        # padded rows/cols attend freely in non-shifted windows (the reference
        # does the same: padding participates, then is cropped).
        xw = window_partition(x, ws)
        xw = WindowAttention(
            self.dim, self.num_heads, ws, version=self.version,
            dtype=self.dtype, name="attn",
        )(xw, mask=mask, x_text=x_text, text_mask=text_mask,
          deterministic=deterministic)
        if x_text is not None:
            xw, x_text = xw
        x = window_reverse(xw, ws, hp, wp)
        if shift > 0:
            x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
        x = x[:, :h, :w].reshape(b, h * w, c)

        if self.version == "v2":
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
            x = shortcut + DropPath(self.drop_path_rate, name="drop_path1")(
                x, deterministic=deterministic
            )
            y = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                    name="mlp")(x, deterministic=deterministic)
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(y)
            return x + DropPath(self.drop_path_rate, name="drop_path2")(
                y, deterministic=deterministic
            )

        x = shortcut + DropPath(self.drop_path_rate, name="drop_path1")(
            x, deterministic=deterministic
        )
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype, name="mlp")(
            y, deterministic=deterministic
        )
        x = x + DropPath(self.drop_path_rate, name="drop_path2")(
            y, deterministic=deterministic
        )
        if shortcut_text is None:
            return x
        # text residual + FFN (swint_vl.py:328-330)
        ct = shortcut_text.shape[-1]
        x_text = shortcut_text + DropPath(self.drop_path_rate, name="drop_path1_text")(
            x_text, deterministic=deterministic
        )
        yt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2_text")(x_text)
        yt = Mlp(int(ct * self.mlp_ratio), ct, dtype=self.dtype, name="mlp_text")(
            yt, deterministic=deterministic
        )
        x_text = x_text + DropPath(self.drop_path_rate, name="drop_path2_text")(
            yt, deterministic=deterministic
        )
        return x, x_text


class PatchMerging(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h: int, w: int):
        b, _, c = x.shape
        x = x.reshape(b, h, w, c)
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        ho, wo = (h + 1) // 2, (w + 1) // 2
        x = x.reshape(b, ho * wo, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)
        return x, ho, wo


class SwinTransformer(nn.Module):
    """Returns the four stage outputs as NHWC maps (strides 4, 8, 16, 32)."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    patch_norm: bool = True
    out_indices: Sequence[int] = (0, 1, 2, 3)
    # RETINANET arch: no out-norm on stage 0 (swint.py:544-552)
    norm_stage0: bool = False
    version: str = "v1"  # v1 | v2 (swint.py / swint_v2.py)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_text=None, text_masks=None, deterministic: bool = True):
        """x: (B, H, W, 3), H/W arbitrary (padded to /4 internally).

        For the vl variants, x_text (B, ntext, C_text) joins the LAST stage's
        window attention (swint_vl.py:618-620,722-726) and the updated text
        is returned as (stage_feats, x_text). text_masks: (B, ntext) with 1
        for real tokens — converted to the additive form the attention uses
        (swint_vl.py:713-718).
        """
        use_text = x_text is not None and self.version in ("vl", "v2_vl")
        text_mask_add = None
        if use_text and text_masks is not None:
            text_mask_add = jnp.where(text_masks > 0, 0.0, -1e9).astype(jnp.float32)
        b, h, w, _ = x.shape
        ph = (-h) % 4
        pw = (-w) % 4
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        x = nn.Conv(
            self.embed_dim, (4, 4), strides=(4, 4), padding="VALID",
            dtype=self.dtype, name="patch_embed_proj",
        )(x)
        hh, ww = x.shape[1], x.shape[2]
        x = x.reshape(b, hh * ww, self.embed_dim)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_embed_norm")(x)

        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)

        outs = []
        block_i = 0
        dim = self.embed_dim
        for i_layer, depth in enumerate(self.depths):
            last_stage = i_layer == len(self.depths) - 1
            for d in range(depth):
                blk = SwinBlock(
                    dim=dim,
                    num_heads=self.num_heads[i_layer],
                    window_size=self.window_size,
                    shift_size=0 if d % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path_rate=float(dpr[block_i]),
                    version=self.version,
                    dtype=self.dtype,
                    name=f"layers_{i_layer}_blocks_{d}",
                )
                if use_text and last_stage:
                    x, x_text = blk(
                        x, hh, ww, x_text=x_text, text_mask=text_mask_add,
                        deterministic=deterministic,
                    )
                else:
                    x = blk(x, hh, ww, deterministic=deterministic)
                block_i += 1

            if i_layer in self.out_indices:
                if i_layer == 0 and not self.norm_stage0:
                    out = x
                else:
                    out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm{i_layer}")(x)
                outs.append(out.reshape(b, hh, ww, dim))

            if i_layer < len(self.depths) - 1:
                x, hh, ww = PatchMerging(
                    dim=dim, dtype=self.dtype, name=f"layers_{i_layer}_downsample"
                )(x, hh, ww)
                dim *= 2

        if use_text:
            return outs, x_text
        return outs
