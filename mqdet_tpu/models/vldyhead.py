"""VLDyHead — GLIP's fused dynamic head, TPU-native.

Capability twin of maskrcnn_benchmark/modeling/rpn/vldyhead.py:52-900:
NUM_CONVS x [VLFuse (bi-attention) -> BertEncoderLayer (text self-attn) ->
DyConv (dynamic conv: modulated deform conv + scale-attention fuse + DYReLU)]
followed by cls / bbox / centerness convs and the dot-product token head.

TPU-first choices:
  * NHWC; deformable conv is the gather+matmul composite in ops/deform_conv.
  * The reference predicts DCN offsets at level L and applies them to convs
    whose outputs live at L-1-sized or L+1-sized grids. For the stride-2 down
    conv the grids already agree; for the up conv the reference CUDA kernel
    reads the coarse buffer with output-derived (wrong) strides. Default
    offset_compat="strided" replicates that reinterpretation bit-for-bit
    (released checkpoints were trained with it); "resample" bilinearly
    resamples the offset field instead (cleaner, off-reference).
  * The dot-product head computes one (sum(HW), T) matmul per level on the
    MXU; the +-50000 clamps are kept (cheap, preserves parity of extreme
    logits).
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mqdet_tpu.models.bert import BertLayer, GatedCrossAttentionBlock, MLMHead
from mqdet_tpu.models.fusion import FILMFuse, SCANFuse, T2IFuse, VLFuse
from mqdet_tpu.models.layers import (
    DYReLU,
    Scale,
    h_sigmoid,
    upsample_bilinear,
)
from mqdet_tpu.ops.deform_conv import (
    modulated_deform_conv,
    modulated_deform_conv_window,
    reinterpret_offsets_strided,
    resize_offsets,
)
from mqdet_tpu.ops.pallas.deform_conv_pallas import modulated_deform_conv_pallas

Dtype = Any


class DeformConvGN(nn.Module):
    """Conv3x3Norm with deformable conv + GroupNorm (vldyhead.py:113-155).

    Uses the gather-free window formulation (ops/deform_conv.py
    modulated_deform_conv_window) — per-element gathers are pathologically
    slow on TPU; the window form runs the sampling contraction on the MXU.

    `x` may be a LIST of per-level feature maps (with matching offset/mask
    lists); levels with <= merge_max_positions output positions can be
    zero-padded onto a common canvas and run as ONE Pallas call (weights
    are shared across levels). Per-item numerics are unchanged: batch
    entries are independent in the kernel, offsets are edge-padded so
    shift bounds stay tight, outputs are cropped before GN (parity test:
    tests/test_dcn_seam.py::test_merged_canvas_matches_individual).

    MEASURED NEGATIVE on v5e (round 5, PERF.md): merging {P6,P7} (+ the
    stride-2 pair) saved 3 custom-call barriers/stage but the padded-canvas
    steps and concat/pad prep cost more — head 174.9 -> 181.1 ms/group,
    protocol 1224 -> 1248 ms. merge_max_positions therefore defaults to 0
    (per-level calls); the machinery stays for future geometries.
    """

    features: int
    stride: int = 1
    groups: int = 16
    radius: int = 2
    # Offsets predicted at level L are applied to convs over levels L±1
    # (vldyhead.py:218-227). "strided" replicates the reference CUDA kernel's
    # flat-buffer reinterpretation (deform_conv_kernel_cuda.cu:607-620) that
    # the released checkpoints were trained with; "resample" bilinearly
    # resamples the offset field to the output grid (cleaner, off-reference).
    offset_compat: str = "strided"
    # levels with <= this many output positions merge onto one canvas
    merge_max_positions: int = 0
    dtype: Dtype = jnp.float32

    def _prep_offsets(self, x, offset, mask):
        ho = -(-x.shape[1] // self.stride)
        wo = -(-x.shape[2] // self.stride)
        if offset.shape[1] != ho or offset.shape[2] != wo:
            # NOTE: the batch axis here must carry logically INDEPENDENT items
            # (chunk-parallel forwards of the same image, or separate images).
            # reinterpret_offsets_strided is reference-exact per item at the
            # reference's eval batch size of 1; the CUDA kernel's cross-batch
            # offset bleed at B>1 is deliberately NOT reproduced (see
            # ops/deform_conv.py:118 docstring).
            if self.offset_compat == "strided":
                offset, mask = reinterpret_offsets_strided(offset, mask, ho, wo)
            else:
                offset, mask = resize_offsets(offset, mask, ho, wo)
        return offset, mask, ho, wo

    @nn.compact
    def __call__(self, x, offset, mask):
        import os

        import jax

        x_is_list = isinstance(x, (list, tuple))
        xs = list(x) if x_is_list else [x]
        offs, msks = (
            (list(offset), list(mask)) if x_is_list else ([offset], [mask])
        )

        w = self.param(
            "kernel", nn.initializers.normal(0.01),
            (3, 3, xs[0].shape[-1], self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        gn = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype, name="gn")

        prepped = []
        for xi, oi, mi in zip(xs, offs, msks):
            oi, mi, ho, wo = self._prep_offsets(xi, oi, mi)
            prepped.append((xi, oi, mi, ho, wo))

        # Implementation dispatch (MQDET_DEFORM_IMPL=pallas|window|gather):
        #   pallas — VMEM-resident Pallas kernel (default on TPU: compiles in
        #            seconds on v5e, exact vs window to 1e-7, 2.3x faster than
        #            the gather composite at level-0 shapes)
        #   window — gather-free XLA composite (same clipped-offset math;
        #            HBM-bound on its materialized im2col)
        #   gather — exact 4-corner bilinear via XLA gather (unclipped
        #            offsets; slowest on TPU)
        # Channel counts not aligned to the 128-lane tile fall back to
        # `window` (the Pallas band DMA needs lane-aligned C), as does CPU.
        # Small levels (P6/P7) run the Pallas kernel too: their compute is
        # negligible but the window composite's 64-cell im2col lowers to 64
        # single-entry copies + a concatenate in (2,128)-tiled layouts — a
        # measured ~92 ms/protocol across the tower (round-5 device trace,
        # PERF.md) vs microseconds for the same shapes in the kernel.
        impl = os.environ.get("MQDET_DEFORM_IMPL", "pallas")
        c_in = xs[0].shape[-1]
        # pallas_interpret: force the kernel (interpret mode) on CPU — used
        # by the merged-canvas parity test, mirroring MQDET_MSDA_IMPL.
        use_pallas = c_in % 128 == 0 and (
            impl == "pallas_interpret"
            or (impl == "pallas" and jax.default_backend() != "cpu")
        )

        def conv_one(xi, oi, mi):
            args = (
                xi, oi.astype(xi.dtype), mi.astype(xi.dtype),
                w.astype(xi.dtype), b.astype(xi.dtype),
            )
            if impl == "gather":
                return modulated_deform_conv(*args, stride=self.stride)
            if not use_pallas:
                return modulated_deform_conv_window(
                    *args, stride=self.stride, radius=self.radius
                )
            # block_rows: 16 measured faster at the stride-1 level-0 shape
            # (5.68 vs 5.90 ms rand / 5.56 vs 5.76 smooth, perf_dcn_sweep
            # round 5); 8 faster at ho=50 (L1: 0.79 vs 1.08 ms).
            return modulated_deform_conv_pallas(
                *args, stride=self.stride, radius=self.radius,
                block_rows=16 if xi.shape[1] // self.stride >= 100 else 8,
                interpret=impl == "pallas_interpret",
            )

        # partition: small levels merge onto one canvas (pallas path only)
        merged_idx = [
            i for i, (_, _, _, ho, wo) in enumerate(prepped)
            if ho * wo <= self.merge_max_positions
        ]
        outs = [None] * len(prepped)
        if use_pallas and len(merged_idx) > 1:
            s = self.stride
            ch = max(prepped[i][0].shape[1] for i in merged_idx)
            cw = max(prepped[i][0].shape[2] for i in merged_idx)
            cho, cwo = -(-ch // s), -(-cw // s)
            xs_c, os_c, ms_c = [], [], []
            for i in merged_idx:
                xi, oi, mi, ho, wo = prepped[i]
                xs_c.append(jnp.pad(
                    xi, ((0, 0), (0, ch - xi.shape[1]),
                         (0, cw - xi.shape[2]), (0, 0))))
                # offsets edge-pad: padded positions reuse a real row's
                # offsets so per-block shift bounds stay tight (their output
                # is cropped); mask zero-pads are irrelevant for the crop.
                os_c.append(jnp.pad(
                    oi, ((0, 0), (0, cho - ho), (0, cwo - wo), (0, 0)),
                    mode="edge"))
                ms_c.append(jnp.pad(
                    mi, ((0, 0), (0, cho - ho), (0, cwo - wo), (0, 0))))
            y_all = conv_one(
                jnp.concatenate(xs_c, axis=0),
                jnp.concatenate(os_c, axis=0),
                jnp.concatenate(ms_c, axis=0),
            )
            bsz = prepped[merged_idx[0]][0].shape[0]
            for j, i in enumerate(merged_idx):
                _, _, _, ho, wo = prepped[i]
                outs[i] = y_all[j * bsz : (j + 1) * bsz, :ho, :wo]
        else:
            merged_idx = []
        for i, (xi, oi, mi, _, _) in enumerate(prepped):
            if outs[i] is None:
                outs[i] = conv_one(xi, oi, mi)

        outs = [gn(y) for y in outs]
        return outs if x_is_list else outs[0]


class PlainConvGN(nn.Module):
    features: int
    stride: int = 1
    groups: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, offset=None, mask=None):
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride), padding=1,
            kernel_init=nn.initializers.normal(0.01), dtype=self.dtype, name="conv",
        )(x)
        return nn.GroupNorm(num_groups=self.groups, dtype=self.dtype, name="gn")(y)


class DyConv(nn.Module):
    """Dynamic conv over the pyramid (vldyhead.py:158-247).

    For each level L: mean of {conv_s1(L), conv_s2(L-1), up(conv_s1(L+1))}
    weighted by per-feature scale attention, then DYReLU.
    """

    channels: int = 256
    use_deform: bool = True
    use_dyfuse: bool = True
    use_dyrelu: bool = True
    gn_groups: int = 16
    deform_radius: int = 2
    offset_compat: str = "strided"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]) -> List[jnp.ndarray]:
        # DyConv[0]: applied to level+1 (stride 1); DyConv[1]: current level;
        # DyConv[2]: level-1 (stride 2) — vldyhead.py:166-171
        def conv_cls(features, stride, name):
            if self.use_deform:
                return DeformConvGN(
                    features, stride=stride, groups=self.gn_groups,
                    radius=self.deform_radius,
                    offset_compat=self.offset_compat,
                    dtype=self.dtype, name=name,
                )
            return PlainConvGN(
                features, stride=stride, groups=self.gn_groups,
                dtype=self.dtype, name=name,
            )

        conv_hi = conv_cls(self.channels, 1, "dyconv_0")
        conv_mid = conv_cls(self.channels, 1, "dyconv_1")
        conv_lo = conv_cls(self.channels, 2, "dyconv_2")

        if self.use_deform:
            offset_conv = nn.Conv(
                27, (3, 3), padding=1, dtype=self.dtype, name="offset"
            )
        if self.use_dyfuse:
            attn_conv = nn.Conv(
                1, (1, 1), kernel_init=nn.initializers.normal(0.01),
                dtype=self.dtype, name="attn_conv",
            )
        relu = (
            DYReLU(self.channels, dtype=self.dtype, name="dyrelu")
            if self.use_dyrelu
            else None
        )

        num_levels = len(feats)
        if self.use_deform:
            oms = [offset_conv(f) for f in feats]
            offsets = [om[..., :18] for om in oms]
            masks = [nn.sigmoid(om[..., 18:27]) for om in oms]
        else:
            offsets = masks = [None] * num_levels

        # One batched call per conv member (weights are shared across
        # levels): DeformConvGN merges the smallest levels into a single
        # Pallas dispatch instead of one custom-call barrier per level.
        # Work lists mirror the per-level loop: mid at L with L's offsets,
        # lo over feats[L-1] with L's offsets, hi over feats[L+1] with L's
        # offsets (vldyhead.py:218-227).
        if self.use_deform:
            mid_out = conv_mid(feats, offsets, masks)
            lo_out = conv_lo(
                feats[:-1], offsets[1:], masks[1:]
            )  # lo_out[l-1] feeds level l
            hi_out = conv_hi(
                feats[1:], offsets[:-1], masks[:-1]
            )  # hi_out[l] feeds level l
        else:
            mid_out = [conv_mid(f, None, None) for f in feats]
            lo_out = [conv_lo(f, None, None) for f in feats[:-1]]
            hi_out = [conv_hi(f, None, None) for f in feats[1:]]

        outs = []
        for level, feature in enumerate(feats):
            temp = [mid_out[level]]
            if level > 0:
                temp.append(lo_out[level - 1])
            if level < num_levels - 1:
                temp.append(
                    upsample_bilinear(
                        hi_out[level], feature.shape[1], feature.shape[2]
                    )
                )

            # AttnConv = avgpool -> 1x1 conv -> relu -> h_sigmoid per member
            # (vldyhead.py:172-179, 232-238), then the weighted mean. Running
            # accumulation instead of jnp.stack(temp).mean(0): the stack
            # materializes a (K, B, H, W, C) tensor per level (3x the pyramid
            # in HBM traffic) that XLA does not reliably fuse away; the sum
            # is the same math in the same order.
            acc = None
            for f in temp:
                if self.use_dyfuse:
                    w_f = h_sigmoid(
                        nn.relu(attn_conv(jnp.mean(f, axis=(1, 2), keepdims=True)))
                    )
                    f = f * w_f
                acc = f if acc is None else acc + f
            outs.append(acc / len(temp))

        if relu is not None:
            outs = [relu(o) for o in outs]
        else:
            outs = [nn.relu(o) for o in outs]
        return outs


class VLDyHead(nn.Module):
    """The full fused head. Returns per-level predictions + fused language."""

    num_convs: int = 6
    channels: int = 256
    in_channels: int = 256
    lang_dim: int = 768
    lang_heads: int = 12
    lang_intermediate: int = 3072
    num_classes: int = 80  # NUM_CLASSES - 1
    log_scale_init: float = 0.0
    prior_prob: float = 0.01
    use_deform: bool = True
    use_dyfuse: bool = True
    use_dyrelu: bool = True
    deform_radius: int = 2
    offset_compat: str = "strided"
    early_fuse: bool = True
    # FUSE_CONFIG.TYPE (vldyhead.py:381-431): MHA-B (bidirectional, the
    # GLIP/MQ-Det setting), MHA-S (text->image only), SCAN, FILM
    fuse_type: str = "MHA-B"
    fuse_layer_scale: bool = True
    # activation recomputation per tower stage (reference VLFuse/BertLayer
    # gradient checkpointing, vldyhead.py:374-377,475-515); TPU.REMAT
    remat: bool = False
    use_fused_dot_product: bool = True
    query_fusion: bool = False
    add_linear_layer: bool = False
    gn_groups: int = 16
    # FUSE_CONFIG.MLM_LOSS (vldyhead.py:760-765,790-792): vocab head on the
    # fused text embedding for masked-language-model training
    use_mlm: bool = False
    vocab_size: int = 30522
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: List[jnp.ndarray],
        lang_hidden: jnp.ndarray,
        lang_masks: jnp.ndarray,
        embedding: Optional[jnp.ndarray] = None,
        augmented_vision: Optional[jnp.ndarray] = None,
        query_mask: Optional[jnp.ndarray] = None,
        lang_aggregate: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        attn_bias = (1.0 - lang_masks[:, None, None, :].astype(jnp.float32)) * -10000.0

        # prompt-tuning layer (ADD_LINEAR_LAYER, vldyhead.py:929-958): a
        # zero-init (1000, lang_dim) additive prompt applied to both the
        # fused text stream and the aggregate embedding
        if self.add_linear_layer:
            tl = self.param(
                "tunable_linear", nn.initializers.zeros, (1000, self.lang_dim)
            )
            t = lang_hidden.shape[1]
            lang_hidden = lang_hidden + tl[None, :t, :].astype(lang_hidden.dtype)
            if embedding is not None:
                embedding = embedding + tl[None, :t, :].astype(embedding.dtype)

        # SupportFuse / VISION_QUERY.QUERY_FUSION (vldyhead.py:576-590):
        # inject the PreSelect-augmented queries into the text stream with one
        # extra gated cross-attention before the tower
        if self.query_fusion and augmented_vision is not None:
            lang_hidden = GatedCrossAttentionBlock(
                dim=self.lang_dim, enable_ffn=False, dtype=self.dtype,
                name="query_fuse_qv_layer",
            )(lang_hidden, augmented_vision.astype(self.dtype), query_mask)

        visual = feats
        for i in range(self.num_convs):
            if self.early_fuse:
                fuse_cls = (
                    nn.remat(VLFuse, static_argnums=(4,))
                    if self.remat
                    else VLFuse
                )
                if self.fuse_type == "MHA-B":
                    visual, lang_hidden = fuse_cls(
                        num_convs=self.num_convs, v_dim=self.channels,
                        l_dim=self.lang_dim, dtype=self.dtype, name=f"fuse_{i}",
                    )(visual, lang_hidden, lang_masks, deterministic)
                elif self.fuse_type == "MHA-S":
                    visual, lang_hidden = T2IFuse(
                        num_convs=self.num_convs, v_dim=self.channels,
                        l_dim=self.lang_dim,
                        use_layer_scale=self.fuse_layer_scale,
                        dtype=self.dtype, name=f"fuse_{i}",
                    )(visual, lang_hidden, lang_masks, deterministic)
                elif self.fuse_type == "SCAN":
                    assert lang_aggregate is not None
                    visual = SCANFuse(
                        v_dim=self.channels, dtype=self.dtype, name=f"fuse_{i}",
                    )(visual, lang_aggregate, deterministic)
                elif self.fuse_type == "FILM":
                    assert lang_aggregate is not None
                    visual = FILMFuse(
                        v_dim=self.channels, dtype=self.dtype, name=f"fuse_{i}",
                    )(visual, lang_aggregate, deterministic)
                else:
                    raise NotImplementedError(self.fuse_type)
                # language self path (all fuse types, vldyhead.py:642-663):
                # the last stage's text layer only exists when the
                # dot-product head consumes the fused text
                if i < self.num_convs - 1 or self.use_fused_dot_product:
                    bert_cls = (
                        nn.remat(BertLayer, static_argnums=(3,))
                        if self.remat
                        else BertLayer
                    )
                    lang_hidden = bert_cls(
                        hidden_size=self.lang_dim, num_heads=self.lang_heads,
                        intermediate_size=self.lang_intermediate,
                        dtype=self.dtype, name=f"lang_layer_{i}",
                    )(lang_hidden, attn_bias, deterministic)
            dyconv_cls = nn.remat(DyConv) if self.remat else DyConv
            visual = dyconv_cls(
                channels=self.channels,
                use_deform=self.use_deform,
                use_dyfuse=self.use_dyfuse,
                use_dyrelu=self.use_dyrelu,
                gn_groups=self.gn_groups,
                deform_radius=self.deform_radius,
                offset_compat=self.offset_compat,
                dtype=self.dtype,
                name=f"dyconv_tower_{i}",
            )(visual)

        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)

        cls_conv = nn.Conv(
            self.num_classes, (1, 1),
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(bias_value),
            dtype=self.dtype, name="cls_logits",
        )
        bbox_conv = nn.Conv(
            4, (1, 1), kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype, name="bbox_pred",
        )
        ctr_conv = nn.Conv(
            1, (1, 1), kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype, name="centerness",
        )

        # dot-product soft-token head (vldyhead.py:705-720, 846-875)
        if self.use_fused_dot_product:
            embedding = lang_hidden
        assert embedding is not None
        emb = embedding / jnp.linalg.norm(embedding, axis=-1, keepdims=True).clip(1e-6)
        proj_text = nn.Dense(
            self.channels, dtype=self.dtype, name="dot_product_projection_text"
        )(emb / 2.0)  # (B, T, C)
        bias_lang = self.param("bias_lang", nn.initializers.zeros, (self.lang_dim,))
        bias0 = self.param("bias0", nn.initializers.constant(bias_value), (1,))
        dot_bias = jnp.einsum("btd,d->bt", emb, bias_lang) + bias0  # (B, T)
        log_scale = self.param(
            "log_scale", nn.initializers.constant(self.log_scale_init), (1,)
        )
        inv_scale = jnp.exp(-log_scale)

        logits, bbox_reg, centerness, dot_product_logits = [], [], [], []
        for level, x in enumerate(visual):
            b, h, w, c = x.shape
            logits.append(cls_conv(x))
            bbox = bbox_conv(x)
            bbox = Scale(1.0, name=f"scale_{level}")(bbox)
            bbox_reg.append(bbox)
            centerness.append(ctr_conv(x))

            q = x.reshape(b, h * w, c)
            dp = (
                jnp.einsum(
                    "bnc,btc->bnt", q, proj_text, preferred_element_type=jnp.float32
                )
                * inv_scale
                + dot_bias[:, None, :]
            )
            dp = jnp.clip(dp, -50000.0, 50000.0)
            dot_product_logits.append(dp)

        out = {
            "logits": logits,                     # [(B, H, W, num_classes)]
            "bbox_reg": bbox_reg,                 # [(B, H, W, 4)]
            "centerness": centerness,             # [(B, H, W, 1)]
            "dot_product_logits": dot_product_logits,  # [(B, HW, T)]
            "fused_lang_hidden": lang_hidden,     # (B, T, lang_dim)
        }
        if self.use_mlm:
            # vldyhead.py:790-792: vocab logits from the fused embedding
            out["mlm_logits"] = MLMHead(
                hidden_size=self.lang_dim, vocab_size=self.vocab_size,
                dtype=self.dtype, name="mlm_head",
            )(embedding)
        return out
