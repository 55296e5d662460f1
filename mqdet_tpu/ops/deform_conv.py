"""Modulated deformable convolution (DCNv2) for TPU.

TPU-native replacement for the reference CUDA kernels
(maskrcnn_benchmark/csrc/cuda/deform_conv_cuda.cu,
 layers/deform_conv.py ModulatedDeformConv), required by every DyConv step of
the GLIP VLDyHead when USE_DFCONV is on (modeling/rpn/vldyhead.py:186-217).

Strategy: deformable im2col as a batched bilinear gather producing
(B, Ho, Wo, K*C) patches, followed by ONE large matmul with the (K*C, Cout)
kernel — the matmul rides the MXU, the gather the VPU. This is the
bandwidth-optimal decomposition on TPU; a fused Pallas variant can stream the
gather through VMEM (see ops/pallas/).

Layout: NHWC. Offset channels are ordered (dy0, dx0, dy1, dx1, ...) over the
3x3 taps in row-major tap order, matching the mmcv/reference layout produced
by a conv with 18 output channels (vldyhead.py:189-193: offset[:, :18],
mask[:, 18:27].sigmoid()).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _bilinear_gather(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """img (H, W, C); y, x (...,) fractional; returns (..., C).

    Zero padding outside [0, H-1] x [0, W-1] (matching deformable-im2col which
    zeroes samples with y <= -1 or y >= H).
    """
    h, w, _ = img.shape
    oob = (y <= -1.0) | (y >= h * 1.0) | (x <= -1.0) | (x >= w * 1.0)
    y0f = jnp.floor(y)
    x0f = jnp.floor(x)
    ly, lx = y - y0f, x - x0f

    flat = img.reshape(-1, img.shape[-1])

    def corner(yy, xx):
        inb = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
        yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        v = flat[yc * w + xc]
        return jnp.where(inb[..., None], v, 0.0)

    v00 = corner(y0f, x0f)
    v01 = corner(y0f, x0f + 1)
    v10 = corner(y0f + 1, x0f)
    v11 = corner(y0f + 1, x0f + 1)
    val = (
        v00 * ((1 - ly) * (1 - lx))[..., None]
        + v01 * ((1 - ly) * lx)[..., None]
        + v10 * (ly * (1 - lx))[..., None]
        + v11 * (ly * lx)[..., None]
    )
    return jnp.where(oob[..., None], 0.0, val)


@functools.partial(jax.jit, static_argnames=("stride",))
def modulated_deform_conv(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: int = 1,
) -> jnp.ndarray:
    """DCNv2 with 3x3 kernel, padding 1, dilation 1.

    Args:
      x:      (B, H, W, C)
      offset: (B, Ho, Wo, 18)  (dy, dx) per tap
      mask:   (B, Ho, Wo, 9)   modulation (already sigmoided)
      weight: (3, 3, C, Cout)  HWIO
      bias:   (Cout,) or None
      stride: 1 or 2; Ho = ceil(H / stride)

    Returns: (B, Ho, Wo, Cout)
    """
    b, h, w, c = x.shape
    ho, wo = offset.shape[1], offset.shape[2]
    kh, kw, _, cout = weight.shape
    k = kh * kw

    # base sampling grid: p0 + p_k, pad=1
    ys = jnp.arange(ho, dtype=jnp.float32) * stride - 1.0  # top tap row
    xs = jnp.arange(wo, dtype=jnp.float32) * stride - 1.0
    tap_dy = jnp.arange(kh, dtype=jnp.float32)
    tap_dx = jnp.arange(kw, dtype=jnp.float32)
    # (Ho, Wo, K)
    base_y = ys[:, None, None, None] + tap_dy[None, None, :, None] + jnp.zeros((1, wo, 1, kw))
    base_x = xs[None, :, None, None] + tap_dx[None, None, None, :] + jnp.zeros((ho, 1, kh, 1))
    base_y = base_y.reshape(ho, wo, k)
    base_x = base_x.reshape(ho, wo, k)

    off = offset.reshape(b, ho, wo, k, 2)
    sample_y = base_y[None] + off[..., 0]
    sample_x = base_x[None] + off[..., 1]

    def per_image(img, yy, xx, m):
        patches = _bilinear_gather(img, yy, xx)  # (Ho, Wo, K, C)
        return patches * m[..., None]

    patches = jax.vmap(per_image)(x, sample_y, sample_x, mask)  # (B, Ho, Wo, K, C)
    patches = patches.reshape(b, ho, wo, k * c)
    w_mat = weight.transpose(0, 1, 2, 3).reshape(k * c, cout)
    out = jnp.einsum(
        "bhwk,ko->bhwo", patches, w_mat, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def reinterpret_offsets_strided(
    offset: jnp.ndarray, mask: jnp.ndarray, ho: int, wo: int
):
    """Reference-exact offset handling for mismatched resolutions.

    DyConv predicts offsets at level L but applies them to the conv over
    level L+1 (vldyhead.py:224), whose output grid is smaller. The reference
    CUDA kernel (deform_conv_kernel_cuda.cu:607-620) indexes the offset/mask
    buffers with strides derived from the OUTPUT size, i.e. it reinterprets
    the flat NCHW buffer with the wrong shape. The released checkpoints were
    trained under that reinterpretation, so replicate it bit-for-bit AT THE
    REFERENCE'S EVAL BATCH SIZE (1): each item's own channel-major flat view,
    first C*Ho*Wo elements. (At CUDA batch > 1 the kernel's wrong per-image
    stride additionally bleeds across items; our batch axis carries logically
    independent chunk forwards, so batch-1 semantics per item is the faithful
    reproduction of the reference eval path.)
    """
    b, hl, wl, co = offset.shape
    cm = mask.shape[-1]

    def misread(x, ch):
        flat = x.transpose(0, 3, 1, 2).reshape(b, ch * hl * wl)
        return (
            flat[:, : ch * ho * wo]
            .reshape(b, ch, ho, wo)
            .transpose(0, 2, 3, 1)
        )

    return misread(offset, co), misread(mask, cm)


def resize_offsets(offset: jnp.ndarray, mask: jnp.ndarray, ho: int, wo: int):
    """Resize an (offset, mask) pair to a new output resolution.

    Used by DyConv when offsets predicted at level L are applied to a conv
    whose output lives at a different resolution (vldyhead.py:218-227 applies
    the level-L offsets to convs over levels L±1). Offset VALUES are in units
    of source pixels of the conv input, so only the field is resampled, not
    rescaled — matching the stride-2 case where reference offset maps already
    align 1:1 with the output grid.
    """
    from mqdet_tpu.models.layers import resize_bilinear_matmul

    om = jnp.concatenate([offset, mask], axis=-1)
    # half-pixel bilinear as two static matmuls (jax.image.resize lowers to
    # gathers — pathologically slow on TPU)
    om = resize_bilinear_matmul(om, ho, wo, align_corners=False)
    return om[..., :18], om[..., 18:]


@functools.partial(
    jax.jit, static_argnames=("stride", "radius", "block_rows")
)
def modulated_deform_conv_window(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: int = 1,
    radius: int = 3,
    block_rows: int = 8,
) -> jnp.ndarray:
    """Gather-free DCNv2: window-clipped bilinear sampling as batched matmuls.

    TPU has no fast per-element gather, so the unbounded bilinear sample of
    the CUDA kernel is reformulated: offsets are clipped to [-radius, radius]
    (learned DCN offsets concentrate near zero; radius is configurable) and
    each tap's sample becomes a weighted sum over a STATIC window of integer
    shifts:

        sample(p, k) = sum_d  hat(rel_y(p,k) - dy) * hat(rel_x(p,k) - dx)
                              * x[p*stride + d]

    where hat(t) = max(0, 1-|t|) and d ranges over the (2*radius+4)^2 shift
    window covering tap footprint + clipped offset + bilinear corners. The
    shifts are static slices (free), and the contraction over the window is a
    per-position batched matmul on the MXU:

        (9, D^2) @ (D^2, C)  batched over positions.

    Processing happens in row blocks so the (block, W, D^2, C) patch tensor
    stays ~100 MB. Exactly equals the reference semantics whenever
    |offset| <= radius (tests compare against the gather implementation).
    """
    b, h, w, c = x.shape
    ho, wo = offset.shape[1], offset.shape[2]
    kh, kw, _, cout = weight.shape
    k = kh * kw
    # shift window: rel = tap + clipped offset in [-1-radius, 1+radius];
    # corners floor(rel), floor(rel)+1 -> d in [-1-radius-1+1 .. 1+radius+1]
    d_lo = -radius - 1
    d_hi = radius + 2  # inclusive
    dsz = d_hi - d_lo + 1

    # pad input so every (out*stride + d) is a valid index — including rows
    # of the block-padded output range [0, ho_pad)
    nblk_ = -(-ho // block_rows)
    ho_pad_ = nblk_ * block_rows
    pad_lo = -d_lo
    pad_hi_rows = d_hi + (ho_pad_ * stride - h) + (stride - 1)
    pad_hi_cols = d_hi + (stride - 1)
    xp = jnp.pad(
        x, ((0, 0), (pad_lo, pad_hi_rows), (pad_lo, pad_hi_cols), (0, 0))
    )

    # per-tap sampling positions relative to out*stride
    tap = jnp.stack(
        jnp.meshgrid(jnp.arange(kh) - 1, jnp.arange(kw) - 1, indexing="ij"),
        -1,
    ).reshape(k, 2).astype(x.dtype)  # (9, 2) (dy, dx)
    off = offset.reshape(b, ho, wo, k, 2)
    off = jnp.clip(off, -radius, radius)
    rel = off + tap  # (B, Ho, Wo, 9, 2)

    dgrid = jnp.arange(d_lo, d_hi + 1, dtype=x.dtype)  # (D,)
    # separable hat weights
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(rel[..., 0:1] - dgrid))  # (B,Ho,Wo,9,D)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(rel[..., 1:2] - dgrid))
    coef = (wy[..., :, None] * wx[..., None, :]).reshape(b, ho, wo, k, dsz * dsz)
    coef = coef * mask[..., None]  # fold DCNv2 modulation

    # fold the conv kernel contraction: (9, C, Cout)
    w_mat = weight.reshape(k, c, cout)

    nblk = -(-ho // block_rows)
    ho_pad = nblk * block_rows
    coef = jnp.pad(coef, ((0, 0), (0, ho_pad - ho), (0, 0), (0, 0), (0, 0)))

    def process_block(i0):
        # input rows for out rows [r0, r0+block_rows): r0*stride + d + pad_lo
        r0 = i0 * block_rows
        band = jax.lax.dynamic_slice_in_dim(
            xp, r0 * stride, block_rows * stride + (dsz - 1), axis=1
        )  # (B, block*stride + D - 1, W + pads, C)
        patches = []
        for dy in range(dsz):
            for dx in range(dsz):
                sl = jax.lax.slice(
                    band,
                    (0, dy, dx, 0),
                    (b, dy + (block_rows - 1) * stride + 1,
                     dx + (wo - 1) * stride + 1, c),
                    (1, stride, stride, 1),
                )  # (B, block_rows, Wo, C)
                patches.append(sl)
        patch = jnp.stack(patches, axis=-2)  # (B, BR, Wo, D^2, C)
        cblk = jax.lax.dynamic_slice_in_dim(coef, r0, block_rows, axis=1)
        # HIGHEST: DEFAULT matmul precision feeds bf16 into the MXU (and
        # this jax version mirrors that on CPU), which costs ~2.5e-3 in the
        # bilinear coefficients — enough to break parity-vs-gather tests.
        s = jnp.einsum(
            "bhwkd,bhwdc->bhwkc", cblk.astype(x.dtype), patch,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (B, BR, Wo, 9, C)
        out = jnp.einsum(
            "bhwkc,kco->bhwo", s.astype(x.dtype), w_mat.astype(x.dtype),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return out.astype(x.dtype)

    blocks = jax.lax.map(process_block, jnp.arange(nblk))  # (NB, B, BR, Wo, Cout)
    out = blocks.transpose(1, 0, 2, 3, 4).reshape(b, ho_pad, wo, cout)[:, :ho]
    if bias is not None:
        out = out + bias
    return out
