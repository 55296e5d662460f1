"""Pallas TPU kernel: modulated deformable convolution (DCNv2).

The performance-critical op of the GLIP VLDyHead (18 deform convs per
forward; reference CUDA kernels csrc/cuda/deform_conv_kernel_cuda.cu, used
via maskrcnn_benchmark/modeling/rpn/vldyhead.py:186-217).

TPU has no fast per-element gather, so the kernel uses a window-clipped
formulation (see ops/deform_conv.py modulated_deform_conv_window): offsets
are clipped to [-radius, radius] and every tap's bilinear sample becomes a
weighted sum over a STATIC window of integer shifts with separable hat
weights:

    sample_k(p) = sum_d hat(rel_y - dy) * hat(rel_x - dx) * x[p*stride + d]

The kernel streams the input band through VMEM via async DMA and accumulates
all 9 taps at once per shift — each of the dsz^2 terms is ONE wide VPU
multiply-add over (BR*W, 9*C) lanes against a per-position coef vector; the
deformable im2col never touches HBM. The trailing (BR*W, 9C) @ (9C, Cout)
projection runs on the MXU inside the same kernel. HBM traffic per conv:
read x + hat weights once, write out once.

Strided (stride=2) sampling is handled by phase-decomposing the padded input
host-side into stride^2 planes so every shift slice in the kernel is static.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    wy_ref,      # (1, BR, Wo, dsz*9)  vertical hat weights (dy-major lanes)
    wxm_ref,     # (1, BR, Wo, dsz*9)  horizontal hat weights * modulation
    xp_ref,      # (B, S, S, Hp2, Wp2, C) phase-decomposed padded input (ANY)
    w_ref,       # (9*C, Cout)
    b_ref,       # (1, Cout)
    out_ref,     # (1, BR, Wo, Cout)
    band,        # scratch VMEM (S, S, BAND_ROWS, Wp2, C)
    acc,         # scratch VMEM (BR*Wo, 9*C) f32
    sem,         # DMA semaphore
    *,
    br: int,
    wo: int,
    c: int,
    cout: int,
    dsz: int,
    stride: int,
    band_rows: int,
):
    bi = pl.program_id(0)
    i = pl.program_id(1)

    dma = pltpu.make_async_copy(
        xp_ref.at[bi, :, :, pl.ds(i * br, band_rows)],
        band,
        sem,
    )
    dma.start()
    dma.wait()

    k = 9
    acc[...] = jnp.zeros_like(acc)
    for dy in range(dsz):
        py, by = dy % stride, dy // stride
        wy_d = wy_ref[0, :, :, dy * 9 : (dy + 1) * 9]  # (BR, Wo, 9)
        for dx in range(dsz):
            px, bx = dx % stride, dx // stride
            sl = band[py, px, by : by + br, bx : bx + wo, :]  # (BR, Wo, C)
            coef = wy_d * wxm_ref[0, :, :, dx * 9 : (dx + 1) * 9]  # (BR, Wo, 9)
            term = (
                coef.astype(jnp.float32)[..., None]
                * sl.astype(jnp.float32)[..., None, :]
            ).reshape(br * wo, k * c)
            acc[...] += term

    out = jnp.dot(
        acc[...].astype(w_ref.dtype), w_ref[...],
        preferred_element_type=jnp.float32,
    )
    out = out + b_ref[0][None, :].astype(jnp.float32)
    out_ref[0] = out.reshape(br, wo, cout).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("stride", "radius", "block_rows", "interpret"),
)
def modulated_deform_conv_pallas(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    radius: int = 2,
    block_rows: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in equivalent of modulated_deform_conv_window (3x3, pad 1).

    x: (B, H, W, C); offset: (B, Ho, Wo, 18); mask: (B, Ho, Wo, 9);
    weight: (3, 3, C, Cout). Returns (B, Ho, Wo, Cout).
    """
    b, h, w, c = x.shape
    ho, wo = offset.shape[1], offset.shape[2]
    kh, kw, _, cout = weight.shape
    k = kh * kw
    d_lo = -radius - 1
    d_hi = radius + 2
    dsz = d_hi - d_lo + 1
    s = stride

    br = min(block_rows, ho)
    nblk = -(-ho // br)
    ho_pad = nblk * br

    # ---- hat weights (XLA elementwise) -----------------------------------
    tap = np.stack(
        np.meshgrid(np.arange(3) - 1, np.arange(3) - 1, indexing="ij"), -1
    ).reshape(k, 2)
    off = offset.reshape(b, ho, wo, k, 2).astype(jnp.float32)
    off = jnp.clip(off, -float(radius), float(radius))
    rel = off + jnp.asarray(tap, jnp.float32)
    dgrid = jnp.arange(d_lo, d_hi + 1, dtype=jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(rel[..., 0:1] - dgrid))  # (B,Ho,Wo,9,dsz)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(rel[..., 1:2] - dgrid))
    wxm = wx * mask.astype(jnp.float32)[..., None]
    # dy-major lane layout: lane (dy*9 + k)
    wy = wy.transpose(0, 1, 2, 4, 3).reshape(b, ho, wo, dsz * k).astype(x.dtype)
    wxm = wxm.transpose(0, 1, 2, 4, 3).reshape(b, ho, wo, dsz * k).astype(x.dtype)
    wy = jnp.pad(wy, ((0, 0), (0, ho_pad - ho), (0, 0), (0, 0)))
    wxm = jnp.pad(wxm, ((0, 0), (0, ho_pad - ho), (0, 0), (0, 0)))

    # ---- padded, phase-decomposed input -----------------------------------
    pad_lo = -d_lo
    hp2 = ho_pad + (dsz - 1) // s + 1
    wp2 = wo + (dsz - 1) // s + 1
    need_h = (hp2 - 1) * s + (s - 1) + 1
    need_w = (wp2 - 1) * s + (s - 1) + 1
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (pad_lo, max(0, need_h - h - pad_lo)),
            (pad_lo, max(0, need_w - w - pad_lo)),
            (0, 0),
        ),
    )
    xp = xp[:, : hp2 * s, : wp2 * s, :]
    xp = xp.reshape(b, hp2, s, wp2, s, c).transpose(0, 2, 4, 1, 3, 5)
    # (B, S, S, Hp2, Wp2, C)

    band_rows = br + (dsz - 1) // s

    w_mat = weight.reshape(k * c, cout).astype(x.dtype)
    bias_arr = (
        bias.reshape(1, cout).astype(x.dtype)
        if bias is not None
        else jnp.zeros((1, cout), x.dtype)
    )

    kernel = functools.partial(
        _kernel,
        br=br, wo=wo, c=c, cout=cout, dsz=dsz, stride=s, band_rows=band_rows,
    )

    out = pl.pallas_call(
        kernel,
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec(
                (1, br, wo, k * dsz), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, br, wo, k * dsz), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, br, wo, cout), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, ho_pad, wo, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((s, s, band_rows, wp2, c), x.dtype),
            pltpu.VMEM((br * wo, k * c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(wy, wxm, xp, w_mat, bias_arr)

    return out[:, :ho]
