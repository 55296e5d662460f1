"""Pallas TPU kernel: modulated deformable conv via in-VMEM dynamic gather.

Second-generation DCNv2 kernel (see deform_conv_pallas.py for the
hat-window variant). Mosaic's `tpu.dynamic_gather` (jnp.take_along_axis
along axis 0 of a 2-D VMEM value) allows the true 4-corner bilinear
formulation of the reference CUDA kernel
(csrc/cuda/deform_conv_kernel_cuda.cu): per tap, gather the 4 corner rows
of the flattened input band at per-position dynamic indices and blend with
the bilinear fractions. VPU work per conv is 9 taps x 4 (gather + FMA)
over (R, C) tiles — ~6x less than the hat-window kernel's dsz^2 x 9 FMAs —
and the tap matmuls still run on the MXU inside the same kernel.

Offsets are clipped to [-radius, radius] (same contract as
modulated_deform_conv_window; exact 4-corner bilinear inside the clip
range). No phase decomposition: dynamic indices absorb the stride.

STATUS: interpret-mode exact (tests/test_ops.py), but BLOCKED on real v5e
with this jax/Mosaic version: `tpu.dynamic_gather` lowering fails with
"Not implemented: Multiple source vregs along gather dimension" — the
hardware gather only spans one vreg (8 sublanes) along the gathered axis,
while this kernel gathers across the whole flattened band. Kept as the
ready successor: when Mosaic grows multi-vreg dynamic gather this kernel is
~6x less VPU work than the shipping hat-window kernel
(deform_conv_pallas.py), which remains the production path.

Layout notes (v5e-verified constraints):
  * band is (BAND_ROWS, Wp2, C) in VMEM, flattened to (BAND_ROWS*Wp2, C)
    for the gather — Wp2 is padded to the sublane tile so the collapse is
    layout-free.
  * gather output rows == operand rows (R); position rows N <= R occupy the
    leading rows, weights for the tail are zeroed.
  * per-position corner indices are (N, 1) i32 columns broadcast across
    lanes (Mosaic-native (N,1)*(N,C) pattern).
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
    rely_ref,    # (1, N, 9) f32 rel_y (clipped offset + tap) per position
    relxm_ref,   # (1, N, 18) lanes 0:9 rel_x, 9:18 modulation
    xp_ref,      # (B, Hp, Wp2, C) padded input (ANY/HBM)
    w_ref,       # (9, C, Cout)
    b_ref,       # (1, Cout)
    out_ref,     # (1, N, Cout)
    band,        # scratch VMEM (BAND_ROWS, Wp2, C)
    sem,         # DMA semaphore
    *,
    n: int,       # positions per block (BR * Wp)
    r: int,       # gather rows = BAND_ROWS * Wp2
    br: int,
    wp: int,
    wp2: int,
    c: int,
    stride: int,
    band_rows: int,
):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    k = 9

    dma = pltpu.make_async_copy(
        xp_ref.at[bi, pl.ds(i * br * stride, band_rows)],
        band,
        sem,
    )
    dma.start()
    dma.wait()
    band2d = band[...].reshape(r, c)

    # per-position (row, col) within the block, in band coordinates
    p = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    prow = (p // wp) * stride
    pcol = (p % wp) * stride

    mm_prec = (
        jax.lax.Precision.HIGHEST if w_ref.dtype == jnp.float32 else None
    )
    out = b_ref[0][None, :].astype(jnp.float32) + jnp.zeros(
        (n, b_ref.shape[1]), jnp.float32
    )

    pad_rows = r - n
    for kk in range(k):
        rely = rely_ref[0, :, kk : kk + 1]              # (N, 1)
        relx = relxm_ref[0, :, kk : kk + 1]
        m = relxm_ref[0, :, k + kk : k + kk + 1]
        fy = jnp.floor(rely)
        fx = jnp.floor(relx)
        ly = rely - fy
        lx = relx - fx
        row0 = prow + fy.astype(jnp.int32)
        col0 = pcol + fx.astype(jnp.int32)

        acc = jnp.zeros((r, c), jnp.float32)
        for dy, dx, wgt in (
            (0, 0, (1.0 - ly) * (1.0 - lx)),
            (0, 1, (1.0 - ly) * lx),
            (1, 0, ly * (1.0 - lx)),
            (1, 1, ly * lx),
        ):
            idx = (row0 + dy) * wp2 + (col0 + dx)        # (N, 1)
            idx_full = jnp.pad(idx, ((0, pad_rows), (0, 0)))
            idx_full = jnp.broadcast_to(idx_full, (r, c))
            g = jnp.take_along_axis(
                band2d, idx_full, axis=0, mode="promise_in_bounds"
            )
            wcol = jnp.pad(wgt * m, ((0, pad_rows), (0, 0)))
            acc += wcol * g.astype(jnp.float32)

        out += jnp.dot(
            acc[:n].astype(w_ref.dtype), w_ref[kk],
            preferred_element_type=jnp.float32,
            precision=mm_prec,
        )

    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("stride", "radius", "block_rows", "interpret"),
)
def modulated_deform_conv_pallas_gather(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    radius: int = 2,
    block_rows: int = 16,
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
    d_lo = -radius - 1   # min corner shift: floor(-1 - radius)
    d_hi = radius + 2    # max corner shift: floor(1 + radius) + 1
    s = stride

    br = min(block_rows, ho)
    nblk = -(-ho // br)
    ho_pad = nblk * br
    wp = -(-wo // 16) * 16
    n = br * wp

    # ---- rel coordinates ---------------------------------------------------
    tap = np.stack(
        np.meshgrid(np.arange(3) - 1, np.arange(3) - 1, indexing="ij"), -1
    ).reshape(k, 2)
    off = offset.reshape(b, ho, wo, k, 2).astype(jnp.float32)
    off = jnp.clip(off, -float(radius), float(radius))
    rel = off + jnp.asarray(tap, jnp.float32)  # (B,Ho,Wo,9,2)
    # shift rel into band coordinates: corner index = floor(rel) - d_lo >= 0
    rel = rel - float(d_lo)
    # pad cols/rows with 0 (weights are zeroed for padded rows via mask pad)
    rel = jnp.pad(rel, ((0, 0), (0, ho_pad - ho), (0, wp - wo), (0, 0), (0, 0)))
    rely = rel[..., 0].reshape(b, ho_pad * wp, k)
    maskp = jnp.pad(
        mask.astype(jnp.float32),
        ((0, 0), (0, ho_pad - ho), (0, wp - wo), (0, 0)),
    )
    relxm = jnp.concatenate([rel[..., 1], maskp], axis=-1).reshape(
        b, ho_pad * wp, 2 * k
    )

    # ---- padded input -------------------------------------------------------
    pad_lo = -d_lo
    # rows needed: (ho_pad-1)*s + d_hi + 1 past origin, plus pad_lo lead
    need_h = pad_lo + (ho_pad - 1) * s + d_hi + 2
    need_w = pad_lo + (wo - 1) * s + d_hi + 2
    wp_cols = pad_lo + (wp - 1) * s + d_hi + 2
    wp2 = -(-wp_cols // 8) * 8
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (pad_lo, max(0, need_h - h - pad_lo)),
            (pad_lo, max(0, wp2 - w - pad_lo)),
            (0, 0),
        ),
    )
    xp = xp[:, :, :wp2, :]
    hp = xp.shape[1]

    band_rows = br * s + (d_hi - d_lo) + 2
    # ensure the last block's DMA stays in range
    need_rows = (nblk - 1) * br * s + band_rows
    if hp < need_rows:
        xp = jnp.pad(xp, ((0, 0), (0, need_rows - hp), (0, 0), (0, 0)))
    r = band_rows * wp2

    w_mat = weight.reshape(k, c, cout).astype(x.dtype)
    bias_arr = (
        bias.reshape(1, cout).astype(x.dtype)
        if bias is not None
        else jnp.zeros((1, cout), x.dtype)
    )

    kernel = functools.partial(
        _kernel,
        n=n, r=r, br=br, wp=wp, wp2=wp2, c=c, stride=s, band_rows=band_rows,
    )

    out = pl.pallas_call(
        kernel,
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec(
                (1, n, k), lambda bi, i: (bi, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n, 2 * k), lambda bi, i: (bi, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n, cout), lambda bi, i: (bi, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, ho_pad * wp, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((band_rows, wp2, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(rely, relxm, xp, w_mat, bias_arr)

    return out.reshape(b, ho_pad, wp, cout)[:, :ho, :wo]
