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

vs the XLA window composite, which is HBM-bound on its materialized
(N, D^2, C) im2col patches (~0.5 GB of traffic per level-0 conv), the kernel
keeps the entire im2col in VMEM: the input band streams in via async DMA,
per integer shift each tap's sample accumulates with a per-position column
coefficient ((N,1) * (N,C) lane broadcast — the Mosaic-native pattern), and
the 9 (N,C)@(C,Cout) MXU matmuls run inside the same kernel. HBM traffic per
conv: read x + rel/mask once, write out once.

The hat has support 2: per position only a 2x2 corner of the dsz^2 window
contributes. The host computes per-(block, tap) integer bounds
[floor(min rel), floor(max rel)+1] on both axes and the kernel loops only
that sub-window (dynamic fori over dy, conditional skip over dx), so the VPU
work tracks the actual offset spread (~2x2..4x4 typical) instead of the
worst-case dsz^2 = (2*radius+4)^2.

Mosaic constraints that shaped this (all observed on real v5e):
  * no sublane->lane merges: (BR,Wo,9,C)->(N,9C) reshape fails
    infer-vector-layout; per-tap (N,C) accumulators avoid it. `wo` is padded
    to the sublane tile so (BR,Wp,C)->(BR*Wp,C) is a layout no-op.
  * big unrolled bodies spill: a fully unrolled dsz^2 x 9 accumulation
    allocates a stack slot per SSA value (~180 MB). Shift loops are
    lax.fori_loop and the accumulator is a VMEM scratch ref updated in place.
  * no dynamic lane slicing: hat coefficients are computed IN-kernel from
    (N, 9) rel/mask lanes (elementwise vs the loop-carried shift scalar)
    instead of slicing a precomputed (N, dsz*9) table at lane dy*9.
  * f32 matmul DEFAULT precision truncates operands to bf16 (~2.5e-3 error);
    HIGHEST is set for f32 operands, while bf16 operands reject HIGHEST.

Strided (stride=2) sampling is handled by phase-decomposing the padded input
host-side into stride^2 planes so every shift slice in the kernel is static
in the minor dims (the row-phase/row-block index may be dynamic).
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
    bounds_ref,  # SMEM (1, 1, 9, 4) i32: per tap [dy0, dy1, dx0, dx1] incl.
    rely_ref,    # (1, BR*Wp, 9)  rel_y = clipped dy-offset + tap_y  (f32)
    relxm_ref,   # (1, BR*Wp, 18) lanes 0:9 rel_x, 9:18 modulation   (f32)
    xp_ref,      # (B, S, S, Hp2, Wp2, C) phase-decomposed padded input (ANY)
    w_ref,       # (9, C, Cout)
    b_ref,       # (1, Cout)
    out_ref,     # (1, BR*Wp, Cout)
    band,        # scratch VMEM (S, S, BAND_ROWS, Wp2, C)
    acc,         # scratch VMEM (1, BR*Wp, C) f32, reused per tap
    sem,         # DMA semaphore
    *,
    br: int,
    wp: int,
    c: int,
    dsz: int,
    d_lo: int,
    stride: int,
    band_rows: int,
):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    k = 9

    dma = pltpu.make_async_copy(
        xp_ref.at[bi, :, :, pl.ds(i * br, band_rows)],
        band,
        sem,
    )
    dma.start()
    dma.wait()

    # f32 matmul wants HIGHEST (DEFAULT truncates operands to bf16); Mosaic
    # rejects HIGHEST for bf16 operands, where DEFAULT is already exact.
    mm_prec = (
        jax.lax.Precision.HIGHEST if w_ref.dtype == jnp.float32 else None
    )
    out = b_ref[0][None, :].astype(jnp.float32) + jnp.zeros(
        (br * wp, b_ref.shape[1]), jnp.float32
    )

    for kk in range(k):
        rely_k = rely_ref[0, :, kk : kk + 1]                    # (N, 1)
        relx_k = relxm_ref[0, :, kk : kk + 1]                   # (N, 1)
        mskh_k = relxm_ref[0, :, k + kk : k + kk + 1]           # (N, 1)
        dy0 = bounds_ref[0, 0, kk, 0]
        dy1 = bounds_ref[0, 0, kk, 1]
        dx0 = bounds_ref[0, 0, kk, 2]
        dx1 = bounds_ref[0, 0, kk, 3]
        acc[0] = jnp.zeros((br * wp, c), acc.dtype)

        def row_shift(dy, _):
            dyf = (d_lo + dy).astype(jnp.float32)
            hym = jnp.maximum(0.0, 1.0 - jnp.abs(rely_k - dyf)) * mskh_k
            if stride == 1:
                py, by = 0, dy
            else:
                py = jax.lax.rem(dy, stride)
                by = jax.lax.div(dy, stride)
            for dx in range(dsz):
                pxs, bxs = dx % stride, dx // stride

                def fma():
                    sl = band[py, pxs, pl.ds(by, br), bxs : bxs + wp, :]
                    sl = sl.reshape(br * wp, c).astype(jnp.float32)
                    hx = jnp.maximum(
                        0.0, 1.0 - jnp.abs(relx_k - float(d_lo + dx))
                    )
                    acc[0] += (hym * hx) * sl

                jax.lax.cond((dx0 <= dx) & (dx <= dx1), fma, lambda: None)
            return 0

        jax.lax.fori_loop(dy0, dy1 + 1, row_shift, 0)
        out += jnp.dot(
            acc[0].astype(w_ref.dtype), w_ref[kk],
            preferred_element_type=jnp.float32,
            precision=mm_prec,
        )

    out_ref[0] = out.astype(out_ref.dtype)


def _kernel_v2(
    bounds_ref,  # SMEM (1, 1, 9, 4) i32: per tap [dy0, dy1, dx0, dx1] incl.
    rely_ref,    # (1, BR*Wp, 9)  rel_y (f32)
    relxm_ref,   # (1, BR*Wp, 18) lanes 0:9 rel_x, 9:18 modulation (f32)
    xp_ref,      # (B, S, S, Hp2, Wp2, C) phase-decomposed padded input (ANY)
    w_ref,       # (9, C, Cout)
    b_ref,       # (1, Cout)
    out_ref,     # (1, BR*Wp, Cout)
    band,        # scratch VMEM (2, S, S, BAND_ROWS, Wp2, C) double-buffered
    band_sh,     # scratch VMEM (DSZ, S, BAND_ROWS, Wp, C) x-shifted copies
    acc,         # scratch VMEM (1, BR*Wp, C) f32, reused per tap
    sems,        # DMA semaphore array (2,)
    *,
    br: int,
    wp: int,
    c: int,
    dsz: int,
    d_lo: int,
    stride: int,
    band_rows: int,
    nblk: int,
):
    """v1 with two structural changes (both ~2x at level-0 LVIS shapes):

    * the band DMA is double-buffered across (sequential) grid steps, so the
      HBM load of block i+1 overlaps block i's compute;
    * per integer x-shift the band is copied ONCE into `band_sh` (static
      sublane-offset slices), then both shift loops are dynamic-bound
      fori_loops over free (untiled) dims — v1 paid a conditional and an
      unaligned sublane window per (tap, dy, dx) triple.
    """
    bi = pl.program_id(0)
    i = pl.program_id(1)
    step = bi * nblk + i
    nb_total = pl.num_programs(0) * nblk
    slot = jax.lax.rem(step, 2)
    k = 9

    def dma_for(stp, slt):
        bb = jax.lax.div(stp, nblk)
        ii = jax.lax.rem(stp, nblk)
        return pltpu.make_async_copy(
            xp_ref.at[bb, :, :, pl.ds(ii * br, band_rows)],
            band.at[slt],
            sems.at[slt],
        )

    @pl.when(step == 0)
    def _():
        dma_for(step, slot).start()

    dma_for(step, slot).wait()

    @pl.when(step + 1 < nb_total)
    def _():
        dma_for(step + 1, 1 - slot).start()

    # x-shifted copies: all later dynamic indexing lands on untiled dims.
    # band_sh may be f32 while the band is bf16 (version 6): converting once
    # here removes the per-(tap, dy, dx)-pass (BR*Wp, C) convert from the
    # span loops — the passes' op count, not their VMEM traffic, is the
    # measured bottleneck at wide spans.
    for dx in range(dsz):
        pxs, bxs = dx % stride, dx // stride
        for py in range(stride):
            band_sh[dx, py] = band[slot, py, pxs, :, bxs : bxs + wp, :].astype(
                band_sh.dtype
            )

    mm_prec = (
        jax.lax.Precision.HIGHEST if w_ref.dtype == jnp.float32 else None
    )
    out = b_ref[0][None, :].astype(jnp.float32) + jnp.zeros(
        (br * wp, b_ref.shape[1]), jnp.float32
    )

    for kk in range(k):
        rely_k = rely_ref[0, :, kk : kk + 1]                    # (N, 1)
        relx_k = relxm_ref[0, :, kk : kk + 1]                   # (N, 1)
        mskh_k = relxm_ref[0, :, k + kk : k + kk + 1]           # (N, 1)
        dy0 = bounds_ref[0, 0, kk, 0]
        dy1 = bounds_ref[0, 0, kk, 1]
        dx0 = bounds_ref[0, 0, kk, 2]
        dx1 = bounds_ref[0, 0, kk, 3]
        acc_t = acc.dtype
        acc[0] = jnp.zeros((br * wp, c), acc_t)

        def row_shift(dy, _):
            dyf = (d_lo + dy).astype(jnp.float32)
            hym = (
                jnp.maximum(0.0, 1.0 - jnp.abs(rely_k - dyf)) * mskh_k
            ).astype(acc_t)
            if stride == 1:
                py, by = 0, dy
            else:
                py = jax.lax.rem(dy, stride)
                by = jax.lax.div(dy, stride)

            def col_shift(dx, _):
                hx = jnp.maximum(
                    0.0,
                    1.0 - jnp.abs(relx_k - (d_lo + dx).astype(jnp.float32)),
                ).astype(acc_t)
                sl = band_sh[dx, py, pl.ds(by, br), :, :]
                acc[0] += (hym * hx) * sl.reshape(br * wp, c).astype(acc_t)
                return 0

            jax.lax.fori_loop(dx0, dx1 + 1, col_shift, 0)
            return 0

        jax.lax.fori_loop(dy0, dy1 + 1, row_shift, 0)
        out += jnp.dot(
            acc[0].astype(w_ref.dtype), w_ref[kk],
            preferred_element_type=jnp.float32,
            precision=mm_prec,
        )

    out_ref[0] = out.astype(out_ref.dtype)


def _kernel_v5(
    bounds_ref,  # SMEM (1, 1, 9, 4) i32: per tap [dy0, dy1, dx0, dx1] incl.
    rely_ref,    # (1, BR*Wp, 9)  rel_y (f32)
    relxm_ref,   # (1, BR*Wp, 18) lanes 0:9 rel_x, 9:18 modulation (f32)
    xp_ref,      # (B, S, S, Hp2, Wp2, C) phase-decomposed padded input (ANY)
    w_ref,       # (9, C, Cout)
    b_ref,       # (1, Cout)
    out_ref,     # (1, BR*Wp, Cout)
    band,        # scratch VMEM (2, S, S, BAND_ROWS, Wp2, C) double-buffered
    band_sh,     # scratch VMEM (DSZ, S, BAND_ROWS, Wp, C) x-shifted copies
    acc,         # scratch VMEM (1, BR*Wp, C) f32, slow-path only
    sems,        # DMA semaphore array (2,)
    *,
    br: int,
    wp: int,
    c: int,
    dsz: int,
    d_lo: int,
    stride: int,
    band_rows: int,
    nblk: int,
):
    """v2 with a 2x2 fast path that bypasses the accumulator entirely.

    The hat has support 2, so per OUTPUT POSITION exactly a 2x2 integer-shift
    cell contributes; the per-(block, tap) bounds only exceed a 2x2 span when
    offsets vary WITHIN one block. v2 pays, per tap, an acc zeroing pass +
    one f32 read-modify-write pass per cell + an acc read for the matmul
    (~48 B/elem of VMEM traffic at a 2x2). Here the 4 hat terms are one SSA
    expression feeding the MXU matmul directly — no acc traffic at all
    (~8 B/elem). Exactness: any shift outside the true bounds has hat == 0
    for every position in the block, so clamping the 2x2 base into range
    never changes the value. The dynamic-span slow path (v2's loops) runs
    under pl.when and its result is selected by a scalar where().

    MEASURED NEGATIVE on v5e (see PERF.md): a block spans the full padded
    width (168+ cols), and real offset fields vary enough across it that the
    2x2 condition almost never holds — the fast expression is then computed
    and discarded on top of the slow path (rand: 6.44 vs v2 5.55 ms; smooth:
    6.08 vs 5.05 ms). Exact (bit-identical, tested); kept for sweeps.
    """
    bi = pl.program_id(0)
    i = pl.program_id(1)
    step = bi * nblk + i
    nb_total = pl.num_programs(0) * nblk
    slot = jax.lax.rem(step, 2)
    k = 9

    def dma_for(stp, slt):
        bb = jax.lax.div(stp, nblk)
        ii = jax.lax.rem(stp, nblk)
        return pltpu.make_async_copy(
            xp_ref.at[bb, :, :, pl.ds(ii * br, band_rows)],
            band.at[slt],
            sems.at[slt],
        )

    @pl.when(step == 0)
    def _():
        dma_for(step, slot).start()

    dma_for(step, slot).wait()

    @pl.when(step + 1 < nb_total)
    def _():
        dma_for(step + 1, 1 - slot).start()

    for dx in range(dsz):
        pxs, bxs = dx % stride, dx // stride
        for py in range(stride):
            band_sh[dx, py] = band[slot, py, pxs, :, bxs : bxs + wp, :]

    mm_prec = (
        jax.lax.Precision.HIGHEST if w_ref.dtype == jnp.float32 else None
    )
    out = b_ref[0][None, :].astype(jnp.float32) + jnp.zeros(
        (br * wp, b_ref.shape[1]), jnp.float32
    )

    def rd(dy, dx):
        """(br*wp, c) f32 slice of the shifted band at dynamic (dy, dx)."""
        if stride == 1:
            py, by = 0, dy
        else:
            py = jax.lax.rem(dy, stride)
            by = jax.lax.div(dy, stride)
        sl = band_sh[dx, py, pl.ds(by, br), :, :]
        return sl.reshape(br * wp, c).astype(jnp.float32)

    for kk in range(k):
        rely_k = rely_ref[0, :, kk : kk + 1]                    # (N, 1)
        relx_k = relxm_ref[0, :, kk : kk + 1]                   # (N, 1)
        mskh_k = relxm_ref[0, :, k + kk : k + kk + 1]           # (N, 1)
        dy0 = bounds_ref[0, 0, kk, 0]
        dy1 = bounds_ref[0, 0, kk, 1]
        dx0 = bounds_ref[0, 0, kk, 2]
        dx1 = bounds_ref[0, 0, kk, 3]
        is_fast = ((dy1 - dy0) <= 1) & ((dx1 - dx0) <= 1)

        # ---- slow path: v2's dynamic-bound loops into the scratch acc ----
        @pl.when(jnp.logical_not(is_fast))
        def _():
            acc[0] = jnp.zeros((br * wp, c), jnp.float32)

            def row_shift(dy, _):
                dyf = (d_lo + dy).astype(jnp.float32)
                hym = jnp.maximum(0.0, 1.0 - jnp.abs(rely_k - dyf)) * mskh_k

                def col_shift(dx, _):
                    hx = jnp.maximum(
                        0.0,
                        1.0
                        - jnp.abs(relx_k - (d_lo + dx).astype(jnp.float32)),
                    )
                    acc[0] += (hym * hx) * rd(dy, dx)
                    return 0

                jax.lax.fori_loop(dx0, dx1 + 1, col_shift, 0)
                return 0

            jax.lax.fori_loop(dy0, dy1 + 1, row_shift, 0)

        # ---- fast path: 4 hat terms, one expression, no acc ----
        dyb = jnp.minimum(dy0, dsz - 2)
        dxb = jnp.minimum(dx0, dsz - 2)
        hy0 = jnp.maximum(
            0.0, 1.0 - jnp.abs(rely_k - (d_lo + dyb).astype(jnp.float32))
        ) * mskh_k
        hy1 = jnp.maximum(
            0.0, 1.0 - jnp.abs(rely_k - (d_lo + dyb + 1).astype(jnp.float32))
        ) * mskh_k
        hx0 = jnp.maximum(
            0.0, 1.0 - jnp.abs(relx_k - (d_lo + dxb).astype(jnp.float32))
        )
        hx1 = jnp.maximum(
            0.0, 1.0 - jnp.abs(relx_k - (d_lo + dxb + 1).astype(jnp.float32))
        )
        fast = (
            (hy0 * hx0) * rd(dyb, dxb)
            + (hy0 * hx1) * rd(dyb, dxb + 1)
            + (hy1 * hx0) * rd(dyb + 1, dxb)
            + (hy1 * hx1) * rd(dyb + 1, dxb + 1)
        )

        sampled = jnp.where(is_fast, fast, acc[0])
        out += jnp.dot(
            sampled.astype(w_ref.dtype), w_ref[kk],
            preferred_element_type=jnp.float32,
            precision=mm_prec,
        )

    out_ref[0] = out.astype(out_ref.dtype)


def _mdc_pallas_core(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    stride: int,
    radius: int,
    block_rows: int,
    interpret: bool,
    version: int,
    prepadded: bool = False,
) -> jnp.ndarray:
    """Kernel launch for one (possibly x-tiled) batch of images.

    With prepadded=True, x already carries the pad_lo margin on both spatial
    axes and at least the (need_h, need_w) extent the phase decomposition
    slices out — used by the x-tiling wrapper, whose tile windows overlap and
    therefore cannot be produced by the zero-pad below.
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
    # Pad the row dim to the widest sublane tile (bf16: 16) so the in-kernel
    # (BR, Wp, C) -> (BR*Wp, C) collapse is a pure layout no-op for Mosaic.
    wp = -(-wo // 16) * 16

    # ---- rel coordinates (XLA elementwise) --------------------------------
    tap = np.stack(
        np.meshgrid(np.arange(3) - 1, np.arange(3) - 1, indexing="ij"), -1
    ).reshape(k, 2)
    off = offset.reshape(b, ho, wo, k, 2).astype(jnp.float32)
    off = jnp.clip(off, -float(radius), float(radius))
    rel = off + jnp.asarray(tap, jnp.float32)  # (B,Ho,Wo,9,2)
    # edge-pad so padded rows/cols never widen the per-block shift bounds
    # (their garbage output is cropped below).
    rel = jnp.pad(
        rel,
        ((0, 0), (0, ho_pad - ho), (0, wp - wo), (0, 0), (0, 0)),
        mode="edge",
    )
    rely = rel[..., 0]  # (B, Hop, Wp, 9)
    relx = rel[..., 1]

    # per-(block, tap) inclusive integer shift bounds: hat(rel - d) != 0 only
    # for d in {floor(rel)} ∪ {floor(rel)+1 if rel is fractional}. The
    # integer-rel case matters: offsets clipped at ±radius land exactly on
    # integers, so at saturation (large offsets, e.g. random-init params)
    # the tight form trims one dead shift per axis — ~25% of the loop.
    relb = rel.reshape(b, nblk, br * wp, k, 2)
    flo = jnp.floor(relb)
    lo = jnp.min(flo, axis=2).astype(jnp.int32) - d_lo
    hi = (
        jnp.max(flo + (relb != flo), axis=2).astype(jnp.int32) - d_lo
    )
    lo = jnp.clip(lo, 0, dsz - 1)
    hi = jnp.clip(hi, 0, dsz - 1)
    bounds = jnp.stack(
        [lo[..., 0], hi[..., 0], lo[..., 1], hi[..., 1]], axis=-1
    )  # (B, nblk, 9, 4)

    # relx and modulation share one operand (lane 0:9 relx, 9:18 mask); keeps
    # the kernel at two coefficient streams.
    maskp = jnp.pad(
        mask.astype(jnp.float32),
        ((0, 0), (0, ho_pad - ho), (0, wp - wo), (0, 0)),
    )
    relxm = jnp.concatenate([relx, maskp], axis=-1)  # (B,Hop,Wp,18)
    rely = rely.reshape(b, ho_pad * wp, k)
    relxm = relxm.reshape(b, ho_pad * wp, 2 * k)

    # ---- padded, phase-decomposed input -----------------------------------
    pad_lo = -d_lo
    hp2 = ho_pad + (dsz - 1) // s + 1
    # wp2 is the sublane dim of the HBM-resident phase array: the band DMA
    # slices it at tile granularity, so it must be a multiple of 8.
    wp2 = -(-(wp + (dsz - 1) // s + 1) // 8) * 8
    need_h = (hp2 - 1) * s + (s - 1) + 1
    need_w = (wp2 - 1) * s + (s - 1) + 1
    if prepadded:
        xp = x
    else:
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

    w_mat = weight.reshape(k, c, cout).astype(x.dtype)
    bias_arr = (
        bias.reshape(1, cout).astype(x.dtype)
        if bias is not None
        else jnp.zeros((1, cout), x.dtype)
    )

    if version in (2, 3, 5, 6):
        kernel = functools.partial(
            _kernel_v5 if version == 5 else _kernel_v2,
            br=br, wp=wp, c=c, dsz=dsz, d_lo=d_lo, stride=s,
            band_rows=band_rows, nblk=nblk,
        )
        # version 3: accumulate the <=(2r+2)^2 hat terms in the INPUT dtype —
        # halves the dominant VMEM accumulator traffic for bf16 activations
        # at a bounded precision cost (the 9-tap conv contraction itself
        # still runs on the MXU with f32 preferred output).
        acc_dtype = x.dtype if version == 3 else jnp.float32
        # version 6: f32 x-shifted band copies — one convert in the 8-copy
        # prologue instead of one (BR*Wp, C) convert per span pass.
        bsh_dtype = jnp.float32 if version == 6 else x.dtype
        scratch = [
            pltpu.VMEM((2, s, s, band_rows, wp2, c), x.dtype),
            pltpu.VMEM((dsz, s, band_rows, wp, c), bsh_dtype),
            pltpu.VMEM((1, br * wp, c), acc_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kernel = functools.partial(
            _kernel,
            br=br, wp=wp, c=c, dsz=dsz, d_lo=d_lo, stride=s,
            band_rows=band_rows,
        )
        scratch = [
            pltpu.VMEM((s, s, band_rows, wp2, c), x.dtype),
            pltpu.VMEM((1, br * wp, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ]

    out = pl.pallas_call(
        kernel,
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec(
                (1, 1, k, 4), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, br * wp, k), lambda bi, i: (bi, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, br * wp, 2 * k), lambda bi, i: (bi, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, br * wp, cout), lambda bi, i: (bi, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, ho_pad * wp, cout), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(bounds, rely, relxm, xp, w_mat, bias_arr)

    return out.reshape(b, ho_pad, wp, cout)[:, :ho, :wo]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _mdc_pallas_diff(statics, x, offset, mask, weight, bias):
    """Differentiable wrapper: Pallas forward, window-composite backward.

    pallas_call has no JVP rule, but training differentiates THROUGH the
    DyConv tower (the loss reaches GCP parameters via VLFuse -> DCN inputs),
    so the kernel needs a VJP. The window composite
    (ops/deform_conv.py::modulated_deform_conv_window) computes the
    identical clipped-offset math (bit-exact vs this kernel, tested), so its
    XLA-derived VJP is the exact gradient of this forward."""
    return _mdc_dispatch(x, offset, mask, weight, bias, *statics)


def _mdc_fwd(statics, x, offset, mask, weight, bias):
    out = _mdc_pallas_diff(statics, x, offset, mask, weight, bias)
    return out, (x, offset, mask, weight, bias)


def _mdc_bwd(statics, res, g):
    from mqdet_tpu.ops.deform_conv import modulated_deform_conv_window

    stride, radius = statics[0], statics[1]
    x, offset, mask, weight, bias = res
    _, vjp = jax.vjp(
        lambda xx, oo, mm, ww, bb: modulated_deform_conv_window(
            xx, oo, mm, ww, bb, stride=stride, radius=radius
        ),
        x, offset, mask, weight, bias,
    )
    return vjp(g)


_mdc_pallas_diff.defvjp(_mdc_fwd, _mdc_bwd)


def modulated_deform_conv_pallas(
    x, offset, mask, weight, bias=None, stride=1, radius=2, block_rows=8,
    interpret=False, version=2, x_tiles=0,
):
    """Unjitted entry: reports analytic flops EVERY trace (the jitted inner
    fn's Python body only runs on pjit-cache misses, which would make the
    kernel invisible to benchmark flop accounting), then dispatches."""
    # per output position: K=9 taps of [4-corner bilinear lerp (~7 mul-add
    # = 14 flops/channel) + modulation (1)] + the (K*C, Cout) matmul
    from mqdet_tpu.utils import flop_count

    b, ho, wo = offset.shape[0], offset.shape[1], offset.shape[2]
    c, cout = x.shape[-1], weight.shape[-1]
    flop_count.add(
        "dcn_pallas", b * ho * wo * 9 * c * (2.0 * cout + 15.0)
    )
    return _modulated_deform_conv_pallas_jit(
        x, offset, mask, weight, bias, stride=stride, radius=radius,
        block_rows=block_rows, interpret=interpret, version=version,
        x_tiles=x_tiles,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "stride", "radius", "block_rows", "interpret", "version", "x_tiles",
    ),
)
def _modulated_deform_conv_pallas_jit(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    radius: int = 2,
    block_rows: int = 8,
    interpret: bool = False,
    version: int = 2,
    x_tiles: int = 0,
) -> jnp.ndarray:
    """Drop-in equivalent of modulated_deform_conv_window (3x3, pad 1).

    x: (B, H, W, C); offset: (B, Ho, Wo, 18); mask: (B, Ho, Wo, 9);
    weight: (3, 3, C, Cout). Returns (B, Ho, Wo, Cout).

    x_tiles splits the output W axis into that many tiles processed as extra
    batch entries (0 = auto, currently always 1). Motivation: the kernel's
    per-(block, tap) integer-shift bounds are unions over an 8-row x
    FULL-WIDTH block, and the VPU accumulation cost scales with the bounded
    span (measured: 2.46 ms at uniform 2x2 spans vs 5.93 ms at wide spans,
    level-0 LVIS shape); narrower tiles tighten each block's bounds. Tiles
    carry halo input windows so results are exact (bit-identical, tested).
    MEASURED NEGATIVE on v5e (see PERF.md): per-step fixed costs (band_sh
    construction, DMA setup, pad waste 96-vs-176 lanes) grow faster than the
    span tightening saves — smooth offsets: 5.28 ms untiled vs 6.58/6.73 ms
    at 2/3 tiles; random offsets: 5.48 vs 7.57/8.67 ms. Kept for sweeps.

    Differentiable: backward runs through the window composite's VJP (exact,
    see _mdc_pallas_diff), so this is safe inside the training step.
    """
    if bias is None:
        bias = jnp.zeros((weight.shape[-1],), x.dtype)
    return _mdc_pallas_diff(
        (stride, radius, block_rows, interpret, version, x_tiles),
        x, offset, mask, weight, bias,
    )


def _mdc_dispatch(
    x, offset, mask, weight, bias,
    stride, radius, block_rows, interpret, version, x_tiles,
):
    """Raw forward: auto-tiling choice + (tiled) kernel launch."""
    ho, wo = offset.shape[1], offset.shape[2]
    if x_tiles == 0:
        x_tiles = 1
    if x_tiles <= 1:
        return _mdc_pallas_core(
            x, offset, mask, weight, bias,
            stride, radius, block_rows, interpret, version,
        )

    b, h, w, c = x.shape
    cout = weight.shape[-1]
    t = x_tiles
    s = stride
    d_lo = -radius - 1
    dsz = (radius + 2) - d_lo + 1
    pad_lo = -d_lo
    wo_t = -(-wo // t)
    # Mirror the core's tile-width geometry to size the halo windows.
    br = min(block_rows, ho)
    ho_pad = -(-ho // br) * br
    hp2 = ho_pad + (dsz - 1) // s + 1
    wp_t = -(-wo_t // 16) * 16
    wp2_t = -(-(wp_t + (dsz - 1) // s + 1) // 8) * 8
    need_h = hp2 * s
    need_w = wp2_t * s

    bot = max(0, need_h - h - pad_lo)
    right = max(0, (t - 1) * wo_t * s + need_w - pad_lo - w)
    xpad = jnp.pad(x, ((0, 0), (pad_lo, bot), (pad_lo, right), (0, 0)))
    xt = jnp.stack(
        [
            xpad[:, :need_h, tt * wo_t * s : tt * wo_t * s + need_w]
            for tt in range(t)
        ],
        axis=1,
    ).reshape(b * t, need_h, need_w, c)

    # Per-tile offset/mask; edge-pad offsets so padded columns never widen
    # the per-block shift bounds (their output is cropped below).
    nch_o = offset.shape[-1]
    off_p = jnp.pad(
        offset, ((0, 0), (0, 0), (0, t * wo_t - wo), (0, 0)), mode="edge"
    )
    msk_p = jnp.pad(mask, ((0, 0), (0, 0), (0, t * wo_t - wo), (0, 0)))
    off_t = (
        off_p.reshape(b, ho, t, wo_t, nch_o)
        .transpose(0, 2, 1, 3, 4)
        .reshape(b * t, ho, wo_t, nch_o)
    )
    msk_t = (
        msk_p.reshape(b, ho, t, wo_t, 9)
        .transpose(0, 2, 1, 3, 4)
        .reshape(b * t, ho, wo_t, 9)
    )

    out = _mdc_pallas_core(
        xt, off_t, msk_t, weight, bias,
        stride, radius, block_rows, interpret, version,
        prepadded=True,
    )
    out = (
        out.reshape(b, t, ho, wo_t, cout)
        .transpose(0, 2, 1, 3, 4)
        .reshape(b, ho, t * wo_t, cout)[:, :, :wo]
    )
    return out
