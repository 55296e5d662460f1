"""Pallas TPU kernel: multi-scale deformable attention (encoder path).

The hot op of the GroundingDINO encoder (reference CUDA:
groundingdino_new/models/GroundingDINO/csrc_groundingdino/MsDeformAttn/
ms_deform_im2col_cuda.cuh; pure-torch semantics ms_deform_attn.py:93-134):
every pyramid pixel attends to nh*L*P = 128 bilinear samples spread over the
4-level pyramid. As an XLA composite that is ~11M scalar gathers per
encoder layer — the single worst op class on TPU.

TPU-first reformulation (no per-element gather):

1. **Base-aligned resample.** For query level lq sampling a coarser-or-equal
   level lv with EXACT integer ratio k = Hq/Hv, define (host-side, one cheap
   XLA gather) A[y, x] = V[b0(y), b0(x)] on the query grid, where
   b0(y) = floor((y+.5)/k - .5) is the offset-free base cell. Because
   b0(y + k*e) = b0(y) + e for integer e, EVERY bilinear neighbor
   V[b0(y)+ey, b0(x)+ex] is the uniform shift A[y + k*ey, x + k*ex]: the
   data-dependent gather becomes a STATIC window of dense shifted reads.

2. **Window-clipped sampling.** Per (query, head, level, point) the kernel
   needs rel = sampling_loc_in_lv_pixels - b0(query), clipped to the window
   [-R, R+1] (same clipped-offset contract as the DCNv2 kernel,
   ops/pallas/deform_conv_pallas.py; R per level via `radius_for_k`). For
   each window cell (ey, ex) the per-head weight is

       w[q, h] = sum_p attn[q,h,p] * hat(rel_y - ey) * hat(rel_x - ex)

   computed on the VPU over (N, nh*P) lanes, folded to per-channel scale via
   one tiny (nh*P, C) 0/1 matmul (sums over P AND broadcasts head->channels
   in one MXU op), then FMA'd with the shifted band slice:

       out[q, :] += w_c[q, :] * A_band[y_q + k*ey, x_q + k*ex, :]

3. **Banded streaming.** Per query-row block the kernel DMAs only the band
   of A rows the window can touch (per level, reusing one VMEM scratch
   sequentially), so HBM traffic is ~one read of each level per call.

Pairs where lv is FINER than lq (8% of encoder samples) and the decoder
path (queries are not pixels) stay on the gather composite
(ops/ms_deform_attn.py); `ms_deform_attn_encoder` sums both parts.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mqdet_tpu.ops.ms_deform_attn import _bilinear_sample_nhwc

# Window radius (in lv pixels) by query/value resolution ratio. R=4 covers
# the reference grid_init offset pattern exactly (ms_deform_attn.py ~200:
# per-point magnitude up to num_points=4 level-pixels), so at init the
# kernel is bit-equivalent to the composite. Ratios ABSENT from this table
# (k >= 4, i.e. the two coarsest levels) route to the gather composite:
# their value tables are tiny (high gather locality) while a window wide
# enough to stay exact there would blow the VMEM band budget.
# clip radius (in VALUE-level pixels) per query/value downsample ratio k.
# k=1,2: r=4 comfortably covers GDINO's sampling_offsets init (unit-circle
# bias x point index <= P=4) and trained fields. k=4,8 (coarse levels from
# level-0/1 queries at an exact power-of-two pyramid): r=2 — the window in
# query pixels is k*(r+1) wide, so larger radii at k=8 would blow the band
# DMA footprint; offsets beyond the window clip (the documented contract,
# same as DCN; utils/calibrate.py applies to DCN only).
DEFAULT_RADIUS_FOR_K = {1: 4, 2: 4, 4: 2, 8: 2}


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _base_cells(n_query: int, k: int, n_value: int) -> np.ndarray:
    """b0(y) = floor((y+0.5)/k - 0.5) per query coordinate (may be -1)."""
    return np.floor((np.arange(n_query) + 0.5) / k - 0.5).astype(np.int32)


def _kernel(
    bounds_ref, # SMEM (1, 1, Lp, 4) i32 per level [y0, y1, x0, x1] —
                # y in loop-index space (i = d + r), x in d-space, inclusive
    rely_ref,   # (1, N, LANES) f32 rel_y per (lv-major, head, point) lane
    relx_ref,   # (1, N, LANES)
    attn_ref,   # (1, N, LANES) softmaxed weights (pallas-covered lanes only)
    gc_ref,     # (nhp, C) f32 0/1: sums over P, broadcasts head -> channels
    a_hbm,      # (Lp, B, Hpad, Wband, C) base-aligned maps, HBM
    out_ref,    # (1, N, C) f32
    band,       # scratch VMEM (band_rows_max, Wband, C)
    sem,        # DMA semaphore
    *,
    br: int,
    wp2: int,
    c: int,
    nhp: int,
    ks: Tuple[int, ...],
    rs: Tuple[int, ...],
    pad_xg: int,
    pad_yg: int,
    slopes: Tuple[float, ...] = (),
):
    b = pl.program_id(0)
    blk = pl.program_id(1)
    n = br * wp2
    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
    slopes = slopes or (1.0,) * len(ks)

    for li, (k, r, slope) in enumerate(zip(ks, rs, slopes)):
        rows_lv = br + 2 * k * (r + 1)
        # band row 0 = global query row blk*br - k*(r+1); A carries pad_yg
        # top zero-rows so the source index stays >= 0
        src_r0 = pad_yg + blk * br - k * (r + 1)
        dma = pltpu.make_async_copy(
            a_hbm.at[li, b, pl.ds(src_r0, rows_lv)],
            band.at[pl.ds(0, rows_lv)],
            sem,
        )
        dma.start()

        ry = rely_ref[0, :, li * nhp : (li + 1) * nhp]   # (N, nhp)
        rx = relx_ref[0, :, li * nhp : (li + 1) * nhp]
        at = attn_ref[0, :, li * nhp : (li + 1) * nhp]
        y0 = bounds_ref[0, 0, li, 0]
        y1 = bounds_ref[0, 0, li, 1]
        x0 = bounds_ref[0, 0, li, 2]
        x1 = bounds_ref[0, 0, li, 3]
        dma.wait()

        # Loop structure is dictated by Mosaic's slicing rules on the 3-D
        # band (rows, wband, c): dim 0 (rows) is untiled, so a DYNAMIC
        # offset is fine there — the y window is a fori_loop over the
        # per-(block, level) host-computed bounds (same design as the DCN
        # kernel: the static worst-case window is 10x10 at r=4 while real
        # sampling fields typically span 2-4 cells, and each cell here
        # pays an (N, nhp) x (nhp, C) MXU matmul). dim 1 (wband) is the
        # sublane dim, where a dynamic offset must be provably 8-aligned
        # (coff varies by +-k, so it is not) but an arbitrary STATIC
        # offset lowers fine (sublane rotate) — the x window is therefore
        # statically unrolled with a pl.when guard per cell.
        # slope > 1 marks a PHASE PLANE of a finer value level (f = slope):
        # the hat in value units is max(0, 1 - f*|rel_plane - d|) — see
        # the finer-pair notes in ms_deform_attn_encoder.
        def yrow(i, _, k=k, r=r, ry=ry, rx=rx, at=at, slope=slope,
                 x0=x0, x1=x1):
            hy = jnp.maximum(
                0.0,
                1.0 - slope * jnp.abs(ry - (i.astype(jnp.float32) - r)),
            )
            roff = k * i + k  # k*(r+1) + k*(i - r)
            for ex in range(-r, r + 2):

                @pl.when((x0 <= ex) & (ex <= x1))
                def _(ex=ex):
                    hx = jnp.maximum(
                        0.0, 1.0 - slope * jnp.abs(rx - float(ex))
                    )
                    w = at * hy * hx                      # (N, nhp)
                    wc = jax.lax.dot_general(
                        w, gc_ref[...],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )                                     # (N, C)
                    coff = pad_xg + k * ex
                    v = band[pl.ds(roff, br), coff : coff + wp2, :]
                    out_ref[0] += wc * v.reshape(n, c)

            return 0

        jax.lax.fori_loop(y0, y1 + 1, yrow, 0)


def _prep_level_group(
    value_levels: List[jnp.ndarray],     # per lv >= lq: (B, Hv, Wv, C)
    ks: Tuple[int, ...],
    rs: Tuple[int, ...],
    hq: int,
    wq: int,
    br: int,
    pad_xg: int,
    pad_yg: int,
):
    """Stack base-aligned, zero-padded A maps: (Lp, B, Hpad, Wband, C)."""
    b, _, _, c = value_levels[0].shape
    n_blocks = -(-hq // br)
    hpad = 2 * pad_yg + n_blocks * br
    # col slices reach pad_xg + k*(r+1) + wp2 <= 2*pad_xg + round_up(wq, 8)
    wband = _round_up(_round_up(wq, 8) + 2 * pad_xg, 8)
    maps = []
    for v, k in zip(value_levels, ks):
        hv, wv = v.shape[1], v.shape[2]
        # A is built over the EXTENDED query coordinates [-pad, hq+pad): for
        # up to k-1 rows beyond the query grid b0(y) is still a valid value
        # row, so zero-padding there would drop real contributions
        ys = np.arange(-pad_yg, hpad - pad_yg)
        xs = np.arange(-pad_xg, wband - pad_xg)
        by = np.floor((ys + 0.5) / k - 0.5).astype(np.int32)
        bx = np.floor((xs + 0.5) / k - 0.5).astype(np.int32)
        vy = (by >= 0) & (by < hv)
        vx = (bx >= 0) & (bx < wv)
        a = v[:, np.clip(by, 0, hv - 1)][:, :, np.clip(bx, 0, wv - 1)]
        a = jnp.where(
            (vy[:, None] & vx[None, :])[None, :, :, None], a, 0.0
        )
        # f32 regardless of the value dtype: the kernel slices the band as
        # band[ds(roff, br), coff:coff+wp2, :] — dynamic sublane start,
        # STATIC second-minor start (coff = pad_xg + k*ex, stepping by k
        # across the unrolled window) — and DMAs this map into an f32
        # scratch; a bf16 source into an f32 scratch is a Mosaic dtype
        # mismatch, so bf16 eval upcasts here, outside the kernel.
        maps.append(a.astype(jnp.float32))
    return jnp.stack(maps), hpad, wband, n_blocks


def _rel_coords(
    loc: jnp.ndarray,      # (B, n_query, ..., P): query axis at position 1
    n_value: int,          # Hv or Wv
    k: int,
    r: int,
    n_query: int,
) -> jnp.ndarray:
    """Clipped window-relative sampling coordinate per query."""
    s = loc * n_value - 0.5
    b0 = jnp.asarray(_base_cells(n_query, k, n_value), jnp.float32)
    shape = [1] * loc.ndim
    shape[1] = n_query
    rel = s - b0.reshape(shape)
    return jnp.clip(rel, -float(r), float(r) + 1.0)


# finer (lv < lq) pairs with value/query ratio f: clip radius in VALUE
# pixels and the per-phase-plane window radius (plane cells). f=2 and f=4
# are decomposed (4 / 16 phase planes, each nh*P lanes; with the dynamic
# span bounds the mostly-empty plane windows cost almost nothing). f=8
# (64 planes) stays on gather — only the 13x22-query level samples it.
# Window exactness at these radii: the slope-f hat's support is 1/f plane
# cells, so every cell outside [-r_eff, r_eff+1] has hat == 0 for every
# reachable clipped rel (checked for both f at RV=3).
FINER_RV = 3
FINER_REFF = 2          # f=2
FINER_REFF_BY_F = {2: 2, 4: 1}


def _rel_coords_finer(
    loc: jnp.ndarray,      # query axis at position 1
    n_value: int,          # Hv or Wv (= f * n_query)
    f: int,
    phase: int,            # plane offset in value cells (0..f-1)
    n_query: int,
) -> jnp.ndarray:
    """Plane-relative sampling coordinate for a phase plane of a FINER
    value level. Plane cell j holds value cell f*j + phase; for query
    coordinate y the natural sampling center is f*(y+0.5) - 0.5, and the
    value coordinate is clipped to +-FINER_RV around it. rel_plane is
    measured from plane cell y, and the kernel evaluates the hat with
    slope f so that 1 - f*|rel_plane - d| == 1 - |s - (f*(y+d)+phase)|
    exactly (the value-unit bilinear hat)."""
    s = loc * n_value - 0.5
    idx = np.arange(n_query, dtype=np.float32)
    center = f * (idx + 0.5) - 0.5
    shape = [1] * loc.ndim
    shape[1] = n_query
    center = jnp.asarray(center).reshape(shape)
    s = jnp.clip(s, center - FINER_RV, center + FINER_RV + 1.0)
    return (s - phase) / f - jnp.asarray(idx).reshape(shape)


def ms_deform_attn_encoder(
    value: jnp.ndarray,                  # (B, S, nh, hd)
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,     # (B, S, nh, L, P, 2) queries=pixels
    attention_weights: jnp.ndarray,      # (B, S, nh, L, P)
    radius_for_k: Dict[int, int] | None = None,
    pallas_query_levels: Sequence[int] = (0, 1, 2, 3),
    interpret: bool = False,
) -> jnp.ndarray:
    """Encoder MSDA: pallas window kernel for (lq, lv) pairs with exact
    power-of-two ratios — coarser/equal levels directly, 2x-FINER levels
    via 4 phase planes with slope-2 hats — and the gather composite for
    the rest (>=4x-finer pairs, non-exact ratios, levels outside
    pallas_query_levels). Returns (B, S, nh*hd), numerically the
    composite's result with sampling locations clipped to the per-level
    window (coarse: +-radius_for_k cells; finer: +-FINER_RV value px)."""
    radius_for_k = radius_for_k or DEFAULT_RADIUS_FOR_K
    b, s, nh, hd = value.shape
    num_levels = len(spatial_shapes)
    p = sampling_locations.shape[4]
    c = nh * hd
    nhp = nh * p

    starts = np.concatenate(
        [[0], np.cumsum([h * w for h, w in spatial_shapes])]
    )
    assert starts[-1] == s, "encoder path requires queries == pixels"

    # exact-ratio check per (lq, lv>=lq); non-exact pairs -> gather
    def ratio(hq_, wq_, hv_, wv_):
        if hv_ == 0 or hq_ % hv_ or wq_ % wv_:
            return None
        k = hq_ // hv_
        if wq_ // wv_ != k or k not in radius_for_k:
            return None
        return k

    value_maps = [
        value[:, starts[i] : starts[i + 1]].reshape(
            b, spatial_shapes[i][0], spatial_shapes[i][1], c
        )
        for i in range(num_levels)
    ]

    out_parts = []
    gather_mask = np.ones((num_levels, num_levels), bool)  # [lq, lv]

    for lq in range(num_levels):
        if lq not in pallas_query_levels:
            continue
        hq, wq = spatial_shapes[lq]
        q0, q1 = starts[lq], starts[lq + 1]
        loc_q = sampling_locations[:, q0:q1].reshape(b, hq, wq, nh, num_levels, p, 2)
        attn_q = attention_weights[:, q0:q1].reshape(b, hq, wq, nh, num_levels, p)

        # Entry list: coarse (lv >= lq, exact ratio) levels ride the band
        # kernel directly; FINER levels with f = hv/hq == 2 decompose into
        # f^2 phase planes — each plane is exactly query resolution, so it
        # enters the same machinery as a k=1 level whose hat has slope f
        # (see _rel_coords_finer). f >= 4 pairs stay on gather (16 planes
        # would cost 16*nh*P lanes).
        vmaps, ks, rs, slopes = [], [], [], []
        rel_ys, rel_xs, attns = [], [], []
        n_pairs = 0
        for lv in range(num_levels):
            hv, wv = spatial_shapes[lv]
            if lv >= lq:
                k = ratio(hq, wq, hv, wv)
                if k is None:
                    continue
                r = radius_for_k[k]
                vmaps.append(value_maps[lv])
                ks.append(k)
                rs.append(r)
                slopes.append(1.0)
                rel_ys.append(_rel_coords(loc_q[..., lv, :, 1], hv, k, r, hq))
                rel_xs.append(
                    _rel_coords(
                        loc_q[..., lv, :, 0].transpose(0, 2, 1, 3, 4), wv,
                        k, r, wq
                    ).transpose(0, 2, 1, 3, 4)
                )
                attns.append(attn_q[..., lv, :])
            else:
                if (
                    hv % hq or wv % wq or hv // hq != wv // wq
                    or hv // hq not in FINER_REFF_BY_F
                ):
                    continue
                f = hv // hq
                r_eff = FINER_REFF_BY_F[f]
                v_l = value_maps[lv]
                ry_f = [
                    _rel_coords_finer(loc_q[..., lv, :, 1], hv, f, py, hq)
                    for py in range(f)
                ]
                rx_f = [
                    _rel_coords_finer(
                        loc_q[..., lv, :, 0].transpose(0, 2, 1, 3, 4), wv,
                        f, px, wq
                    ).transpose(0, 2, 1, 3, 4)
                    for px in range(f)
                ]
                for py in range(f):
                    for px in range(f):
                        vmaps.append(v_l[:, py::f, px::f])
                        ks.append(1)
                        rs.append(r_eff)
                        slopes.append(float(f))
                        rel_ys.append(ry_f[py])
                        rel_xs.append(rx_f[px])
                        attns.append(attn_q[..., lv, :])
            gather_mask[lq, lv] = False
            n_pairs += 1
        if not vmaps:
            continue
        lp = len(vmaps)
        lanes = lp * nhp
        pad_g = max(k_ * (r_ + 1) for k_, r_ in zip(ks, rs))
        br = max(8, _round_up(1024 // max(wq, 1), 8))
        wp2 = _round_up(wq, 8)
        a_maps, hpad, wband, n_blocks = _prep_level_group(
            vmaps, tuple(ks), tuple(rs), hq, wq, br, pad_g, pad_g,
        )

        def pack(parts):
            x = jnp.stack(parts, axis=3)              # (B,Hq,Wq,Lp,nh,P)
            x = x.reshape(b, hq, wq, lanes)
            x = jnp.pad(
                x,
                ((0, 0), (0, n_blocks * br - hq), (0, wp2 - wq), (0, 0)),
            )
            return x.reshape(b, n_blocks * br * wp2, lanes)

        rel_y_p, rel_x_p, attn_p = map(pack, (rel_ys, rel_xs, attns))

        # per-(block, level) inclusive shift bounds (the DCN kernel's trick,
        # deform_conv_pallas.py:463-478): hat(rel - d) != 0 only for
        # d in {floor(rel)} ∪ {floor(rel)+1 if fractional} — a SUPERSET for
        # slope-f plane hats, whose support is narrower. Blocks whose
        # sampling fields span 2-4 cells then skip most of the static
        # worst-case window (10x10 at r=4).
        def entry_bounds(rel, r_):
            e = jnp.pad(
                rel, ((0, 0), (0, n_blocks * br - hq), (0, 0), (0, 0),
                      (0, 0)),
                mode="edge",
            ).reshape(b, n_blocks, br, wq, nh, p)
            flo = jnp.floor(e)
            lo = jnp.min(flo, axis=(2, 3, 4, 5)).astype(jnp.int32)
            hi = jnp.max(flo + (e != flo), axis=(2, 3, 4, 5)).astype(
                jnp.int32
            )
            return jnp.clip(lo, -r_, r_ + 1), jnp.clip(hi, -r_, r_ + 1)

        bnd_cols = []
        for rel_y, rel_x, r_ in zip(rel_ys, rel_xs, rs):
            ylo, yhi = entry_bounds(rel_y, r_)
            xlo, xhi = entry_bounds(rel_x, r_)
            # y bounds move to loop-index space (i = d + r)
            bnd_cols.append(
                jnp.stack([ylo + r_, yhi + r_, xlo, xhi], axis=-1)
            )
        bounds = jnp.stack(bnd_cols, axis=2)  # (B, n_blocks, Lp, 4)

        gc = np.zeros((nhp, c), np.float32)
        for j in range(nhp):
            gc[j, (j // p) * hd : (j // p + 1) * hd] = 1.0
        band_rows_max = br + 2 * max(
            k_ * (r_ + 1) for k_, r_ in zip(ks, rs)
        )

        n_blk = br * wp2
        # analytic flops (invisible to XLA cost analysis) for this level
        # group: per query x head x level x point, 4-corner bilinear lerp
        # (~8 flops/channel) + attention-weighted accumulation (2)
        from mqdet_tpu.utils import flop_count

        flop_count.add(
            "msda_pallas", b * hq * wq * nh * n_pairs * p * hd * 10.0
        )
        kernel = functools.partial(
            _kernel, br=br, wp2=wp2, c=c, nhp=nhp, ks=tuple(ks),
            rs=tuple(rs), pad_xg=pad_g, pad_yg=pad_g,
            slopes=tuple(slopes),
        )
        out = pl.pallas_call(
            kernel,
            grid=(b, n_blocks),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, lp, 4), lambda bi, i: (bi, i, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, n_blk, lanes), lambda bi, i: (bi, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, n_blk, lanes), lambda bi, i: (bi, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, n_blk, lanes), lambda bi, i: (bi, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (nhp, c), lambda bi, i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, n_blk, c), lambda bi, i: (bi, i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b, n_blocks * n_blk, c), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((band_rows_max, wband, c), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            # default Mosaic scoped-vmem budget is 16 MiB; at the GDINO
            # protocol's enc_layer shapes ((84,112) level-0, CP=4, f32)
            # the kernel's temporaries need 16.77 MiB and the compile
            # fails on-chip (found by the round-5 bench_models run).
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=interpret,
        )(bounds, rel_y_p, rel_x_p, attn_p, jnp.asarray(gc), a_maps)

        out = out.reshape(b, n_blocks * br, wp2, c)[:, :hq, :wq]
        out_parts.append((q0, q1, out.reshape(b, hq * wq, c)))

    # gather fallback for uncovered (lq, lv) pairs
    out_full = jnp.zeros((b, s, c), jnp.float32)
    for q0, q1, part in out_parts:
        out_full = out_full.at[:, q0:q1].add(part)

    for lv in range(num_levels):
        lqs = [
            lq for lq in range(num_levels) if gather_mask[lq, lv]
        ]
        if not lqs:
            continue
        h, w = spatial_shapes[lv]
        v_l = value_maps[lv].reshape(b, h, w, nh, hd)
        v_l = v_l.transpose(0, 3, 1, 2, 4).reshape(b * nh, h, w, hd)
        for lq in lqs:
            q0, q1 = starts[lq], starts[lq + 1]
            nq = q1 - q0
            loc = sampling_locations[:, q0:q1, :, lv]    # (B, nq, nh, P, 2)
            x = loc[..., 0] * w - 0.5
            y = loc[..., 1] * h - 0.5
            x = x.transpose(0, 2, 1, 3).reshape(b * nh, nq, p)
            y = y.transpose(0, 2, 1, 3).reshape(b * nh, nq, p)
            sampled = jax.vmap(_bilinear_sample_nhwc)(v_l, x, y)
            wgt = attention_weights[:, q0:q1, :, lv].transpose(
                0, 2, 1, 3
            ).reshape(b * nh, nq, p)
            acc = (sampled * wgt[..., None]).sum(axis=2)  # (B*nh, nq, hd)
            acc = acc.reshape(b, nh, nq, hd).transpose(0, 2, 1, 3)
            out_full = out_full.at[:, q0:q1].add(acc.reshape(b, nq, c))

    return out_full
