"""Pallas TPU kernel: fused bidirectional cross-attention (X-MHA).

The GLIP deep-fusion stage (BiMultiHeadAttention, reference
maskrcnn_benchmark/utils/fuse_helper.py:171-427) computes, per head,

    s      = q_v . k_l^T                  (N vision tokens x T text tokens)
    out_v  = softmax_T(s + bias_l) @ vl   (vision attends to text)
    out_l  = softmax_N(s^T) @ vv          (text attends to vision)

At LVIS eval shapes (N ~= 22400, T = 256, 8 heads of 256, chunk batch 4)
the XLA composite materializes two ~0.4 GB score tensors per stage and runs
six stages per forward — the hottest block of the whole protocol after the
deformable convs. This kernel runs both directions in one pass over N:

  * grid (B, N/block_n); q/vv stream in block_n-row tiles, k/vl/bias stay
    VMEM-resident for a whole batch row (they are tiny: T x E);
  * the v-side softmax is complete within a tile (T is the minor axis);
  * the l-side softmax runs as an online (flash) reduction over the N axis:
    running max / rescaled accumulator / denominator live in VMEM scratch
    across grid steps, and out_l is emitted on the last N tile.

Scores never touch HBM: traffic is one read of q/vv, one write of out_v
(+ T-sized side inputs), ~5x less than the composite. ONE score matmul per
tile serves both directions (the l side reduces the shared (BN, T) tensor
over the sublane axis); it accumulates f32 on the MXU, and probabilities
are cast to bf16 before the value matmuls, matching the composite's
numerics (models/fusion.py).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(
    q_ref,      # (1, BN, E)  pre-scaled v-side queries
    k_ref,      # (1, T, E)
    vv_ref,     # (1, BN, E)
    vl_ref,     # (1, T, E)
    bias_ref,   # (1, 1, T) f32  additive bias for the v-side softmax
    outv_ref,   # (1, BN, E)
    outl_ref,   # (1, T, E)
    acc,        # scratch VMEM (H, T, D) f32    l-side accumulator
    den,        # scratch VMEM (H, T) f32       l-side denominator
    mrun,       # scratch VMEM (H, T) f32       l-side running max
    *,
    heads: int,
    d: int,
    block_n: int,
    n_valid: int,
    dual_scores: bool = False,
):
    n_i = pl.program_id(1)
    n_last = pl.num_programs(1) - 1

    @pl.when(n_i == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        den[...] = jnp.zeros_like(den)
        mrun[...] = jnp.full_like(mrun, NEG)

    # validity of this tile's N rows (zero-padded tail)
    row0 = n_i * block_n
    row_ids = row0 + jax.lax.broadcasted_iota(jnp.int32, (block_n, 1), 0)
    row_ok = row_ids < n_valid  # (BN, 1)

    bias = bias_ref[0]  # (1, T) f32

    for h in range(heads):
        sl_h = slice(h * d, (h + 1) * d)
        qh = q_ref[0, :, sl_h]    # (BN, D)
        kh = k_ref[0, :, sl_h]    # (T, D)
        vvh = vv_ref[0, :, sl_h]  # (BN, D)
        vlh = vl_ref[0, :, sl_h]  # (T, D)

        # One score matmul serves BOTH softmax directions: the l side
        # reduces the same (BN, T) tensor across the sublane axis instead
        # of recomputing s^T with a second MXU pass (25% of kernel flops).
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BN, T)

        # ---- v side: rows complete within the tile --------------------
        sb = s + bias
        mv = jnp.max(sb, axis=-1, keepdims=True)
        p = jnp.exp(sb - mv)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outv_ref[0, :, sl_h] = jax.lax.dot_general(
            p.astype(vlh.dtype), vlh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(outv_ref.dtype)

        # ---- l side: online softmax over the N axis --------------------
        # dual_scores=False: reduce the shared (BN, T) tensor over the
        # sublane axis (saves 25% of kernel flops); True: recompute s^T
        # with a second MXU matmul and reduce over the lane axis (the
        # round-3 formulation; kept for A/B on-chip).
        m_old = mrun[h]                       # (T,)
        if dual_scores:
            s_l = jax.lax.dot_general(
                kh, qh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (T, BN)
            s_l = jnp.where(row_ok.reshape(1, block_n), s_l, NEG)
            m_new = jnp.maximum(m_old, jnp.max(s_l, axis=-1))
            alpha = jnp.exp(m_old - m_new)    # (T,)
            e = jnp.exp(s_l - m_new[:, None])
            e = jnp.where(row_ok.reshape(1, block_n), e, 0.0)
            acc[h] = acc[h] * alpha[:, None] + jax.lax.dot_general(
                e.astype(vvh.dtype), vvh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            den[h] = den[h] * alpha + jnp.sum(e, axis=-1)
        else:
            s_m = jnp.where(row_ok, s, NEG)   # (BN, T)
            m_new = jnp.maximum(m_old, jnp.max(s_m, axis=0))
            alpha = jnp.exp(m_old - m_new)    # (T,)
            e = jnp.exp(s_m - m_new[None, :])
            e = jnp.where(row_ok, e, 0.0)
            acc[h] = acc[h] * alpha[:, None] + jax.lax.dot_general(
                e.astype(vvh.dtype), vvh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (T, D)
            den[h] = den[h] * alpha + jnp.sum(e, axis=0)
        mrun[h] = m_new

        @pl.when(n_i == n_last)
        def _():
            outl_ref[0, :, sl_h] = (
                acc[h] / den[h][:, None]
            ).astype(outl_ref.dtype)


def _kernel_carry(
    q_ref,        # (1, BN, E)  pre-scaled v-side queries
    k_ref,        # (1, T, E)
    vv_ref,       # (1, BN, E)
    vl_ref,       # (1, T, E)
    bias_ref,     # (1, 1, T) f32
    acc_in_ref,   # (1, H, T, D) f32   carried l-side state from prior calls
    den_in_ref,   # (1, H, T) f32
    m_in_ref,     # (1, H, T) f32
    outv_ref,     # (1, BN, E)
    acc_ref,      # (1, H, T, D) f32   updated state (block constant over ni)
    den_ref,      # (1, H, T) f32
    m_ref,        # (1, H, T) f32
    *,
    heads: int,
    d: int,
    block_n: int,
    n_valid: int,
):
    """Same math as _kernel, but the l-side online-softmax state is carried
    through tensor inputs/outputs instead of scratch, so one logical
    attention can be split across several pallas_calls — one per FPN level.
    This lets VLFuse skip the per-stage flatten/unflatten of the pyramid
    (a measured ~55 ms/protocol of pure `concatenate` HBM traffic,
    PERF.md round-3 trace). The final out_l normalization (acc / den)
    happens outside, in XLA, on the tiny (B, H, T, D) state."""
    n_i = pl.program_id(1)

    @pl.when(n_i == 0)
    def _():
        acc_ref[...] = acc_in_ref[...]
        den_ref[...] = den_in_ref[...]
        m_ref[...] = m_in_ref[...]

    row0 = n_i * block_n
    row_ids = row0 + jax.lax.broadcasted_iota(jnp.int32, (block_n, 1), 0)
    row_ok = row_ids < n_valid  # (BN, 1)

    bias = bias_ref[0]  # (1, T) f32

    for h in range(heads):
        sl_h = slice(h * d, (h + 1) * d)
        qh = q_ref[0, :, sl_h]
        kh = k_ref[0, :, sl_h]
        vvh = vv_ref[0, :, sl_h]
        vlh = vl_ref[0, :, sl_h]

        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BN, T)

        sb = s + bias
        mv = jnp.max(sb, axis=-1, keepdims=True)
        p = jnp.exp(sb - mv)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outv_ref[0, :, sl_h] = jax.lax.dot_general(
            p.astype(vlh.dtype), vlh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(outv_ref.dtype)

        s_m = jnp.where(row_ok, s, NEG)
        m_old = m_ref[0, h]
        m_new = jnp.maximum(m_old, jnp.max(s_m, axis=0))
        alpha = jnp.exp(m_old - m_new)
        e = jnp.exp(s_m - m_new[None, :])
        e = jnp.where(row_ok, e, 0.0)
        acc_ref[0, h] = acc_ref[0, h] * alpha[:, None] + jax.lax.dot_general(
            e.astype(vvh.dtype), vvh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        den_ref[0, h] = den_ref[0, h] * alpha + jnp.sum(e, axis=0)
        m_ref[0, h] = m_new


def _pick_block(n: int, target: int = 3584) -> Tuple[int, int]:
    """(block_n, n_pad): block <= ~target, multiple of 128, covering n."""
    if n <= target:
        blk = -(-n // 128) * 128
        return blk, blk
    nb = -(-n // target)
    blk = -(-n // (nb * 128)) * 128
    return blk, blk * nb


@functools.partial(
    jax.jit, static_argnames=("num_heads", "block_n", "interpret")
)
def _flash_bi_attention_carry_jit(
    q, k, vv, vl, bias_l, acc, den, mrun,
    num_heads: int, block_n: int, interpret: bool = False,
):
    b, n, e = q.shape
    t = k.shape[1]
    d = e // num_heads

    blk, n_pad = (block_n, -(-n // block_n) * block_n)
    if n_pad != n:
        q = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, 0)))
        vv = jnp.pad(vv, ((0, 0), (0, n_pad - n), (0, 0)))
    bias_l = bias_l.astype(jnp.float32).reshape(b, 1, t)

    kernel = functools.partial(
        _kernel_carry, heads=num_heads, d=d, block_n=blk, n_valid=n
    )
    state_specs = [
        pl.BlockSpec((1, num_heads, t, d), lambda bi, ni: (bi, 0, 0, 0)),
        pl.BlockSpec((1, num_heads, t), lambda bi, ni: (bi, 0, 0)),
        pl.BlockSpec((1, num_heads, t), lambda bi, ni: (bi, 0, 0)),
    ]
    out_v, acc, den, mrun = pl.pallas_call(
        kernel,
        grid=(b, n_pad // blk),
        in_specs=[
            pl.BlockSpec((1, blk, e), lambda bi, ni: (bi, ni, 0)),
            pl.BlockSpec((1, t, e), lambda bi, ni: (bi, 0, 0)),
            pl.BlockSpec((1, blk, e), lambda bi, ni: (bi, ni, 0)),
            pl.BlockSpec((1, t, e), lambda bi, ni: (bi, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda bi, ni: (bi, 0, 0)),
        ] + state_specs,
        out_specs=[
            pl.BlockSpec((1, blk, e), lambda bi, ni: (bi, ni, 0)),
        ] + state_specs,
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, e), q.dtype),
            jax.ShapeDtypeStruct((b, num_heads, t, d), jnp.float32),
            jax.ShapeDtypeStruct((b, num_heads, t), jnp.float32),
            jax.ShapeDtypeStruct((b, num_heads, t), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, k, vv, vl, bias_l, acc, den, mrun)
    return out_v[:, :n], acc, den, mrun


def flash_bi_attention_levels(
    qs, k, vvs, vl, bias_l, num_heads, interpret=False,
):
    """Streaming multi-level bidirectional attention.

    qs / vvs: lists of (B, N_l, E) per FPN level (pre-scaled queries /
    values). Equivalent to flash_bi_attention on the concatenation of the
    levels — without ever materializing it: each level is one carried-state
    pallas_call, and the l-side softmax statistics flow level to level.

    Returns (out_vs: list of (B, N_l, E), out_l: (B, T, E)).
    """
    from mqdet_tpu.utils import flop_count

    b, _, e = qs[0].shape
    t = k.shape[1]
    d = e // num_heads
    n_total = sum(q.shape[1] for q in qs)
    flop_count.add("flash_bi_attention", 6.0 * b * n_total * t * e)

    if bias_l is None:
        bias_l = jnp.zeros((b, t), jnp.float32)
    acc = jnp.zeros((b, num_heads, t, d), jnp.float32)
    den = jnp.zeros((b, num_heads, t), jnp.float32)
    mrun = jnp.full((b, num_heads, t), NEG, jnp.float32)

    out_vs = []
    for q, vv in zip(qs, vvs):
        blk, _ = _pick_block(q.shape[1])
        out_v, acc, den, mrun = _flash_bi_attention_carry_jit(
            q, k, vv, vl, bias_l, acc, den, mrun,
            num_heads=num_heads, block_n=blk, interpret=interpret,
        )
        out_vs.append(out_v)

    out_l = (acc / den[..., None]).astype(qs[0].dtype)  # (B, H, T, D)
    out_l = out_l.transpose(0, 2, 1, 3).reshape(b, t, e)
    return out_vs, out_l


def flash_bi_attention(
    q, k, vv, vl, bias_l, num_heads, block_n=3200, interpret=False,
    dual_scores=None,
):
    """Unjitted entry: reports analytic flops EVERY trace (the jitted inner
    fn's Python body only runs on pjit-cache misses), then dispatches.

    dual_scores=None reads MQDET_FLASH_SCORES (default single); an explicit
    bool overrides the env (used by the parity test to cover both
    formulations).

    Algorithmic flops: one (N, T) score matmul serving both softmax
    directions + two value matmuls, each 2*B*N*T*E; softmax is O(NT)."""
    import os

    from mqdet_tpu.utils import flop_count

    b, n, e = q.shape
    dual = (
        os.environ.get("MQDET_FLASH_SCORES", "single") == "dual"
        if dual_scores is None
        else dual_scores
    )
    flop_count.add(
        "flash_bi_attention",
        (8.0 if dual else 6.0) * b * n * k.shape[1] * e,
    )
    return _flash_bi_attention_jit(
        q, k, vv, vl, bias_l, num_heads=num_heads, block_n=block_n,
        dual_scores=dual, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "block_n", "dual_scores", "interpret"),
)
def _flash_bi_attention_jit(
    q: jnp.ndarray,        # (B, N, E) pre-scaled
    k: jnp.ndarray,        # (B, T, E)
    vv: jnp.ndarray,       # (B, N, E)
    vl: jnp.ndarray,       # (B, T, E)
    bias_l: Optional[jnp.ndarray],  # (B, T) f32 additive, or None
    num_heads: int,
    block_n: int = 3200,
    dual_scores: bool = False,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (out_v (B, N, E), out_l (B, T, E))."""
    b, n, e = q.shape
    t = k.shape[1]
    d = e // num_heads

    n_pad = -(-n // block_n) * block_n
    if n_pad != n:
        q = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, 0)))
        vv = jnp.pad(vv, ((0, 0), (0, n_pad - n), (0, 0)))
    if bias_l is None:
        bias_l = jnp.zeros((b, t), jnp.float32)
    bias_l = bias_l.astype(jnp.float32).reshape(b, 1, t)

    kernel = functools.partial(
        _kernel, heads=num_heads, d=d, block_n=block_n, n_valid=n,
        dual_scores=dual_scores,
    )
    out_v, out_l = pl.pallas_call(
        kernel,
        grid=(b, n_pad // block_n),
        in_specs=[
            pl.BlockSpec((1, block_n, e), lambda bi, ni: (bi, ni, 0)),
            pl.BlockSpec((1, t, e), lambda bi, ni: (bi, 0, 0)),
            pl.BlockSpec((1, block_n, e), lambda bi, ni: (bi, ni, 0)),
            pl.BlockSpec((1, t, e), lambda bi, ni: (bi, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda bi, ni: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_n, e), lambda bi, ni: (bi, ni, 0)),
            pl.BlockSpec((1, t, e), lambda bi, ni: (bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, e), q.dtype),
            jax.ShapeDtypeStruct((b, t, e), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((num_heads, t, d), jnp.float32),
            pltpu.VMEM((num_heads, t), jnp.float32),
            pltpu.VMEM((num_heads, t), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, k, vv, vl, bias_l)

    return out_v[:, :n], out_l
