"""Class-aware (multi-label) NMS as a fixed-shape XLA program.

TPU-native replacement for the reference CUDA kernel `ml_nms`
(maskrcnn_benchmark/csrc/cuda/ml_nms.cu:15-149): IoU is only counted between
boxes of the same label (ml_nms.cu devIoU returns 0 if labels differ).

Design: instead of translating the 64-box bitmask CUDA algorithm, we use a
greedy select-and-suppress loop bounded by `max_outputs` iterations. Each
iteration is a fully-vectorized O(N) argmax + suppression update on the VPU,
so the sequential depth is max_outputs (e.g. 300), not N (e.g. 5000). This
matches exact greedy NMS semantics (identical keep set and order).

IoU here uses the legacy +1 convention to match ml_nms.cu:17-25.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mqdet_tpu.core import boxes as box_ops

NEG_INF = jnp.finfo(jnp.float32).min


@functools.partial(jax.jit, static_argnames=("max_outputs",))
def class_aware_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
):
    """Greedy multi-label NMS.

    Args:
      boxes:  (N, 4) xyxy
      scores: (N,)
      labels: (N,) int32; IoU suppression applies only within equal labels
      valid:  (N,) bool candidate mask
      iou_threshold: suppress IoU > threshold (strict >, matching ml_nms.cu)
      max_outputs: static cap on number of kept boxes

    Returns:
      keep_idx: (max_outputs,) int32 indices into the input (score-ordered)
      keep_valid: (max_outputs,) bool
    """
    n = boxes.shape[0]
    live = valid & (scores > NEG_INF / 2)

    def body(state):
        live, keep_idx, keep_valid, i = state
        masked = jnp.where(live, scores, NEG_INF)
        best = jnp.argmax(masked)
        best_ok = masked[best] > NEG_INF / 2
        keep_idx = keep_idx.at[i].set(jnp.where(best_ok, best, 0))
        keep_valid = keep_valid.at[i].set(best_ok)
        # suppress: same label and IoU over threshold (includes best itself)
        iou = box_ops.box_iou(boxes[best][None], boxes)[0]
        same = labels == labels[best]
        suppress = same & (iou > iou_threshold)
        suppress = suppress | (jnp.arange(n) == best)
        live = live & ~suppress & best_ok
        return live, keep_idx, keep_valid, i + 1

    def cond(state):
        live, _, _, i = state
        return (i < max_outputs) & jnp.any(live)

    keep_idx = jnp.zeros((max_outputs,), jnp.int32)
    keep_valid = jnp.zeros((max_outputs,), bool)
    live, keep_idx, keep_valid, _ = jax.lax.while_loop(
        cond, body, (live, keep_idx, keep_valid, jnp.int32(0))
    )
    return keep_idx, keep_valid


def nms(boxes, scores, valid, iou_threshold, max_outputs):
    """Plain single-class NMS (csrc/cuda/nms.cu semantics)."""
    labels = jnp.zeros(boxes.shape[:-1], jnp.int32)
    return class_aware_nms(boxes, scores, labels, valid, iou_threshold, max_outputs)


@functools.partial(jax.jit, static_argnames=("max_outputs", "row_block"))
def class_aware_nms_matrix(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
    row_block: int = 512,
):
    """Exact greedy multi-label NMS via iterative self-suppression.

    TPU-first reformulation of the sequential select-and-suppress loop: sort
    candidates by score, build the strict lower-triangular suppression
    relation M[i, j] = (j outscores i) & same label & IoU > t, then iterate

        keep <- valid & ~(M @ keep)

    to its fixpoint. The unique fixpoint of this antitone map under the
    sorted order IS the greedy NMS keep set (induction over score rank), and
    convergence takes O(suppression-chain depth) iterations — single digits
    for real detections — each a (N x N) @ (N,) matvec on the MXU instead of
    hundreds of dependent scalar steps. Returns the same (keep_idx,
    keep_valid) contract as `class_aware_nms`, score-ordered.

    The relation is processed in rank-ordered blocks of `row_block`: a
    block's IoU rows are built on the fly (never materializing the N x N
    matrix), suppression from already-final earlier blocks is one masked
    reduction, and only the small (row_block x row_block) within-block
    relation iterates to its fixpoint. Sequential depth is
    n/row_block blocks x O(chain depth) tiny matvecs, with O(row_block * N)
    peak memory.
    """
    n = boxes.shape[0]
    neg = NEG_INF
    masked_scores = jnp.where(valid, scores, neg)
    sorted_scores, order = jax.lax.top_k(masked_scores, n)  # descending
    b_s = boxes[order]
    l_s = labels[order]
    v_s = valid[order] & (sorted_scores > neg / 2)

    area = (b_s[:, 2] - b_s[:, 0] + 1.0) * (b_s[:, 3] - b_s[:, 1] + 1.0)

    blk = min(row_block, n)
    n_pad = -(-n // blk) * blk
    pad = n_pad - n
    # pad boxes far negative so their IoU with any real box is exactly 0
    b_p = jnp.pad(b_s, ((0, pad), (0, 0)), constant_values=-1e8)
    area_p = jnp.pad(area, (0, pad), constant_values=1.0)
    l_p = jnp.pad(l_s, (0, pad), constant_values=-1)
    v_p = jnp.pad(v_s, (0, pad))
    rank = jnp.arange(n_pad)

    def process_block(j, keep):
        start = j * blk
        rows = jax.lax.dynamic_slice_in_dim(b_p, start, blk, 0)
        r_area = jax.lax.dynamic_slice_in_dim(area_p, start, blk, 0)
        r_label = jax.lax.dynamic_slice_in_dim(l_p, start, blk, 0)
        r_valid = jax.lax.dynamic_slice_in_dim(v_p, start, blk, 0)
        r_rank = start + jnp.arange(blk)
        lt = jnp.maximum(rows[:, None, :2], b_p[None, :, :2])
        rb = jnp.minimum(rows[:, None, 2:], b_p[None, :, 2:])
        wh = jnp.clip(rb - lt + 1.0, 0.0)
        inter = wh[..., 0] * wh[..., 1]
        iou = inter / (r_area[:, None] + area_p[None, :] - inter)
        m = (
            (iou > iou_threshold)
            & (r_label[:, None] == l_p[None, :])
            & (rank[None, :] < r_rank[:, None])
        )  # (blk, n_pad), strict lower-triangular in rank

        # suppression by already-final earlier blocks (cols >= start still
        # have keep=False, so no extra column mask is needed)
        supp_prev = jnp.any(m & keep[None, :], axis=-1)
        live0 = r_valid & ~supp_prev

        # within-block fixpoint on the (blk, blk) sub-relation; bf16 matvec
        # is exact for 0/1 entries tested against > 0.5
        m_local = jax.lax.dynamic_slice(m, (0, start), (blk, blk))
        m_bf = m_local.astype(jnp.bfloat16)

        def fcond(state):
            k, prev, i = state
            return (i < blk) & jnp.any(k != prev)

        def fbody(state):
            k, _, i = state
            sup = (
                jnp.matmul(
                    m_bf, k.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                > 0.5
            )
            return live0 & ~sup, k, i + 1

        k, _, _ = jax.lax.while_loop(
            fcond, fbody, (live0, jnp.zeros_like(live0), jnp.int32(0))
        )
        return jax.lax.dynamic_update_slice(keep, k, (start,))

    keep = jax.lax.fori_loop(
        0, n_pad // blk, process_block, jnp.zeros((n_pad,), bool)
    )[:n]

    # emit top max_outputs kept, already score-ordered
    kept_rank_scores = jnp.where(keep, sorted_scores, neg)
    top_scores, top_pos = jax.lax.top_k(kept_rank_scores, max_outputs)
    keep_idx = order[top_pos].astype(jnp.int32)
    keep_valid = top_scores > neg / 2
    return keep_idx, keep_valid


def soft_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    sigma: float = 0.5,
    score_threshold: float = 0.001,
    max_outputs: int = 300,
):
    """Gaussian soft-NMS (csrc/cpu/soft_nms.cpp, method=gaussian).

    Returns re-scored detections: greedy argmax selection, every remaining
    box's score decayed by exp(-iou^2 / sigma).
    """
    n = boxes.shape[0]
    work = jnp.where(valid, scores, NEG_INF)

    def body(i, state):
        work, keep_idx, keep_score, keep_valid = state
        best = jnp.argmax(work)
        best_score = work[best]
        ok = best_score > score_threshold
        keep_idx = keep_idx.at[i].set(jnp.where(ok, best, 0))
        keep_score = keep_score.at[i].set(jnp.where(ok, best_score, 0.0))
        keep_valid = keep_valid.at[i].set(ok)
        iou = box_ops.box_iou(boxes[best][None], boxes)[0]
        decay = jnp.exp(-(iou**2) / sigma)
        work = jnp.where(jnp.arange(n) == best, NEG_INF, work * decay)
        return work, keep_idx, keep_score, keep_valid

    keep_idx = jnp.zeros((max_outputs,), jnp.int32)
    keep_score = jnp.zeros((max_outputs,), jnp.float32)
    keep_valid = jnp.zeros((max_outputs,), bool)
    _, keep_idx, keep_score, keep_valid = jax.lax.fori_loop(
        0, max_outputs, body, (work, keep_idx, keep_score, keep_valid)
    )
    return keep_idx, keep_score, keep_valid
