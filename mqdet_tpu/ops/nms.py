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
