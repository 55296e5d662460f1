"""Focal losses — pure XLA (elementwise, fuses into surrounding graph).

TPU-native replacements for the reference CUDA kernels
(maskrcnn_benchmark/csrc/cuda/SigmoidFocalLoss_cuda.cu) and the token focal
losses (maskrcnn_benchmark/layers/sigmoid_focal_loss.py:85-197). No custom
kernel is warranted: XLA fuses these into the logits producer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jnp.ndarray:
    """Per-class sigmoid focal loss (SigmoidFocalLoss_cuda semantics).

    Args:
      logits: (N, C) class logits (class c at column c-1)
      targets: (N,) int labels in [0, C]; 0 = background

    Returns: (N, C) elementwise loss.
    """
    num_classes = logits.shape[-1]
    class_range = jnp.arange(1, num_classes + 1, dtype=targets.dtype)[None, :]
    t = targets[:, None]
    p = jax.nn.sigmoid(logits)
    pos = (t == class_range).astype(logits.dtype)
    neg = ((t != class_range) & (t >= 0)).astype(logits.dtype)

    term1 = (1 - p) ** gamma * jnp.log(jnp.clip(p, 1e-8))
    term2 = p**gamma * jnp.log(jnp.clip(1 - p, 1e-8))
    return -pos * term1 * alpha - neg * term2 * (1 - alpha)


def token_sigmoid_binary_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    text_mask: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Binary token focal loss (sigmoid_focal_loss.py:131-172).

    Args:
      logits:  (B, A, T) anchor-to-token logits
      targets: (B, A, T) in [0, 1]
      text_mask: (B, T) valid-token mask (loss only over valid tokens)

    Returns scalar sum (the reference returns loss.sum()).
    """
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    mask = (text_mask > 0).astype(loss.dtype)[:, None, :]
    return (loss * mask).sum()
