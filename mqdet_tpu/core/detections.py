"""Fixed-capacity detection arrays — the TPU replacement for BoxList.

The reference threads dynamically-sized `BoxList` objects
(maskrcnn_benchmark/structures/bounding_box.py) through inference. XLA
requires static shapes, so detections are a struct-of-arrays with a validity
mask. Invalid slots carry zeros and score -inf ordering guarantees they sort
last.
"""
from __future__ import annotations

from typing import Dict

import chex
import jax
import jax.numpy as jnp
import numpy as np


@chex.dataclass
class Detections:
    """A fixed-capacity batch of detections for ONE image.

    boxes:  (N, 4) float32 xyxy in input-image coordinates
    scores: (N,)   float32
    labels: (N,)   int32 (1-based category slot; 0 = background/invalid)
    valid:  (N,)   bool
    """

    boxes: jnp.ndarray
    scores: jnp.ndarray
    labels: jnp.ndarray
    valid: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.boxes.shape[-2]

    @staticmethod
    def empty(capacity: int) -> "Detections":
        return Detections(
            boxes=jnp.zeros((capacity, 4), jnp.float32),
            scores=jnp.zeros((capacity,), jnp.float32),
            labels=jnp.zeros((capacity,), jnp.int32),
            valid=jnp.zeros((capacity,), bool),
        )


def concatenate(dets: list) -> Detections:
    """cat_boxlist equivalent over the capacity axis."""
    return Detections(
        boxes=jnp.concatenate([d.boxes for d in dets], axis=-2),
        scores=jnp.concatenate([d.scores for d in dets], axis=-1),
        labels=jnp.concatenate([d.labels for d in dets], axis=-1),
        valid=jnp.concatenate([d.valid for d in dets], axis=-1),
    )


def top_k(dets: Detections, k: int) -> Detections:
    """Keep the k highest-scoring valid detections (compacted to the front)."""
    neg_inf = jnp.finfo(jnp.float32).min
    masked = jnp.where(dets.valid, dets.scores, neg_inf)
    _, idx = jax.lax.top_k(masked, k)
    return Detections(
        boxes=dets.boxes[idx],
        scores=dets.scores[idx],
        labels=dets.labels[idx],
        valid=dets.valid[idx],
    )


def resize(dets: Detections, scale_y, scale_x) -> Detections:
    """BoxList.resize: map boxes from network input scale to original image."""
    s = jnp.stack([scale_x, scale_y, scale_x, scale_y]).reshape(1, 4)
    return dets.replace(boxes=dets.boxes * s)


def to_numpy_dict(dets: Detections) -> Dict[str, np.ndarray]:
    """Host-side: drop invalid slots and return plain numpy arrays."""
    valid = np.asarray(dets.valid)
    return {
        "boxes": np.asarray(dets.boxes)[valid],
        "scores": np.asarray(dets.scores)[valid],
        "labels": np.asarray(dets.labels)[valid],
    }
