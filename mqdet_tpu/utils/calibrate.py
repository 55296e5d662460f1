"""DCNv2 offset-range calibration.

The TPU-default DCNv2 implementations (ops/deform_conv.py
modulated_deform_conv_window, ops/pallas/deform_conv_pallas.py) clip learned
sampling offsets to [-R, R] around each kernel tap; they are exact for
|offset| <= R and silently divergent beyond it. The reference CUDA kernel
(maskrcnn_benchmark/csrc/cuda/deform_conv_kernel_cuda.cu) samples unbounded
offsets, so a checkpoint whose offset head emits values past the configured
TPU.DEFORM_RADIUS would change outputs without any error.

This module measures the actual offset distribution a parameter set produces
on sample inputs, and recommends a safe configuration:

  * measure_max_deform_offset — run the head with flax capture_intermediates
    on every DyConv ``offset`` conv and return the max |offset| observed.
  * calibrate_deform_radius — turn that measurement into a decision:
    keep the configured radius, raise it, or fall back to the exact gather
    implementation (MQDET_DEFORM_IMPL=gather) when the needed radius is too
    large for the window formulation to stay MXU-friendly.

Wired into tools/eval.py (--calibrate-deform): after weights load, one batch
is measured and the model is rebuilt at the calibrated radius before any
metric is computed.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp

# Beyond this radius the (2R+4)^2 shift window makes the window/Pallas
# formulation compute-heavier than the exact gather composite; fall back.
MAX_WINDOW_RADIUS = 8


def _offset_filter(mdl, method_name) -> bool:
    return getattr(mdl, "name", None) == "offset"


def measure_max_deform_offset(
    model,
    params,
    images: jnp.ndarray,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    queries: Optional[jnp.ndarray] = None,
    query_mask: Optional[jnp.ndarray] = None,
) -> float:
    """Max |offset| (pixels, feature-map units) across all DyConv levels.

    Runs the text-conditioned head once with capture_intermediates filtering
    the ``offset`` convs (27 channels: 18 offsets + 9 modulation logits) and
    reduces over every captured tensor's offset channels.
    """
    feats = model.apply(
        params, images, method=type(model).encode_image
    )
    _, inter = model.apply(
        params,
        list(feats),
        input_ids,
        attention_mask,
        queries,
        query_mask,
        method=type(model).forward_head,
        capture_intermediates=_offset_filter,
        mutable=["intermediates"],
    )

    def collect(tree) -> List[jnp.ndarray]:
        return [
            x
            for x in jax.tree.leaves(tree)
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[-1] == 27
        ]

    captured = collect(inter)
    if not captured:
        return 0.0
    return float(
        max(float(jnp.max(jnp.abs(om[..., :18]))) for om in captured)
    )


@dataclasses.dataclass
class DeformCalibration:
    max_offset: float  # measured max |offset| in feature-map pixels
    radius: int        # recommended TPU.DEFORM_RADIUS
    impl: str          # "pallas"/"window" (radius suffices) or "gather"
    changed: bool      # whether the recommendation differs from cfg


def calibrate_deform_radius(
    cfg,
    model,
    params,
    batch_args: Tuple[Any, ...],
    margin: float = 1.0,
) -> DeformCalibration:
    """Measure offsets on one batch and recommend (radius, impl).

    margin: extra pixels of headroom over the observed max (other images can
    produce slightly larger offsets than the calibration batch).
    """
    max_off = measure_max_deform_offset(model, params, *batch_args)
    needed = int(math.ceil(max_off + margin))
    configured = int(cfg.TPU.DEFORM_RADIUS)
    if needed <= configured:
        return DeformCalibration(max_off, configured, "pallas", False)
    if needed <= MAX_WINDOW_RADIUS:
        return DeformCalibration(max_off, needed, "pallas", True)
    return DeformCalibration(max_off, configured, "gather", True)


def apply_calibration(cfg, calib: DeformCalibration) -> bool:
    """Mutate cfg/env per the calibration. Returns True when the model must
    be rebuilt (radius is a module attribute baked in at construction)."""
    import os

    if not calib.changed:
        return False
    if calib.impl == "gather":
        os.environ["MQDET_DEFORM_IMPL"] = "gather"
        return True
    cfg.TPU.DEFORM_RADIUS = calib.radius
    return True
