"""Legacy GLIP detection heads: FCOS, RetinaNet, ATSS (language-free).

Capability twins of the non-VLDyHead entries in the reference RPN registry
(modeling/rpn/rpn.py + modeling/rpn/{fcos/fcos.py, retina.py, atss.py}):
a shared 4x conv tower producing per-level classification / box / centerness
maps. None of the MQ-Det configs use these (RPN_ARCHITECTURE=VLDYHEAD
everywhere); they complete the registry surface and are dispatchable via
cfg.MODEL.RPN_ARCHITECTURE through build_rpn_head.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List

import jax.numpy as jnp
from flax import linen as nn

from mqdet_tpu.models.layers import Scale

Dtype = Any


class _ConvTower(nn.Module):
    channels: int
    num_convs: int
    use_gn: bool = True
    prefix: str = "tower"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_convs):
            x = nn.Conv(
                self.channels, (3, 3), padding=1,
                kernel_init=nn.initializers.normal(0.01),
                dtype=self.dtype, name=f"{self.prefix}_conv{i}",
            )(x)
            if self.use_gn:
                x = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                                 name=f"{self.prefix}_gn{i}")(x)
            x = nn.relu(x)
        return x


class FCOSHead(nn.Module):
    """FCOS: anchor-free per-pixel cls + l/t/r/b distances + centerness
    (modeling/rpn/fcos/fcos.py). Box branch output passes a per-level
    learnable Scale then exp (reference semantics)."""

    num_classes: int = 80
    channels: int = 256
    num_convs: int = 4
    prior_prob: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]) -> Dict[str, List[jnp.ndarray]]:
        cls_tower = _ConvTower(self.channels, self.num_convs, prefix="cls_tower",
                               dtype=self.dtype, name="cls_tower")
        box_tower = _ConvTower(self.channels, self.num_convs, prefix="bbox_tower",
                               dtype=self.dtype, name="bbox_tower")
        bias = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_conv = nn.Conv(self.num_classes, (3, 3), padding=1,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(bias),
                           dtype=self.dtype, name="cls_logits")
        box_conv = nn.Conv(4, (3, 3), padding=1,
                           kernel_init=nn.initializers.normal(0.01),
                           dtype=self.dtype, name="bbox_pred")
        ctr_conv = nn.Conv(1, (3, 3), padding=1,
                           kernel_init=nn.initializers.normal(0.01),
                           dtype=self.dtype, name="centerness")

        logits, boxes, centerness = [], [], []
        for i, f in enumerate(feats):
            ct = cls_tower(f)
            bt = box_tower(f)
            logits.append(cls_conv(ct))
            ctr = ctr_conv(bt)
            centerness.append(ctr)
            reg = box_conv(bt)
            reg = Scale(name=f"scale_{i}")(reg)
            boxes.append(jnp.exp(reg))
        return {"cls_logits": logits, "bbox_reg": boxes, "centerness": centerness}


class RetinaHead(nn.Module):
    """RetinaNet: anchor-based cls/box (modeling/rpn/retina.py)."""

    num_classes: int = 80
    num_anchors: int = 9
    channels: int = 256
    num_convs: int = 4
    prior_prob: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]) -> Dict[str, List[jnp.ndarray]]:
        cls_tower = _ConvTower(self.channels, self.num_convs, use_gn=False,
                               prefix="cls_tower", dtype=self.dtype, name="cls_tower")
        box_tower = _ConvTower(self.channels, self.num_convs, use_gn=False,
                               prefix="bbox_tower", dtype=self.dtype, name="bbox_tower")
        bias = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_conv = nn.Conv(self.num_classes * self.num_anchors, (3, 3), padding=1,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(bias),
                           dtype=self.dtype, name="cls_logits")
        box_conv = nn.Conv(4 * self.num_anchors, (3, 3), padding=1,
                           kernel_init=nn.initializers.normal(0.01),
                           dtype=self.dtype, name="bbox_pred")
        logits = [cls_conv(cls_tower(f)) for f in feats]
        boxes = [box_conv(box_tower(f)) for f in feats]
        return {"cls_logits": logits, "bbox_reg": boxes}


class ATSSHead(nn.Module):
    """ATSS: anchor-based cls/box/centerness (modeling/rpn/atss.py)."""

    num_classes: int = 80
    num_anchors: int = 1
    channels: int = 256
    num_convs: int = 4
    prior_prob: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]) -> Dict[str, List[jnp.ndarray]]:
        cls_tower = _ConvTower(self.channels, self.num_convs, prefix="cls_tower",
                               dtype=self.dtype, name="cls_tower")
        box_tower = _ConvTower(self.channels, self.num_convs, prefix="bbox_tower",
                               dtype=self.dtype, name="bbox_tower")
        bias = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_conv = nn.Conv(self.num_classes * self.num_anchors, (3, 3), padding=1,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(bias),
                           dtype=self.dtype, name="cls_logits")
        box_conv = nn.Conv(4 * self.num_anchors, (3, 3), padding=1,
                           kernel_init=nn.initializers.normal(0.01),
                           dtype=self.dtype, name="bbox_pred")
        ctr_conv = nn.Conv(self.num_anchors, (3, 3), padding=1,
                           kernel_init=nn.initializers.normal(0.01),
                           dtype=self.dtype, name="centerness")
        logits, boxes, centerness = [], [], []
        for i, f in enumerate(feats):
            ct = cls_tower(f)
            bt = box_tower(f)
            logits.append(cls_conv(ct))
            boxes.append(Scale(name=f"scale_{i}")(box_conv(bt)))
            centerness.append(ctr_conv(bt))
        return {"cls_logits": logits, "bbox_reg": boxes, "centerness": centerness}


def build_rpn_head(cfg, dtype=jnp.float32):
    """RPN registry dispatch (modeling/rpn/rpn.py build_rpn +
    modeling/rpn/__init__.py): VLDYHEAD is built inside MQGLIP; the
    language-free legacy heads are returned here."""
    arch = cfg.MODEL.RPN_ARCHITECTURE
    ncls = cfg.MODEL.ATSS.NUM_CLASSES - 1
    if arch == "FCOS":
        return FCOSHead(num_classes=ncls, dtype=dtype)
    if arch == "RETINA":
        return RetinaHead(
            num_classes=ncls,
            num_anchors=len(cfg.MODEL.RPN.ASPECT_RATIOS),
            dtype=dtype,
        )
    if arch == "ATSS":
        return ATSSHead(num_classes=ncls, dtype=dtype)
    raise ValueError(
        f"RPN_ARCHITECTURE {arch!r}: VLDYHEAD is built by the MQGLIP "
        "meta-architecture; legacy heads: FCOS | RETINA | ATSS"
    )


class LegacyDetector(nn.Module):
    """Language-free GeneralizedRCNN twin for the legacy RPN entries:
    backbone pyramid -> legacy head maps (modeling/detector/
    generalized_rcnn.py with rpn_only=True). Losses / postprocessing live
    in engine/legacy_losses.py (build_legacy_machinery)."""

    backbone: nn.Module
    head: nn.Module

    def __call__(self, images: jnp.ndarray, deterministic: bool = True):
        feats = self.backbone(images, deterministic=deterministic)
        return self.head(list(feats))


def build_legacy_detector(cfg, dtype=jnp.float32) -> LegacyDetector:
    from mqdet_tpu.models.backbones import build_backbone

    return LegacyDetector(
        backbone=build_backbone(cfg), head=build_rpn_head(cfg, dtype)
    )
