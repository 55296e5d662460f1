"""Backbone registry: CONV_BODY name -> flax pyramid backbone.

Capability twin of maskrcnn_benchmark/modeling/backbone/__init__.py:19-239
(registry.BACKBONES entries + build_backbone dispatch :233-239). Every
builder returns a flax module whose ``__call__(images_nhwc, deterministic)``
yields the feature list the downstream head consumes:

- *-RETINANET / *-FPN / *-BIFPN / EFFICIENT-DET entries -> 5 pyramid levels
  (P3..P7, strides 8..128 — or 4..64 for EFFICIENT-DET start_from=2).
- R-*-C4 / R-*-C5 entries -> raw ResNet stage features (C2..C5), matching the
  reference's body-only nn.Sequential([("body", ...)]) (:19-34).

Notes vs the reference registry:
- "CVT-FPN-RETINANET" (:128-162) references a ``cvt`` module that is never
  imported anywhere in the reference tree — the entry raises NameError the
  moment it is called, i.e. it is dead code. We register it with an explicit
  error carrying that provenance instead of silently omitting the name.
- fbnet.py exists in the reference tree but has **no** registry entry, so no
  CONV_BODY string can reach it; it has no twin here.
- The default MQ-Det path ("SWINT-FPN-RETINANET") is built inside MQGLIP
  (models/mq_glip.py) for jit-friendliness; this registry exposes the same
  construction standalone plus every other registered name.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List

import jax.numpy as jnp
from flax import linen as nn

from mqdet_tpu.models.efficientnet import BiFPN, EfficientNet, EffNetFPN, _DET_FILTERS
from mqdet_tpu.models.fpn import FPN
from mqdet_tpu.models.resnet import ResNet
from mqdet_tpu.models.swin import SwinTransformer

Dtype = Any

BACKBONES: Dict[str, Callable] = {}


def register(*names: str):
    def deco(fn):
        for n in names:
            BACKBONES[n] = fn
        return fn
    return deco


class _BodyFPN(nn.Module):
    """body (4 stage maps) -> FPN over the last 3 -> P3..P7.

    Mirrors build_retinanet_swint_fpn_backbone (__init__.py:37-81) /
    build_eff_fpn_p6p7_backbone (:165-192): in_channels_list[0] = 0 skips the
    stride-4 map; LastLevelP6P7 appends the extra strided levels.
    """

    body: nn.Module
    out_channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> List[jnp.ndarray]:
        feats = self.body(x, deterministic=deterministic)
        fpn = FPN(out_channels=self.out_channels, dtype=self.dtype, name="fpn")
        return fpn(list(feats)[1:4])


class _BodyBiFPN(nn.Module):
    """body -> NUM_REPEATS stacked BiFPN cells (__init__.py:195-219)."""

    body: nn.Module
    out_channels: int = 256
    num_repeats: int = 3
    attention: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> List[jnp.ndarray]:
        feats = self.body(x, deterministic=deterministic)
        feats = tuple(feats)[1:4]
        for i in range(self.num_repeats):
            feats = BiFPN(
                out_channels=self.out_channels,
                first_time=(i == 0),
                attention=self.attention,
                dtype=self.dtype,
                name=f"bifpn{i}",
            )(feats)
        return list(feats)


def _dtype(cfg):
    return getattr(jnp, cfg.TPU.COMPUTE_DTYPE)


def _resnet_body(cfg):
    name = cfg.MODEL.BACKBONE.CONV_BODY
    depths = (3, 4, 23, 3) if name.startswith("R-101") else (3, 4, 6, 3)
    return ResNet(depths=depths, dtype=_dtype(cfg))


@register("R-50-C4", "R-50-C5", "R-101-C4", "R-101-C5")
def build_resnet_backbone(cfg):
    """Body-only ResNet (__init__.py:19-26): returns C2..C5 stage maps."""
    return _resnet_body(cfg)


@register("R-50-RETINANET", "R-101-RETINANET")
def build_resnet_retinanet_backbone(cfg):
    """ResNet + FPN+P6P7 pyramid (__init__.py:29-34 wired as RETINANET)."""
    return _BodyFPN(
        body=_resnet_body(cfg),
        out_channels=cfg.MODEL.BACKBONE.OUT_CHANNELS,
        dtype=_dtype(cfg),
    )


@register("SWINT-FPN-RETINANET", "SWINT-FPN")
def build_swint_fpn_backbone(cfg):
    """Swin (version dispatched by SWINT.VERSION, __init__.py:44-54) + FPN."""
    body = SwinTransformer(
        embed_dim=cfg.MODEL.SWINT.EMBED_DIM,
        depths=tuple(cfg.MODEL.SWINT.DEPTHS),
        num_heads=tuple(cfg.MODEL.SWINT.NUM_HEADS),
        window_size=cfg.MODEL.SWINT.WINDOW_SIZE,
        drop_path_rate=cfg.MODEL.SWINT.DROP_PATH_RATE,
        version=cfg.MODEL.SWINT.VERSION,
        dtype=_dtype(cfg),
    )
    return _BodyFPN(
        body=body, out_channels=cfg.MODEL.BACKBONE.OUT_CHANNELS, dtype=_dtype(cfg)
    )


def _eff_version(cfg) -> str:
    # "EFFICIENT3-FPN-RETINANET" -> "b3" (__init__.py:171-173)
    return cfg.MODEL.BACKBONE.CONV_BODY.split("-")[0].replace("EFFICIENT", "b")


@register(
    "EFFICIENT7-FPN-RETINANET", "EFFICIENT7-FPN-FCOS",
    "EFFICIENT5-FPN-RETINANET", "EFFICIENT5-FPN-FCOS",
    "EFFICIENT3-FPN-RETINANET", "EFFICIENT3-FPN-FCOS",
)
def build_eff_fpn_backbone(cfg):
    body = EfficientNet(version=_eff_version(cfg), dtype=_dtype(cfg))
    return _BodyFPN(
        body=body, out_channels=cfg.MODEL.BACKBONE.OUT_CHANNELS, dtype=_dtype(cfg)
    )


@register(
    "EFFICIENT7-BIFPN-RETINANET", "EFFICIENT7-BIFPN-FCOS",
    "EFFICIENT5-BIFPN-RETINANET", "EFFICIENT5-BIFPN-FCOS",
    "EFFICIENT3-BIFPN-RETINANET", "EFFICIENT3-BIFPN-FCOS",
)
def build_eff_bifpn_backbone(cfg):
    body = EfficientNet(version=_eff_version(cfg), dtype=_dtype(cfg))
    return _BodyBiFPN(
        body=body,
        out_channels=cfg.MODEL.BACKBONE.OUT_CHANNELS,
        num_repeats=cfg.MODEL.BIFPN.NUM_REPEATS,
        attention=cfg.MODEL.BIFPN.USE_ATTENTION,
        dtype=_dtype(cfg),
    )


@register("EFFICIENT-DET")
def build_efficientdet_backbone(cfg):
    return EffNetFPN(
        compound_coef=cfg.MODEL.BACKBONE.EFFICIENT_DET_COMPOUND,
        start_from=cfg.MODEL.BACKBONE.EFFICIENT_DET_START_FROM,
        dtype=_dtype(cfg),
    )


@register("CVT-FPN-RETINANET")
def build_cvt_backbone(cfg):
    raise NotImplementedError(
        "CVT-FPN-RETINANET is dead code in the reference: "
        "modeling/backbone/__init__.py:128-162 calls cvt.build_cvt_backbone "
        "but never imports a cvt module, so the entry raises NameError when "
        "invoked. No config in the reference uses it."
    )


def build_backbone(cfg) -> nn.Module:
    """build_backbone dispatch (__init__.py:233-239)."""
    name = cfg.MODEL.BACKBONE.CONV_BODY
    if name not in BACKBONES:
        raise KeyError(
            f"cfg.MODEL.BACKBONE.CONV_BODY: {name} is not registered in registry"
        )
    return BACKBONES[name](cfg)
