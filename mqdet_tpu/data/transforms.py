"""Image transforms (host-side numpy/PIL).

Capability twin of maskrcnn_benchmark/data/transforms/transforms.py as
configured by build.py:5-62: Resize(min/max with multi-scale train sizes),
RandomHorizontalFlip, ColorJitter, Normalize (BGR255 Detectron convention),
plus TPU-specific static-bucket padding.
"""
from __future__ import annotations

import random
from typing import Optional, Sequence, Tuple

import numpy as np


def get_resize_size(h: int, w: int, min_size: int, max_size: int) -> Tuple[int, int]:
    """Reference Resize.get_size: scale shorter side to min_size capped so the
    longer side <= max_size."""
    size = min_size
    if max_size is not None:
        min_orig = min(h, w)
        max_orig = max(h, w)
        if max_orig / min_orig * size > max_size:
            size = int(round(max_size * min_orig / max_orig))
    if h < w:
        oh, ow = size, int(size * w / h)
    else:
        ow, oh = size, int(size * h / w)
    return oh, ow


def resize_image(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.fromarray(img).resize((ow, oh), Image.BILINEAR))


def resize_boxes(boxes: np.ndarray, scale_y: float, scale_x: float) -> np.ndarray:
    out = boxes.copy()
    out[:, 0::2] *= scale_x
    out[:, 1::2] *= scale_y
    return out


def hflip(img: np.ndarray, boxes: np.ndarray):
    """RandomHorizontalFlip (transforms.py): TO_REMOVE=1 convention."""
    img = img[:, ::-1].copy()
    w = img.shape[1]
    out = boxes.copy()
    out[:, 0] = w - boxes[:, 2] - 1
    out[:, 2] = w - boxes[:, 0] - 1
    return img, out


def color_jitter(
    img: np.ndarray,
    brightness: float = 0.0,
    contrast: float = 0.0,
    saturation: float = 0.0,
    hue: float = 0.0,
    rng: Optional[random.Random] = None,
) -> np.ndarray:
    from PIL import Image, ImageEnhance

    r = rng or random
    pil = Image.fromarray(img)
    if brightness > 0:
        pil = ImageEnhance.Brightness(pil).enhance(
            1 + r.uniform(-brightness, brightness)
        )
    if contrast > 0:
        pil = ImageEnhance.Contrast(pil).enhance(1 + r.uniform(-contrast, contrast))
    if saturation > 0:
        pil = ImageEnhance.Color(pil).enhance(1 + r.uniform(-saturation, saturation))
    return np.asarray(pil)


def normalize(
    img: np.ndarray,
    pixel_mean: Sequence[float],
    pixel_std: Sequence[float],
    to_bgr255: bool = True,
) -> np.ndarray:
    """Detectron normalization (INPUT.TO_BGR255 + PIXEL_MEAN/STD in BGR,
    configs/pretrain/mq-glip-t.yaml INPUT block)."""
    x = img.astype(np.float32)
    if to_bgr255:
        x = x[..., ::-1]  # RGB -> BGR, values stay 0..255
    else:
        x = x / 255.0
    return (x - np.asarray(pixel_mean, np.float32)) / np.asarray(
        pixel_std, np.float32
    )


def pick_bucket(h: int, w: int, buckets: Sequence[Tuple[int, int]]):
    """Smallest static bucket that fits (h, w).

    Buckets are orientation-free: a declared (800, 1344) also serves
    portrait images as (1344, 800). The reference pads dynamically to
    size-divisible-32 per batch (ImageList), so any aspect ratio works
    there; here each padded geometry is one compiled head, and
    orientation-aware fitting keeps the declared bucket list small (one
    entry covers both landscape and portrait at two compilations).
    """
    cands = []
    for bh, bw in buckets:
        cands.append((bh, bw))
        cands.append((bw, bh))
    for bh, bw in sorted(set(cands), key=lambda b: b[0] * b[1]):
        if h <= bh and w <= bw:
            return bh, bw
    raise ValueError(
        f"image ({h}, {w}) fits no TPU.IMAGE_BUCKETS entry {list(buckets)}; "
        "add a larger bucket or lower INPUT.MIN/MAX_SIZE_TEST"
    )


def pad_to_bucket(img: np.ndarray, bucket: Tuple[int, int]) -> np.ndarray:
    bh, bw = bucket
    out = np.zeros((bh, bw, img.shape[-1]), img.dtype)
    out[: img.shape[0], : img.shape[1]] = img
    return out


class EvalTransform:
    """Deterministic resize -> normalize -> pad-to-bucket pipeline."""

    def __init__(self, cfg):
        self.min_size = cfg.INPUT.MIN_SIZE_TEST
        self.max_size = cfg.INPUT.MAX_SIZE_TEST
        self.pixel_mean = cfg.INPUT.PIXEL_MEAN
        self.pixel_std = cfg.INPUT.PIXEL_STD
        self.to_bgr255 = cfg.INPUT.TO_BGR255
        self.buckets = tuple(tuple(b) for b in cfg.TPU.IMAGE_BUCKETS)

    def __call__(self, img: np.ndarray):
        h, w = img.shape[:2]
        oh, ow = get_resize_size(h, w, self.min_size, self.max_size)
        resized = resize_image(img, oh, ow)
        normed = normalize(resized, self.pixel_mean, self.pixel_std, self.to_bgr255)
        bucket = pick_bucket(oh, ow, self.buckets)
        padded = pad_to_bucket(normed, bucket)
        # scale factors mapping network coords back to the ORIGINAL image
        return padded, (oh, ow), (h / oh, w / ow)


class TrainTransform:
    """Multi-scale resize + flip + jitter + normalize + bucket padding."""

    def __init__(self, cfg):
        sizes = tuple(cfg.AUGMENT.MULT_MIN_SIZE_TRAIN) or (cfg.INPUT.MIN_SIZE_TRAIN,)
        self.min_sizes = sizes
        self.max_size = cfg.INPUT.MAX_SIZE_TRAIN
        self.flip_prob = cfg.AUGMENT.FLIP_PROB_TRAIN
        self.jitter = (
            cfg.AUGMENT.BRIGHTNESS, cfg.AUGMENT.CONTRAST,
            cfg.AUGMENT.SATURATION, cfg.AUGMENT.HUE,
        )
        self.pixel_mean = cfg.INPUT.PIXEL_MEAN
        self.pixel_std = cfg.INPUT.PIXEL_STD
        self.to_bgr255 = cfg.INPUT.TO_BGR255
        self.buckets = tuple(tuple(b) for b in cfg.TPU.IMAGE_BUCKETS)

    def __call__(self, img: np.ndarray, boxes: np.ndarray, rng=None):
        r = rng or random
        h, w = img.shape[:2]
        if any(self.jitter):
            img = color_jitter(img, *self.jitter, rng=r)
        min_size = r.choice(self.min_sizes)
        oh, ow = get_resize_size(h, w, min_size, self.max_size)
        img = resize_image(img, oh, ow)
        boxes = resize_boxes(boxes, oh / h, ow / w)
        if r.random() < self.flip_prob:
            img, boxes = hflip(img, boxes)
        img = normalize(img, self.pixel_mean, self.pixel_std, self.to_bgr255)
        bucket = pick_bucket(oh, ow, self.buckets)
        img = pad_to_bucket(img, bucket)
        return img, boxes, (oh, ow)
