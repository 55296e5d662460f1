"""ctypes bindings for the native host library (native/libmqdet_host.so).

Auto-builds with `make` on first use if the toolchain is present; every entry
point has a pure-numpy fallback so the framework works without the library.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmqdet_host.so"))
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    _bind(lib)
    _lib = lib
    return _lib


def load_library(so_path: str) -> ctypes.CDLL:
    """Load + bind an explicit build of the host library (used by tests to
    exercise a from-source build rather than the committed binary)."""
    lib = ctypes.CDLL(so_path)
    _bind(lib)
    return lib


def _bind(lib: ctypes.CDLL) -> None:
    lib.match_detections.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.resize_normalize_pad.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]
    lib.class_aware_nms.restype = ctypes.c_int64
    lib.class_aware_nms.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_double,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
    ]


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def match_detections(det_boxes, gt_boxes, gt_ignore, thresholds):
    """Native greedy matching; returns (tp (T, D), det_ignore (T, D)) bool."""
    lib = _load()
    d = len(det_boxes)
    g = len(gt_boxes)
    t = len(thresholds)
    if lib is None:
        return None  # caller falls back to python
    det_boxes = np.ascontiguousarray(det_boxes, np.float32)
    gt_boxes = np.ascontiguousarray(gt_boxes, np.float32)
    gt_ignore = np.ascontiguousarray(gt_ignore, np.uint8)
    thresholds = np.ascontiguousarray(thresholds, np.float64)
    tp = np.zeros((t, d), np.uint8)
    dt_ig = np.zeros((t, d), np.uint8)
    lib.match_detections(
        _ptr(det_boxes, ctypes.c_float), d,
        _ptr(gt_boxes, ctypes.c_float), _ptr(gt_ignore, ctypes.c_uint8), g,
        _ptr(thresholds, ctypes.c_double), t,
        _ptr(tp, ctypes.c_uint8), _ptr(dt_ig, ctypes.c_uint8),
    )
    return tp.astype(bool), dt_ig.astype(bool)


def resize_normalize_pad(img, oh, ow, bucket_hw, pixel_mean, pixel_std, to_bgr255=True):
    """Native image transform; returns (bucket_h, bucket_w, 3) f32 or None."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    mean = np.ascontiguousarray(pixel_mean, np.float32)
    std = np.ascontiguousarray(pixel_std, np.float32)
    out = np.zeros((bucket_hw[0], bucket_hw[1], 3), np.float32)
    lib.resize_normalize_pad(
        _ptr(img, ctypes.c_uint8), img.shape[0], img.shape[1],
        oh, ow, bucket_hw[0], bucket_hw[1],
        _ptr(mean, ctypes.c_float), _ptr(std, ctypes.c_float),
        1 if to_bgr255 else 0, _ptr(out, ctypes.c_float),
    )
    return out


def class_aware_nms(boxes, scores, labels, iou_threshold, max_out):
    """Native host NMS; returns keep indices or None."""
    lib = _load()
    if lib is None:
        return None
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    labels = np.ascontiguousarray(labels, np.int32)
    keep = np.zeros((max_out,), np.int64)
    n = lib.class_aware_nms(
        _ptr(boxes, ctypes.c_float), _ptr(scores, ctypes.c_float),
        _ptr(labels, ctypes.c_int32), len(boxes), iou_threshold, max_out,
        _ptr(keep, ctypes.c_int64),
    )
    return keep[:n]
