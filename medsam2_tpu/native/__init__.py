"""Native (C++) host-side kernels with build-on-demand ctypes bindings.

``lib()`` compiles ``postproc.cpp`` with g++ on first use and returns the
ctypes handle, or ``None`` when no toolchain is available — callers keep their
numpy fallbacks. The build cache is keyed by a source-content hash (never by
mtime, which a fresh checkout resets), and the output name embeds the hash so
a binary compiled from different source is never loaded. No portable-unsafe
flags (-march=native) — the .so may be cached across machines.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_DIR = os.path.dirname(os.path.abspath(__file__))


def _build() -> Optional[str]:
    src = os.path.join(_DIR, "postproc.cpp")
    try:
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
    except OSError:
        return None
    out = os.path.join(_DIR, f"_postproc_{digest}.so")
    if os.path.exists(out):
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out],
            check=True, capture_output=True, timeout=120)
        return out
    except (OSError, subprocess.SubprocessError):
        return None


def lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        path = _build()
        if path:
            L = ctypes.CDLL(path)
            i32p = ctypes.POINTER(ctypes.c_int32)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            f32p = ctypes.POINTER(ctypes.c_float)
            f64p = ctypes.POINTER(ctypes.c_double)
            L.rle_encode.restype = ctypes.c_int
            L.rle_encode.argtypes = [u8p, ctypes.c_int, ctypes.c_int, i32p]
            L.rle_decode.restype = None
            L.rle_decode.argtypes = [i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p]
            L.greedy_nms.restype = ctypes.c_int
            L.greedy_nms.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float, i32p]
            L.point_nms.restype = ctypes.c_int
            L.point_nms.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float, i32p]
            L.instance_overlap.restype = None
            L.instance_overlap.argtypes = [i32p, i32p, ctypes.c_int64, ctypes.c_int,
                                           ctypes.c_int, f64p, f64p, f64p]
            _LIB = L
    return _LIB


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def rle_encode(mask: np.ndarray):
    """Single-mask fortran-order RLE counts, or None if native unavailable."""
    L = lib()
    if L is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    counts = np.empty(h * w + 2, np.int32)
    n = L.rle_encode(_ptr(mask, ctypes.c_uint8), h, w, _ptr(counts, ctypes.c_int32))
    return counts[:n].tolist()


def rle_decode(counts, h: int, w: int):
    L = lib()
    if L is None:
        return None
    c = np.ascontiguousarray(counts, np.int32)
    out = np.empty((h, w), np.uint8)
    L.rle_decode(_ptr(c, ctypes.c_int32), len(c), h, w, _ptr(out, ctypes.c_uint8))
    return out.astype(bool)


def greedy_nms(boxes: np.ndarray, scores: np.ndarray, iou_thr: float):
    L = lib()
    if L is None or len(boxes) == 0:
        return None
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    keep = np.empty(len(boxes), np.int32)
    n = L.greedy_nms(_ptr(boxes, ctypes.c_float), _ptr(scores, ctypes.c_float),
                     len(boxes), iou_thr, _ptr(keep, ctypes.c_int32))
    return keep[:n].astype(np.int64)


def point_nms(points: np.ndarray, scores: np.ndarray, dist_thr: float):
    L = lib()
    if L is None or len(points) == 0:
        return None
    points = np.ascontiguousarray(points, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    keep = np.empty(len(points), np.int32)
    n = L.point_nms(_ptr(points, ctypes.c_float), _ptr(scores, ctypes.c_float),
                    len(points), dist_thr, _ptr(keep, ctypes.c_int32))
    return keep[:n].astype(np.int64)


def instance_overlap(true_map: np.ndarray, pred_map: np.ndarray, n_t: int, n_p: int):
    """(inter [n_t, n_p], t_areas, p_areas) or None."""
    L = lib()
    if L is None:
        return None
    t = np.ascontiguousarray(true_map, np.int32)
    p = np.ascontiguousarray(pred_map, np.int32)
    inter = np.zeros((n_t, n_p), np.float64)
    ta = np.zeros(n_t, np.float64)
    pa = np.zeros(n_p, np.float64)
    L.instance_overlap(_ptr(t, ctypes.c_int32), _ptr(p, ctypes.c_int32),
                       t.size, n_t, n_p, _ptr(inter, ctypes.c_double),
                       _ptr(ta, ctypes.c_double), _ptr(pa, ctypes.c_double))
    return inter, ta, pa
