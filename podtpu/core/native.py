"""ctypes bindings to the native (C++) runtime components.

Loads ``native/libpodtpu_native.so`` — built on demand with ``make`` if the
toolchain is available — and exposes:

* :func:`decode_resize_batch`: threaded JPEG/PNG decode + aspect-preserving
  bilinear fit-resize into zero-padded uint8 canvases (the reference's
  DataLoader-worker PIL decode path, SURVEY.md §2.2);
* :func:`coco_match`: the COCO greedy matching inner loop (pycocotools
  C-extension equivalent).

Everything degrades gracefully: if the library can't be built or loaded the
callers fall back to the pure-Python implementations.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
LIB_PATH = os.path.join(NATIVE_DIR, "libpodtpu_native.so")


def _build() -> bool:
    try:
        r = subprocess.run(["make", "-C", NATIVE_DIR],
                           capture_output=True, timeout=120)
        return r.returncode == 0
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("PODTPU_DISABLE_NATIVE"):
            return None
        if not os.path.exists(LIB_PATH):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(LIB_PATH)
        except OSError:
            return None

        lib.podtpu_decode_resize_batch.restype = ctypes.c_int
        lib.podtpu_decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.podtpu_decode_resize_batch_u8.restype = ctypes.c_int
        lib.podtpu_decode_resize_batch_u8.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.podtpu_coco_match.restype = None
        lib.podtpu_coco_match.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return get_lib() is not None


def decode_resize_batch(
    paths: List[str], canvas_hw: Tuple[int, int], num_threads: int = 4
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Decode ``paths`` into ``[N, H, W, 3]`` uint8 canvases.

    uint8 is the loader contract (4x less host->device transfer; the
    jitted steps normalise to [0,1] on device).  Returns (canvases,
    scales [N], orig_hw [N, 2]) or None if the native library is
    unavailable or ANY image failed to decode (caller falls back).
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    ch, cw = canvas_hw
    canvases = np.zeros((n, ch, cw, 3), np.uint8)
    scales = np.zeros((n,), np.float32)
    orig_hw = np.zeros((n, 2), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.podtpu_decode_resize_batch_u8(
        arr, n,
        canvases.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ch, cw,
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        orig_hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), num_threads)
    if failures:
        return None
    return canvases, scales, orig_hw


def coco_match(iou: np.ndarray, gt_ig: np.ndarray, det_area: np.ndarray,
               thrs: np.ndarray, area_range: Tuple[float, float]
               ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Greedy COCO matching; returns (dtm [T, D], dtig [T, D]) bool arrays
    or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    d, g = iou.shape
    t = len(thrs)
    iou = np.ascontiguousarray(iou, np.float64)
    gt_ig_u8 = np.ascontiguousarray(gt_ig, np.uint8)
    det_area = np.ascontiguousarray(det_area, np.float64)
    thrs = np.ascontiguousarray(thrs, np.float64)
    dtm = np.zeros((t, d), np.uint8)
    dtig = np.zeros((t, d), np.uint8)
    lib.podtpu_coco_match(
        iou.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        gt_ig_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        det_area.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        thrs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        d, g, t, float(area_range[0]), float(area_range[1]),
        dtm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        dtig.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return dtm.astype(bool), dtig.astype(bool)
