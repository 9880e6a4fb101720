"""ctypes bindings for the native host runtime (``native/retinanet_host.cc``).

Auto-builds the shared library on first use (cmake or direct g++), caches it
under ``native/build/``, and degrades gracefully to numpy fallbacks when no
compiler is available.  Covers the host hot paths the reference got from the
TF C++ runtime: fused resize+normalize, pairwise IoU, greedy NMS.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libretinanet_host.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    src = os.path.join(_NATIVE_DIR, "retinanet_host.cc")
    cmd = ["g++", "-O3", "-march=native", "-fno-math-errno", "-std=c++17",
           "-shared", "-fPIC", "-pthread", src, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.warning("native build failed (%s); using numpy fallbacks", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.warning("native load failed: %s", e)
            return None

        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.rn_resize_normalize.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, f32p,
            ctypes.c_int]
        lib.rn_resize_normalize.restype = None
        lib.rn_iou_matrix.argtypes = [f32p, ctypes.c_int, f32p,
                                      ctypes.c_int, f32p]
        lib.rn_iou_matrix.restype = None
        lib.rn_nms.argtypes = [f32p, ctypes.c_int, ctypes.c_float, u8p]
        lib.rn_nms.restype = ctypes.c_int
        _lib = lib
        return _lib


def resize_normalize(image: np.ndarray, canvas_size, nh: int, nw: int,
                     mean: np.ndarray, std: np.ndarray,
                     num_threads: int = 2) -> Optional[np.ndarray]:
    """Fused resize(nh,nw)+normalize+pad to an [H, W, 3] f32 canvas
    (``canvas_size``: int for square or an (h, w) pair), or None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    if isinstance(canvas_size, (tuple, list)):
        ch, cw = int(canvas_size[0]), int(canvas_size[1])
    else:
        ch = cw = int(canvas_size)
    image = np.ascontiguousarray(image, np.uint8)
    out = np.empty((ch, cw, 3), np.float32)
    lib.rn_resize_normalize(
        image, image.shape[0], image.shape[1], out, ch, cw,
        nh, nw, np.ascontiguousarray(mean, np.float32),
        np.ascontiguousarray(std, np.float32), num_threads)
    return out


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[N,4]×[M,4] → [N,M]; native when available, numpy otherwise."""
    lib = get_lib()
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    if lib is None or len(a) == 0 or len(b) == 0:
        from retinanet_tpu.eval_coco import _box_iou_matrix
        return _box_iou_matrix(a, b)
    out = np.empty((len(a), len(b)), np.float32)
    lib.rn_iou_matrix(a, len(a), b, len(b), out)
    return out


def nms_keep(boxes_sorted: np.ndarray, iou_threshold: float) -> np.ndarray:
    """Greedy NMS keep flags for score-sorted [N,4] boxes (host)."""
    lib = get_lib()
    boxes_sorted = np.ascontiguousarray(boxes_sorted, np.float32)
    n = len(boxes_sorted)
    if lib is None:
        keep = np.ones(n, bool)
        for i in range(n):
            if not keep[i]:
                continue
            if i + 1 < n:
                iou = iou_matrix(boxes_sorted[i:i + 1],
                                 boxes_sorted[i + 1:])[0]
                keep[i + 1:] &= ~(iou > iou_threshold)
        return keep
    keep = np.empty(n, np.uint8)
    lib.rn_nms(boxes_sorted, n, float(iou_threshold), keep)
    return keep.astype(bool)
