"""ctypes binding for the native host-pipeline kernels
(``native/tpgan_host.cpp``) with transparent numpy fallbacks.

The library is built lazily with g++ on first use and cached; every entry
point degrades to the pure-numpy implementation if the toolchain or
binary is unavailable, so the framework never hard-depends on the native
build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "tpgan_host.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libtpgan_host.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        _SRC, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return _LIB_PATH
    except Exception:
        return None


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _LIB_PATH if os.path.exists(_LIB_PATH) else _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.u8_to_pm1.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.u8_to_unit.argtypes = lib.u8_to_pm1.argtypes
        lib.crop_patch_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.letterbox_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def u8_to_pm1(src: np.ndarray) -> np.ndarray:
    """uint8 -> float32 in [-1, 1] (ToTensor*2-1)."""
    src = np.ascontiguousarray(src, np.uint8)
    lib = load()
    out = np.empty(src.shape, np.float32)
    if lib is None:
        # (2v - 255) / 255 is endpoint-exact (0 -> -1.0, 255 -> 1.0);
        # v * (2/255) - 1 overshoots the top end to 1.0000001
        return (2.0 * src.astype(np.float32) - 255.0) / 255.0
    lib.u8_to_pm1(_u8ptr(src), _fptr(out), src.size)
    return out


def u8_to_unit(src: np.ndarray) -> np.ndarray:
    src = np.ascontiguousarray(src, np.uint8)
    lib = load()
    if lib is None:
        return src.astype(np.float32) / 255.0
    out = np.empty(src.shape, np.float32)
    lib.u8_to_unit(_u8ptr(src), _fptr(out), src.size)
    return out


def crop_patch(img: np.ndarray, center_xy: Tuple[float, float],
               size_wh: Tuple[int, int]) -> np.ndarray:
    """Single landmark-centred zero-padded crop (DataAndDataset.py:46-54
    geometry) from an HWC float32 image."""
    img = np.ascontiguousarray(img, np.float32)
    w, h = size_wh
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable; use data.patches")
    out = np.empty((h, w, img.shape[2]), np.float32)
    lib.crop_patch_f32(
        _fptr(img), img.shape[0], img.shape[1], img.shape[2],
        ctypes.c_float(center_xy[0]), ctypes.c_float(center_xy[1]),
        w, h, _fptr(out),
    )
    return out


def letterbox(src: np.ndarray, size: int):
    """uint8 HWC -> ([0,1] float32 (size,size,C), scale, (pad_l, pad_t))."""
    src = np.ascontiguousarray(src, np.uint8)
    lib = load()
    if lib is None:
        from tpgan_tpu.data.celeba import letterbox as py_letterbox

        return py_letterbox(src, size)
    h, w, c = src.shape
    out = np.empty((size, size, c), np.float32)
    scale = ctypes.c_float()
    pl = ctypes.c_int()
    pt = ctypes.c_int()
    lib.letterbox_u8(
        _u8ptr(src), h, w, c, size, _fptr(out),
        ctypes.byref(scale), ctypes.byref(pl), ctypes.byref(pt),
    )
    return out, float(scale.value), (int(pl.value), int(pt.value))
