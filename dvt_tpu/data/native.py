"""ctypes bindings for the native host pipeline (native/dvt_host.cpp).

Auto-builds the shared library on first use (make in native/), with a
graceful fallback to the PIL path in data/single_image.py when the toolchain
or libjpeg is unavailable. The C++ resize implements the same pillow-style
antialiased bicubic as ops/resample.py's AA matrices, so both paths agree.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libdvt_host.so"))
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.dvt_load_image.restype = ctypes.c_int
    lib.dvt_load_image.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.dvt_load_batch.restype = None
    lib.dvt_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.dvt_resize_bicubic.restype = None
    lib.dvt_resize_bicubic.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load_image_native(path: str, out_hw: Tuple[int, int], mean, std
                      ) -> Optional[np.ndarray]:
    """JPEG decode + resize + normalize in C++. None if unsupported."""
    lib = get_lib()
    if lib is None or not path.lower().endswith((".jpg", ".jpeg")):
        return None
    out = np.empty((out_hw[0], out_hw[1], 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    rc = lib.dvt_load_image(
        path.encode(), out_hw[0], out_hw[1], _fptr(mean), _fptr(std), _fptr(out)
    )
    return out if rc == 0 else None


def load_batch_native(paths: Sequence[str], out_hw: Tuple[int, int], mean, std
                      ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Threaded batch load; returns (batch (N,H,W,3), status (N,)) or None."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, out_hw[0], out_hw[1], 3), np.float32)
    status = np.empty(n, np.int32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.dvt_load_batch(
        arr, n, out_hw[0], out_hw[1], _fptr(mean), _fptr(std), _fptr(out),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, status


def resize_bicubic_native(img_u8: np.ndarray, out_hw: Tuple[int, int]
                          ) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    h, w = img_u8.shape[:2]
    out = np.empty((out_hw[0], out_hw[1], 3), np.float32)
    lib.dvt_resize_bicubic(
        img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h, w,
        _fptr(out), out_hw[0], out_hw[1],
    )
    return out
