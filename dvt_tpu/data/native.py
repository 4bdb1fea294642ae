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
    for attempt in range(2):
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        try:
            _bind(lib)
        except AttributeError:
            # stale prebuilt .so missing newer symbols: rebuild once from
            # source and retry, else keep the graceful-fallback contract
            if attempt == 0 and _build():
                continue
            return None
        _lib = lib
        return _lib
    return None


def _bind(lib: ctypes.CDLL) -> None:
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
    lib.dvt_load_npy_batch.restype = None
    lib.dvt_load_npy_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.dvt_load_paired_batch.restype = None
    lib.dvt_load_paired_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int),
    ]


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


def load_npy_batch_native(paths: Sequence[str], feat_shape: Tuple[int, ...]
                          ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Batch .npy (<f4/<f2, C-order) -> (N, *feat_shape) f32 + status."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    elems = int(np.prod(feat_shape))
    out = np.empty((n,) + tuple(feat_shape), np.float32)
    status = np.empty(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.dvt_load_npy_batch(
        arr, n, _fptr(out), elems,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, status


def load_paired_batch_native(
    img_paths: Sequence[str],
    raw_paths: Sequence[str],
    den_paths: Sequence[str],
    out_hw: Tuple[int, int],
    mean,
    std,
    feat_shape: Tuple[int, ...],
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Stage-2 sample batch fully in C++ (one OpenMP region, GIL released):
    JPEG decode + AA-bicubic resize + normalize per image, plus its
    (raw, denoised) .npy feature files. Returns (imgs, raw, den, status)
    or None when the library / a non-JPEG input rules the fast path out."""
    lib = get_lib()
    if lib is None or not all(
        p.lower().endswith((".jpg", ".jpeg")) for p in img_paths
    ):
        return None
    n = len(img_paths)
    elems = int(np.prod(feat_shape))
    imgs = np.empty((n, out_hw[0], out_hw[1], 3), np.float32)
    raw = np.empty((n,) + tuple(feat_shape), np.float32)
    den = np.empty((n,) + tuple(feat_shape), np.float32)
    status = np.empty(n, np.int32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    ip = (ctypes.c_char_p * n)(*[p.encode() for p in img_paths])
    rp = (ctypes.c_char_p * n)(*[p.encode() for p in raw_paths])
    dp = (ctypes.c_char_p * n)(*[p.encode() for p in den_paths])
    lib.dvt_load_paired_batch(
        ip, rp, dp, n, out_hw[0], out_hw[1], _fptr(mean), _fptr(std),
        _fptr(imgs), _fptr(raw), _fptr(den), elems,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return imgs, raw, den, status


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
