"""Native (C++) runtime components: fast pixel-gather kernels for the
training batch pipeline. Builds lazily with g++ on first import; all
callers fall back to numpy when the library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "sampler.cpp")
_LIB = os.path.join(_HERE, "libsampler.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_DTYPE_CODE = {
    np.dtype(np.float32): 0,
    np.dtype(np.float16): 1,
    np.dtype(np.uint8): 2,
    np.dtype(np.bool_): 2,
}


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        print(f"[native] sampler build failed ({e}); using numpy fallback")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Return the loaded library, building it if needed; None on failure."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            print(f"[native] sampler load failed ({e}); using numpy fallback")
            _build_failed = True
            return None
        c_i64 = ctypes.c_int64
        c_p = ctypes.c_void_p
        lib.gather_pixels.argtypes = [
            c_p, c_i64, c_i64, c_i64, c_i64, ctypes.c_int, c_p, c_p,
            c_i64, c_i64, c_i64, c_i64, c_p,
        ]
        lib.gather_features_bilinear.argtypes = [
            c_p, c_i64, c_i64, c_i64, c_i64, ctypes.c_int, c_p, c_p,
            c_i64, c_i64, ctypes.c_float, c_p,
        ]
        lib.sampler_num_threads.restype = ctypes.c_int
        _lib = lib
        return _lib


def _as_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def gather_pixels(
    src: np.ndarray, fids: np.ndarray, xys: np.ndarray,
    c_begin: int = 0, c_end: Optional[int] = None,
) -> Optional[np.ndarray]:
    """Gather pixels from a (T,H,W,C) or (T,H,W) array.

    Args:
        fids: (F,) int32 frame ids; xys: (F,P,2) int32 (x, y)
    Returns:
        (F, P, c_end-c_begin) float32, or None if native lib unavailable
    """
    lib = get_lib()
    if lib is None:
        return None
    arr = src
    if arr.ndim == 3:
        arr = arr.reshape(arr.shape + (1,))
    code = _DTYPE_CODE.get(arr.dtype)
    if code is None or not isinstance(arr, np.memmap) and not arr.flags["C_CONTIGUOUS"]:
        return None
    T, H, W, C = arr.shape
    if c_end is None:
        c_end = C
    fids = np.ascontiguousarray(fids, dtype=np.int32)
    xys = np.ascontiguousarray(xys, dtype=np.int32)
    F, P = xys.shape[0], xys.shape[1]
    out = np.empty((F, P, c_end - c_begin), np.float32)
    lib.gather_pixels(
        _as_ptr(arr), T, H, W, C, code, _as_ptr(fids), _as_ptr(xys),
        F, P, c_begin, c_end, _as_ptr(out),
    )
    return out


def gather_features_bilinear(
    src: np.ndarray, fids: np.ndarray, xys: np.ndarray, scale: float
) -> Optional[np.ndarray]:
    """Bilinear-sample (T,Hf,Wf,C) features at xys*scale; (F,P,C) f32."""
    lib = get_lib()
    if lib is None:
        return None
    code = _DTYPE_CODE.get(src.dtype)
    if code is None:
        return None
    T, Hf, Wf, C = src.shape
    fids = np.ascontiguousarray(fids, dtype=np.int32)
    xys = np.ascontiguousarray(xys, dtype=np.int32)
    F, P = xys.shape[0], xys.shape[1]
    out = np.empty((F, P, C), np.float32)
    lib.gather_features_bilinear(
        _as_ptr(src), T, Hf, Wf, C, code, _as_ptr(fids), _as_ptr(xys),
        F, P, ctypes.c_float(scale), _as_ptr(out),
    )
    return out
