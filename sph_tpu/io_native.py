"""ctypes binding to the native frame encoder (native/sphio.cpp).

Built on demand with `make -C native` (g++ + system zlib); every call site
falls back to the pure-Python encoder in render.py when the toolchain or
library is unavailable, so the native path is an accelerator, never a hard
dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsphio.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.sphio_write_png.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.sphio_write_png.restype = ctypes.c_int
        lib.sphio_write_apng.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.sphio_write_apng.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _as_u8_ptr(arr: np.ndarray):
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def write_png(path: str, rgb: np.ndarray, level: int = 6) -> bool:
    """Native PNG write; returns False if the native path is unavailable."""
    lib = _load()
    if lib is None:
        return False
    h, w, c = rgb.shape
    assert c == 3
    a, ptr = _as_u8_ptr(rgb)
    rc = lib.sphio_write_png(path.encode(), ptr, w, h, level)
    if rc != 0:
        raise IOError(f"sphio_write_png failed with code {rc}")
    return True


def write_apng(
    path: str,
    frames: np.ndarray,
    fps: float = 20.0,
    level: int = 6,
) -> bool:
    """Native animated-PNG write of [N, H, W, 3] uint8 frames."""
    lib = _load()
    if lib is None:
        return False
    n, h, w, c = frames.shape
    assert c == 3
    a, ptr = _as_u8_ptr(frames)
    delay_den = 1000
    delay_num = max(1, int(round(delay_den / fps)))
    rc = lib.sphio_write_apng(
        path.encode(), ptr, n, w, h, delay_num, delay_den, level
    )
    if rc != 0:
        raise IOError(f"sphio_write_apng failed with code {rc}")
    return True
