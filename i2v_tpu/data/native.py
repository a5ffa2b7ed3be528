"""ctypes bindings for the native C++ decode runtime (native/libi2vio.so)."""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    override = os.environ.get("I2V_TPU_NATIVE_LIB")
    if override:
        return override
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(here, "native", "libi2vio.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.i2v_decode_video.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)), ctypes.POINTER(ctypes.c_int),
    ]
    lib.i2v_decode_video.restype = ctypes.c_int
    lib.i2v_decode_jpeg.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.i2v_decode_jpeg.restype = ctypes.c_int
    lib.i2v_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_video(path: str, width: int = 340, height: int = 256) -> np.ndarray:
    lib = _load()
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = ctypes.c_int(0)
    rc = lib.i2v_decode_video(path.encode(), width, height,
                              ctypes.byref(out), ctypes.byref(n))
    if rc != 0:
        raise RuntimeError(f"i2v_decode_video({path!r}) failed with code {rc}")
    try:
        size = n.value * height * width * 3
        arr = np.ctypeslib.as_array(out, shape=(size,)).reshape(
            n.value, height, width, 3
        ).copy()
    finally:
        lib.i2v_free(out)
    return arr


def decode_jpeg(path: str) -> Optional[np.ndarray]:
    lib = _load()
    out = ctypes.POINTER(ctypes.c_uint8)()
    w, h = ctypes.c_int(0), ctypes.c_int(0)
    rc = lib.i2v_decode_jpeg(path.encode(), ctypes.byref(out),
                             ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    try:
        arr = np.ctypeslib.as_array(out, shape=(h.value * w.value * 3,)).reshape(
            h.value, w.value, 3
        ).copy()
    finally:
        lib.i2v_free(out)
    return arr
