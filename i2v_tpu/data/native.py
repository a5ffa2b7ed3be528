"""ctypes bindings for the native C++ decode runtime (native/libi2vio.so)."""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_HAS_BATCH = False  # batch entry points present in the loaded library


def _lib_path() -> str:
    override = os.environ.get("I2V_TPU_NATIVE_LIB")
    if override:
        return override
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(here, "native", "libi2vio.so")


def _autobuild(path: str) -> bool:
    """Build libi2vio.so from source on first use. The library is an
    intentionally untracked build artifact (ADVICE r4: the committed binary
    risked going stale against its source), so a fresh checkout must
    self-build; build.sh is a one-liner g++ invocation (~2 s)."""
    build = os.path.join(os.path.dirname(path), "build.sh")
    if not os.path.exists(build):
        return False
    import subprocess
    try:
        subprocess.run(["sh", build], capture_output=True, timeout=120,
                       check=True)
    except (OSError, subprocess.SubprocessError):
        return False
    return os.path.exists(path)


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        # explicit override (I2V_TPU_NATIVE_LIB) missing: the caller asked
        # for a specific binary — don't silently substitute a fresh build
        if os.environ.get("I2V_TPU_NATIVE_LIB") or not _autobuild(path):
            return None
    try:
        lib = ctypes.CDLL(path)
        lib.i2v_decode_video.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.i2v_decode_video.restype = ctypes.c_int
        lib.i2v_decode_jpeg.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.i2v_decode_jpeg.restype = ctypes.c_int
        lib.i2v_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    except (OSError, AttributeError):
        # stale/partial libi2vio.so missing the core symbols: treat the
        # native backend as unavailable instead of raising on first use
        return None
    try:  # batch entry points: absent in pre-pool builds of the library
        u8pp = ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))
        intp = ctypes.POINTER(ctypes.c_int)
        lib.i2v_decode_videos.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, u8pp, intp, intp,
        ]
        lib.i2v_decode_videos.restype = ctypes.c_int
        lib.i2v_decode_jpegs.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            u8pp, intp, intp, intp,
        ]
        lib.i2v_decode_jpegs.restype = ctypes.c_int
        global _HAS_BATCH
        _HAS_BATCH = True
    except AttributeError:
        pass
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _maybe(fn, *args):
    try:
        return fn(*args)
    except RuntimeError:
        return None


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


def decode_videos(paths: list, width: int = 340, height: int = 256,
                  threads: int = 0) -> list:
    """Decode a batch of videos on the native thread pool (one GIL-free call).
    Returns per-path (T,H,W,3) uint8 arrays, None where decode failed."""
    lib = _load()
    n = len(paths)
    if n == 0:
        return []
    if not _HAS_BATCH:  # pre-pool library build: decode sequentially
        return [_maybe(decode_video, p, width, height) for p in paths]
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    outs = (ctypes.POINTER(ctypes.c_uint8) * n)()
    n_frames = (ctypes.c_int * n)()
    rcs = (ctypes.c_int * n)()
    lib.i2v_decode_videos(c_paths, n, width, height, threads,
                          outs, n_frames, rcs)
    results = []
    for i in range(n):
        if rcs[i] != 0 or not outs[i]:
            results.append(None)
            continue
        try:
            size = n_frames[i] * height * width * 3
            results.append(
                np.ctypeslib.as_array(outs[i], shape=(size,))
                .reshape(n_frames[i], height, width, 3).copy()
            )
        finally:
            lib.i2v_free(outs[i])
    return results


def decode_jpegs(paths: list, threads: int = 0) -> list:
    """Decode a batch of JPEGs on the native thread pool. Returns per-path
    (H,W,3) uint8 arrays, None where decode failed."""
    lib = _load()
    n = len(paths)
    if n == 0:
        return []
    if not _HAS_BATCH:  # pre-pool library build: decode sequentially
        return [decode_jpeg(p) for p in paths]
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    outs = (ctypes.POINTER(ctypes.c_uint8) * n)()
    ws = (ctypes.c_int * n)()
    hs = (ctypes.c_int * n)()
    rcs = (ctypes.c_int * n)()
    lib.i2v_decode_jpegs(c_paths, n, threads, outs, ws, hs, rcs)
    results = []
    for i in range(n):
        if rcs[i] != 0 or not outs[i]:
            results.append(None)
            continue
        try:
            results.append(
                np.ctypeslib.as_array(outs[i], shape=(hs[i] * ws[i] * 3,))
                .reshape(hs[i], ws[i], 3).copy()
            )
        finally:
            lib.i2v_free(outs[i])
    return results


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
