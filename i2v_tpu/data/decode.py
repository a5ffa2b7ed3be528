"""Video/image decode dispatch.

Priority:
  1. the native C++ FFmpeg/libjpeg library (``native/libi2vio.so`` — the
     decord-equivalent, built by ``native/build.sh``; ctypes bindings in
     :mod:`i2v_tpu.data.native`)
  2. ``decord`` if importable (for environments that carry it)
  3. ``.npy``/``.npz`` sidecar files with pre-decoded (T,H,W,C) uint8 frames
     (zero-dependency path; also what the synthetic pipeline emits)

Returns (T, H, W, C) uint8 RGB frames resized to (height, width) when the
backend supports decode-time scaling (reference decord usage:
datasets.py:204-205).
"""

from __future__ import annotations

import os

import numpy as np


def _try_native():
    try:
        from . import native

        return native if native.available() else None
    except Exception:
        return None


def decode_video(path: str, width: int = 340, height: int = 256) -> np.ndarray:
    if path.endswith((".npy", ".npz")):
        return _load_sidecar(path)
    sidecar = path + ".npy"
    nat = _try_native()
    if nat is not None:
        return nat.decode_video(path, width=width, height=height)
    try:
        import decord
    except ImportError:
        decord = None
    if decord is not None:
        try:
            vr = decord.VideoReader(path, width=width, height=height,
                                    num_threads=1)
            return vr.get_batch(range(len(vr))).asnumpy()
        except Exception:
            # a decord decode failure on a corrupt file is recoverable if a
            # pre-decoded sidecar exists — fall through to the sidecar path
            # instead of propagating
            pass
    if os.path.exists(sidecar):
        return _load_sidecar(sidecar)
    raise RuntimeError(
        f"no video decode backend for {path!r}: build native/libi2vio.so "
        "(native/build.sh), install decord, or provide a pre-decoded "
        f"{sidecar!r} sidecar"
    )


def _load_sidecar(path: str) -> np.ndarray:
    if path.endswith(".npz"):
        with np.load(path) as z:
            arr = z[list(z.keys())[0]]
    else:
        arr = np.load(path)
    if arr.ndim != 4 or arr.shape[-1] != 3:
        raise ValueError(f"sidecar {path!r} must be (T,H,W,3) uint8, got {arr.shape}")
    return arr


def decode_jpeg(path: str):
    """Decode one JPEG to a PIL Image (native libjpeg path when available,
    PIL otherwise) — the accimage/PIL dual of the reference
    (dataset_ucf101.py:13-34)."""
    nat = _try_native()
    if nat is not None:
        from PIL import Image

        arr = nat.decode_jpeg(path)
        if arr is not None:
            return Image.fromarray(arr)
    from PIL import Image

    with open(path, "rb") as f:
        with Image.open(f) as img:
            return img.convert("RGB")
