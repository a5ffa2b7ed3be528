"""Device mesh and sharding helpers.

Axes:
  - ``data``   — clip batch axis (dp)
  - ``frames`` — the flattened B·T frame axis of image-guided attacks (sp);
                 the 512-frame batch at B=16×T=32 shards perfectly over 8
                 cores (SURVEY.md §2 'TPU-native equivalents')

The I2V feature losses are per-frame, so an attack step sharded over
('data','frames') is embarrassingly parallel up to the scalar-cost psum; the
AENS per-tap reductions add one small cross-shard reduce per step. XLA
inserts these collectives from the sharding annotations — nothing manual.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def attack_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    frames: Optional[int] = None,
) -> Mesh:
    """Build a ('data','frames') mesh over the given (default: all) devices.

    With no explicit sizes, splits the device count into the most-square
    (data, frames) factorization, biased toward the frame axis (frame count
    B·T is always ≥ batch count, so it shards further).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None and frames is None:
        data = 1
        for d in range(int(math.isqrt(n)), 0, -1):
            if n % d == 0:
                data = d
                break
        frames = n // data
    elif data is None:
        data = n // frames
    elif frames is None:
        frames = n // data
    if data * frames != n:
        raise ValueError(f"data({data})×frames({frames}) != devices({n})")
    dev_array = np.asarray(devices).reshape(data, frames)
    return Mesh(dev_array, ("data", "frames"))


def clip_sharding(mesh: Mesh) -> NamedSharding:
    """(B, C, T, H, W) clips: batch over 'data'."""
    return NamedSharding(mesh, P("data"))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """(B·T, H, W, C) frame batches: frame axis over both mesh axes."""
    return NamedSharding(mesh, P(("data", "frames")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_clips(batch, mesh: Mesh):
    """Device-put a host clip batch with the canonical clip sharding."""
    return jax.device_put(batch, clip_sharding(mesh))
