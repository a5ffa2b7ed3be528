"""Shared building blocks for the Flax backbones.

Design notes (TPU-first, not a torch translation):
  - NHWC layout everywhere — XLA:TPU's native conv layout (maps onto the MXU).
  - Models take **[0,1]-domain** inputs and apply ImageNet normalization as the
    first affine op (XLA fuses it into the first conv; the checkpoint
    converter can also fold it into the weights outright).
  - Feature taps are explicit return values keyed by depth — the functional
    replacement for the reference's forward hooks (image_attacks.py:273-292).
  - ``truncate=True`` stops compute at the deepest requested tap: the
    reference runs the full network and hooks the middle
    (image_attacks.py:318,334); the taps are identical but the classifier-head
    FLOPs are never spent. This is the single biggest algorithmic speedup of
    the rebuild for feature-loss attacks.
  - BatchNorm does not exist at inference: the torchvision converter folds BN
    running stats into the preceding conv's weights/bias (production-inference
    folding), so ResNet here is conv+bias only.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import pixel


class NormalizeInput(nn.Module):
    """ImageNet mean/std normalization of a [0,1] NHWC input as a model op."""

    @nn.compact
    def __call__(self, x):
        return pixel.normalize(x, channel_axis=-1)


def conv(features: int, kernel: int, stride: int = 1, padding: int = 0, *,
         name: str | None = None, dtype: Any = jnp.float32) -> nn.Conv:
    """2-D conv with torch-style symmetric integer padding and bias."""
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        use_bias=True,
        dtype=dtype,
        name=name,
    )


def max_pool(x, kernel: int, stride: int, padding: int = 0, ceil_mode: bool = False):
    """Max pool matching torch semantics incl. ceil_mode (extra right/bottom
    padding with -inf so the last partial window is kept).

    MEASURED NEGATIVE (round 5): routing the non-overlapping 2×2/s2 case
    (every VGG pool) through reshape+max (``max_pool_hw2``, the spatial
    twin of tpn._pool_t_ceil) to kill the maxpool-backward
    select-and-scatter — 21.5% of the f32 headline step per the trace
    (PERF_PROBE.json trace_ens16_f32_chunk128) — made the whole step 11%
    SLOWER (1.886 vs 2.112 steps/s) and blew the compile up 61 s → 1295 s:
    the h→(h/2,2) reshape fights the (8,128)-tiled NHWC layout and XLA
    re-materializes layouts around it (PERF_PROBE.json
    exec_ens16_f32_chunk128_poolhw2). nn.max_pool stays the default;
    max_pool_hw2 remains for layouts where it wins (tpn's temporal pool
    form does)."""
    h, w = x.shape[1], x.shape[2]
    pad_h = pad_w = (padding, padding)
    if ceil_mode:
        def extra(size):
            rem = (size + 2 * padding - kernel) % stride
            return (stride - rem) % stride if rem else 0
        pad_h = (padding, padding + extra(h))
        pad_w = (padding, padding + extra(w))
    return nn.max_pool(
        x,
        window_shape=(kernel, kernel),
        strides=(stride, stride),
        padding=(pad_h, pad_w),
    )


def max_pool_hw2(x):
    """Non-overlapping 2×2/s2 spatial max via reshape+max (NHWC)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.max(axis=(2, 4))


def collect_tap(taps: dict, want: Sequence[int], depth: int, value) -> None:
    if depth in want:
        taps[depth] = value


def done(want: Sequence[int], taps: dict) -> bool:
    """True when every requested tap has been collected (enables truncation)."""
    return all(d in taps for d in want)
