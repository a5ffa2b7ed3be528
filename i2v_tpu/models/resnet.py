"""Flax ResNet (torchvision-v1 topology) with explicit stage taps.

Reference taps: ``layer{d}[-1]`` forward output, d ∈ {1..4}
(image_attacks.py:260-262) — i.e. the post-residual ReLU of each stage's last
bottleneck, which equals the stage output collected here.

BatchNorm is folded into conv weights by the converter
(see :mod:`i2v_tpu.models.convert`), so blocks are conv+bias.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import NormalizeInput, conv, max_pool


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.relu(conv(self.features, 1, dtype=self.dtype, name="conv1")(x))
        # torchvision v1.5+ puts the stride on the 3x3 conv
        y = nn.relu(conv(self.features, 3, self.stride, 1, dtype=self.dtype, name="conv2")(y))
        y = conv(self.features * 4, 1, dtype=self.dtype, name="conv3")(y)
        if self.downsample:
            residual = conv(self.features * 4, 1, self.stride, dtype=self.dtype, name="downsample")(x)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet-50/101 family. ``taps`` are stage depths (1..4) to expose;
    ``truncate`` skips all compute past the deepest tap."""

    stage_sizes: Sequence[int] = (3, 4, 23, 3)  # ResNet-101
    width: int = 64
    num_classes: int = 1000
    taps: Sequence[int] = ()
    truncate: bool = False
    normalize: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, tap_offset=None):
        # tap_offset: {depth: array} added to the tap activation in-flow —
        # autodiff w.r.t. it at 0 gives exact ∂/∂(tap) (GradCAM support).
        taps = {}
        if self.normalize:
            x = NormalizeInput()(x)
        x = x.astype(self.dtype)
        x = nn.relu(conv(self.width, 7, 2, 3, dtype=self.dtype, name="stem")(x))
        x = max_pool(x, 3, 2, 1)
        deepest = max(self.taps) if self.taps else 5
        for stage in range(4):
            if self.truncate and stage + 1 > deepest:
                return None, taps
            feats = self.width * (2**stage)
            for block in range(self.stage_sizes[stage]):
                first = block == 0
                x = Bottleneck(
                    feats,
                    stride=2 if (first and stage > 0) else 1,
                    downsample=first,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x)
            if tap_offset is not None and stage + 1 in tap_offset:
                x = x + tap_offset[stage + 1]
            if stage + 1 in self.taps:
                taps[stage + 1] = x
        if self.truncate and self.taps:
            return None, taps
        x = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        return logits.astype(jnp.float32), taps


def resnet101(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3), **kw)


def resnet50(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), **kw)


def resnet_tiny(**kw) -> ResNet:
    """2-stage-deep toy variant for engine tests without checkpoints."""
    return ResNet(stage_sizes=(1, 1, 1, 1), width=8, num_classes=10, **kw)
