"""Flax DenseNet-161 (torchvision topology).

In the reference zoo (image_attacks.py:96-99) and GradCAM layer finders
(image_cam_utils.py) but never tapped by shipped attacks. DenseNet is
pre-activation (BN→ReLU→conv), so BN cannot fold into an adjacent conv —
it stays as a frozen affine (converter precomputes scale/bias from the
running stats).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import NormalizeInput, conv, max_pool


class FrozenBN(nn.Module):
    """Inference BN as an affine: y = x·scale + bias (params precomputed by
    the converter as γ/√(σ²+ε) and β−μ·scale)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class DenseLayer(nn.Module):
    growth: int
    bn_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = nn.relu(FrozenBN(c, name="norm1")(x))
        y = conv(self.bn_size * self.growth, 1, dtype=self.dtype, name="conv1")(y)
        y = nn.relu(FrozenBN(self.bn_size * self.growth, name="norm2")(y))
        y = conv(self.growth, 3, 1, 1, dtype=self.dtype, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class Transition(nn.Module):
    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.relu(FrozenBN(x.shape[-1], name="norm")(x))
        y = conv(self.out_features, 1, dtype=self.dtype, name="conv")(y)
        return nn.avg_pool(y, (2, 2), (2, 2))


class DenseNet(nn.Module):
    block_config: Sequence[int] = (6, 12, 36, 24)  # densenet161
    growth: int = 48
    init_features: int = 96
    num_classes: int = 1000
    taps: Sequence[int] = ()     # dense-block indices 1..4
    truncate: bool = False       # skip all compute past the deepest tap
    normalize: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, tap_offset=None):
        # tap_offset: {depth: array} added to the tap activation in-flow —
        # autodiff w.r.t. it at 0 gives exact ∂/∂(tap) (GradCAM support,
        # same contract as resnet.py)
        taps = {}
        if self.normalize:
            x = NormalizeInput()(x)
        x = x.astype(self.dtype)
        x = conv(self.init_features, 7, 2, 3, dtype=self.dtype, name="conv0")(x)
        x = nn.relu(FrozenBN(self.init_features, name="norm0")(x))
        x = max_pool(x, 3, 2, 1)
        feats = self.init_features
        deepest = max(self.taps) if self.taps else None
        for i, layers in enumerate(self.block_config):
            for j in range(layers):
                x = DenseLayer(self.growth, dtype=self.dtype,
                               name=f"denseblock{i + 1}_layer{j + 1}")(x)
            feats += layers * self.growth
            if tap_offset is not None and i + 1 in tap_offset:
                x = x + tap_offset[i + 1]
            taps[i + 1] = x
            if self.truncate and deepest is not None and i + 1 >= deepest:
                return None, taps
            if i + 1 < len(self.block_config):
                feats //= 2
                x = Transition(feats, dtype=self.dtype,
                               name=f"transition{i + 1}")(x)
        x = nn.relu(FrozenBN(feats, name="norm5")(x))
        x = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(x)
        return logits.astype(jnp.float32), taps


def densenet161(**kw) -> DenseNet:
    return DenseNet(**kw)


def densenet_tiny(**kw) -> DenseNet:
    return DenseNet(block_config=(2, 2), growth=8, init_features=16,
                    num_classes=10, **kw)
