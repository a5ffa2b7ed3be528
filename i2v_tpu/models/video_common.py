"""Shared blocks for the 3-D video backbones (I3D / SlowFast / TPN).

Layout: clips enter as (B, C, T, H, W) in [0,1] (the artifact-protocol
layout) and are transposed once to channel-last (B, T, H, W, C) — XLA:TPU's
native conv layout. BatchNorm is folded into conv weights by the checkpoint
converter (inference-only framework), so blocks are conv+bias.

``relu_grad_scale`` threads SGM's γ^0.5 backward scaling through every
non-stem ReLU via the custom-VJP activation (replacing the reference's
backward hooks, base_attacks.py:495-511).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.activations import grad_scaled_relu
from ..ops.pixel import normalize


def conv3d(features: int, kernel: Sequence[int], stride: Sequence[int] = (1, 1, 1),
           padding: Sequence[int] | None = None, *, groups: int = 1,
           name: str | None = None, dtype: Any = jnp.float32) -> nn.Conv:
    """3-D conv with torch-style symmetric integer padding ((k-1)//2 default)."""
    if padding is None:
        padding = tuple((k - 1) // 2 for k in kernel)
    return nn.Conv(
        features, tuple(kernel), strides=tuple(stride),
        padding=tuple((p, p) for p in padding), use_bias=True,
        feature_group_count=groups, dtype=dtype, name=name,
    )


def max_pool3d(x, kernel: Sequence[int], stride: Sequence[int],
               padding: Sequence[int] = (0, 0, 0)):
    return nn.max_pool(
        x, window_shape=tuple(kernel), strides=tuple(stride),
        padding=tuple((p, p) for p in padding),
    )


def max_pool_hw2(x):
    """Non-overlapping (1,2,2) max-pool via reshape+max.

    Equivalent to torch MaxPool3d((1,2,2),(1,2,2)) (floor mode: trailing odd
    row/col dropped), but its gradient is an elementwise eq-mask instead of
    the select-and-scatter nn.max_pool lowers to — which is what makes
    backward passes through pooled branches fast on TPU."""
    b, t, h, w, c = x.shape
    x = x[:, :, : h // 2 * 2, : w // 2 * 2]
    return x.reshape(b, t, h // 2, 2, w // 2, 2, c).max(axis=(3, 5))


class ReluMixin:
    """Mixin providing the (optionally grad-scaled) ReLU."""

    def _relu(self, x):
        scale = getattr(self, "relu_grad_scale", 1.0)
        if scale == 1.0:
            return nn.relu(x)
        return grad_scaled_relu(x, scale)


class Bottleneck3D(nn.Module, ReluMixin):
    """Inflated bottleneck. ``inflate`` selects the '3x1x1' style: a (3,1,1)
    temporal kernel on the first 1×1 conv (mmaction/gluoncv I3D convention);
    non-inflated blocks are purely spatial."""

    features: int
    spatial_stride: int = 1
    temporal_stride: int = 1
    downsample: bool = False
    inflate: bool = True
    relu_grad_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        k1 = (3, 1, 1) if self.inflate else (1, 1, 1)
        st = (self.temporal_stride, self.spatial_stride, self.spatial_stride)
        y = self._relu(conv3d(self.features, k1, dtype=self.dtype, name="conv1")(x))
        y = self._relu(conv3d(self.features, (1, 3, 3), st, dtype=self.dtype,
                              name="conv2")(y))
        y = conv3d(self.features * 4, (1, 1, 1), dtype=self.dtype, name="conv3")(y)
        if self.downsample:
            residual = conv3d(self.features * 4, (1, 1, 1), st, dtype=self.dtype,
                              name="downsample")(x)
        return self._relu(y + residual)


class NonLocal3D(nn.Module, ReluMixin):
    """Non-local block (the 'nl' in i3d_nl5):
    out = x + W_z·BN(A(θ(x), φ(x))·g(x)). θ/φ/g project to C/2.

    Structure follows the mmaction lineage the gluoncv checkpoints descend
    from: ``sub_sample`` max-pools the φ/g feature maps (1,2,2) AFTER their
    1×1×1 convs (the NL paper's "subsampling trick", on by default in the
    released Kinetics models); ``nl_type`` picks embedded-gaussian softmax
    ('gaussian') or 1/N dot-product ('dot') attention. Both knobs are
    parameter-free, so a real checkpoint cannot disambiguate them —
    convert_gluoncv --verify --gluoncv-cfg reports any logit drift and the
    knobs flip without re-conversion.

    Attention is one batched matmul pair over the flattened (T·H·W) token
    axis — MXU-friendly by construction.
    """

    channels: int
    sub_sample: bool = True
    nl_type: str = "gaussian"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        inter = self.channels // 2
        theta = conv3d(inter, (1, 1, 1), dtype=self.dtype, name="theta")(x)
        phi = conv3d(inter, (1, 1, 1), dtype=self.dtype, name="phi")(x)
        g = conv3d(inter, (1, 1, 1), dtype=self.dtype, name="g")(x)
        if self.sub_sample:
            phi = max_pool_hw2(phi)
            g = max_pool_hw2(g)
        n = t * h * w
        m = phi.shape[1] * phi.shape[2] * phi.shape[3]
        theta = theta.reshape(b, n, inter)
        phi = phi.reshape(b, m, inter)
        g = g.reshape(b, m, inter)
        attn = jnp.einsum("bnc,bmc->bnm", theta, phi,
                          preferred_element_type=jnp.float32)
        if self.nl_type == "gaussian":
            attn = nn.softmax(attn, axis=-1)
        elif self.nl_type == "dot":
            attn = attn / m
        else:
            raise ValueError(f"unknown nl_type {self.nl_type!r}")
        y = jnp.einsum("bnm,bmc->bnc", attn.astype(g.dtype), g,
                       preferred_element_type=jnp.float32)
        y = y.reshape(b, t, h, w, inter).astype(x.dtype)
        y = conv3d(self.channels, (1, 1, 1), dtype=self.dtype, name="out")(y)
        return x + y


def to_channel_last(clip01_bcthw, do_normalize: bool = True, dtype=jnp.float32):
    x = jnp.transpose(clip01_bcthw, (0, 2, 3, 4, 1))
    if do_normalize:
        x = normalize(x, channel_axis=-1)
    return x.astype(dtype)
