"""Flax ViT-B/16 (timm `vit_base_patch16_224` topology).

Equivalent of the reference's ``get_vits`` loader (TPAMI_attack.py:88-98) —
defined there but unused by shipped attack paths; provided for zoo parity.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import NormalizeInput


class MHSA(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, d = x.shape
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, d // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhc,bmhc->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        attn = nn.softmax(attn / jnp.sqrt(d / self.heads), axis=-1)
        y = jnp.einsum("bhnm,bmhc->bnhc", attn.astype(v.dtype), v,
                       preferred_element_type=jnp.float32)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(
            y.reshape(b, n, d).astype(x.dtype))


class Block(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(name="norm1")(x)
        x = x + MHSA(self.dim, self.heads, dtype=self.dtype, name="attn")(y)
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return x + y


class ViT(nn.Module):
    patch: int = 16
    img_size: int = 224          # canonical pos_embed resolution
    dim: int = 768
    depth: int = 12
    heads: int = 12
    num_classes: int = 1000
    taps: Sequence[int] = ()     # block indices 0..depth-1
    truncate: bool = False       # skip all blocks past the deepest tap
    normalize: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, tap_offset=None):
        # tap_offset: {block_idx: array} added to the tap activation in-flow
        # (GradCAM support, same contract as resnet.py)
        taps = {}
        if self.normalize:
            x = NormalizeInput()(x)
        x = x.astype(self.dtype)
        b = x.shape[0]
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), dtype=self.dtype,
                    name="patch_embed")(x)
        x = x.reshape(b, -1, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.tile(cls.astype(x.dtype), (b, 1, 1)), x], axis=1)
        # the param's shape is fixed by the module config (timm checkpoint
        # layout), NOT by the input — flax validates param shapes at apply,
        # so an input-derived shape would make any non-canonical resolution
        # a ScopeParamShapeError instead of a resize
        n0 = (self.img_size // self.patch) ** 2 + 1
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n0, self.dim))
        if pos.shape[1] != x.shape[1]:
            # resolution-agnostic apply: the learned embedding is sized at
            # init resolution; bilinearly resize its grid part (timm-style
            # resize_pos_embed) so a bundle initialized at one input size
            # doesn't crash on another (the conv backbones are naturally
            # resolution-independent; this keeps vit at parity)
            g = int(round((pos.shape[1] - 1) ** 0.5))
            n = int(round((x.shape[1] - 1) ** 0.5))
            grid = jax.image.resize(
                pos[:, 1:].reshape(1, g, g, self.dim),
                (1, n, n, self.dim), "bilinear").reshape(1, n * n, self.dim)
            pos = jnp.concatenate([pos[:, :1], grid], axis=1)
        x = x + pos.astype(x.dtype)
        deepest = max(self.taps) if self.taps else None
        for i in range(self.depth):
            x = Block(self.dim, self.heads, dtype=self.dtype, name=f"block{i}")(x)
            if tap_offset is not None and i in tap_offset:
                x = x + tap_offset[i]
            taps[i] = x
            if self.truncate and deepest is not None and i >= deepest:
                return None, taps
        x = nn.LayerNorm(name="norm")(x)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x[:, 0])
        return logits.astype(jnp.float32), taps


def vit_base_patch16_224(**kw) -> ViT:
    return ViT(**kw)


def vit_tiny(**kw) -> ViT:
    return ViT(patch=8, img_size=32, dim=32, depth=2, heads=4,
               num_classes=10, **kw)
