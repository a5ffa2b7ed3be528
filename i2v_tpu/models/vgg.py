"""Flax VGG-16 / AlexNet / SqueezeNet-1.1 with taps keyed by torchvision
feature index, so the reference's depth→layer tables port verbatim
(image_attacks.py:260-271):

  vgg16      depth→index {1:1, 2:11, 3:20, 4:29}   (ReLU outputs)
  alexnet    depth→index {1:1, 2:4,  3:7,  4:11}   (ReLU outputs)
  squeezenet depth→index {1:3, 2:6,  3:9,  4:12}   (Fire expand3x3 ReLU)
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import NormalizeInput, conv, max_pool

# VGG-16 features: channel count per conv, 'M' = maxpool. Index arithmetic
# matches torchvision (conv,relu pairs then pool).
_VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M")


class VGG16(nn.Module):
    num_classes: int = 1000
    taps: Sequence[int] = ()       # torchvision feature indices (ReLU outputs)
    truncate: bool = False
    normalize: bool = True
    width_mult: float = 1.0        # <1 for tiny test variants
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, tap_offset=None):
        taps = {}
        if self.normalize:
            x = NormalizeInput()(x)
        x = x.astype(self.dtype)
        deepest = max(self.taps) if self.taps else 10**9
        idx = 0
        for item in _VGG16_CFG:
            if self.truncate and idx > deepest:
                return None, taps
            if item == "M":
                x = max_pool(x, 2, 2)
                idx += 1
            else:
                ch = max(1, int(item * self.width_mult))
                x = conv(ch, 3, 1, 1, dtype=self.dtype, name=f"conv{idx}")(x)
                idx += 1  # conv
                x = nn.relu(x)
                if tap_offset is not None and idx in tap_offset:
                    x = x + tap_offset[idx]
                if idx in self.taps:
                    taps[idx] = x
                idx += 1  # relu
        if self.truncate and self.taps:
            return None, taps
        # torchvision head: adaptive avgpool to 7x7 → 4096 MLP. Inputs here are
        # always 224² (pool output already 7×7), so plain flatten suffices.
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc2")(x))
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc3")(x)
        return logits.astype(jnp.float32), taps


class AlexNet(nn.Module):
    num_classes: int = 1000
    taps: Sequence[int] = ()
    truncate: bool = False
    normalize: bool = True
    width_mult: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, tap_offset=None):
        taps = {}
        if self.normalize:
            x = NormalizeInput()(x)
        x = x.astype(self.dtype)

        def w(ch):
            return max(1, int(ch * self.width_mult))

        deepest = max(self.taps) if self.taps else 10**9
        # (features-index-of-conv, ch, kernel, stride, pad, pool-after?)
        plan = [(0, 64, 11, 4, 2, True), (3, 192, 5, 1, 2, True),
                (6, 384, 3, 1, 1, False), (8, 256, 3, 1, 1, False),
                (10, 256, 3, 1, 1, True)]
        for conv_idx, ch, k, s, p, pool_after in plan:
            if self.truncate and conv_idx > deepest:
                return None, taps
            x = nn.relu(conv(w(ch), k, s, p, dtype=self.dtype, name=f"conv{conv_idx}")(x))
            if tap_offset is not None and conv_idx + 1 in tap_offset:
                x = x + tap_offset[conv_idx + 1]
            if conv_idx + 1 in self.taps:
                taps[conv_idx + 1] = x
            if pool_after:
                x = max_pool(x, 3, 2)
        if self.truncate and self.taps:
            return None, taps
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc2")(x))
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc3")(x)
        return logits.astype(jnp.float32), taps


class Fire(nn.Module):
    squeeze: int
    expand: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, offset=None, offset_on_concat=False):
        """Returns (concat output, expand3x3 ReLU) — the second value is the
        reference's scalar-depth SqueezeNet tap (``expand3x3_activation``).
        ``offset`` is added in-flow to whichever tensor is the tap (GradCAM
        ∂/∂tap support): e3 by default, the concat when ``offset_on_concat``
        (list-depth/AENS Fire-module taps)."""
        s = nn.relu(conv(self.squeeze, 1, dtype=self.dtype, name="squeeze")(x))
        e1 = nn.relu(conv(self.expand, 1, dtype=self.dtype, name="expand1x1")(s))
        e3 = nn.relu(conv(self.expand, 3, 1, 1, dtype=self.dtype, name="expand3x3")(s))
        if offset is not None and not offset_on_concat:
            e3 = e3 + offset
        out = jnp.concatenate([e1, e3], axis=-1)
        if offset is not None and offset_on_concat:
            out = out + offset
        return out, e3


class SqueezeNet11(nn.Module):
    """``fire_taps=False`` (scalar-depth attacks) taps the expand3x3 ReLU —
    the reference's ``features[idx].expand3x3_activation`` hook
    (image_attacks.py:268-271). ``fire_taps=True`` (AENS list-depth) taps the
    whole Fire module output, concat(e1,e3) with 2x channels — the reference
    hooks ``features[idx]`` itself for list depths (TPAMI_attack.py:197-200).
    """

    num_classes: int = 1000
    taps: Sequence[int] = ()       # feature indices of Fire modules
    truncate: bool = False
    normalize: bool = True
    width_mult: float = 1.0
    fire_taps: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, tap_offset=None):
        taps = {}
        if self.normalize:
            x = NormalizeInput()(x)
        x = x.astype(self.dtype)

        def w(ch):
            return max(1, int(ch * self.width_mult))

        deepest = max(self.taps) if self.taps else 10**9
        x = nn.relu(conv(w(64), 3, 2, dtype=self.dtype, name="conv0")(x))
        x = max_pool(x, 3, 2, ceil_mode=True)
        # (feature index, squeeze ch, expand ch, pool-before?)
        plan = [(3, 16, 64, False), (4, 16, 64, False),
                (6, 32, 128, True), (7, 32, 128, False),
                (9, 48, 192, True), (10, 48, 192, False),
                (11, 64, 256, False), (12, 64, 256, False)]
        for idx, sq, ex, pool_before in plan:
            if self.truncate and idx > deepest:
                return None, taps
            if pool_before:
                x = max_pool(x, 3, 2, ceil_mode=True)
            off = tap_offset.get(idx) if tap_offset is not None else None
            x, e3 = Fire(w(sq), w(ex), dtype=self.dtype, name=f"fire{idx}")(
                x, off, offset_on_concat=self.fire_taps)
            if idx in self.taps:
                taps[idx] = x if self.fire_taps else e3
        if self.truncate and self.taps:
            return None, taps
        x = conv(self.num_classes, 1, dtype=self.dtype, name="classifier")(x)
        x = nn.relu(x)
        logits = jnp.mean(x, axis=(1, 2))
        return logits.astype(jnp.float32), taps
