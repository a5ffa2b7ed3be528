"""Model bundles: the functional replacement for the reference's hook plumbing.

A bundle pairs a Flax module with its params and exposes:
  - ``apply01(x)``        — logits from a [0,1]-domain input
  - ``apply01_taps(x)``   — (logits, ordered tap list)

Image bundles consume NHWC frame batches ``(N, H, W, C)``; video bundles
consume clips ``(B, C, T, H, W)`` (the artifact-protocol layout) and transpose
to channel-last internally. Feature taps are explicit outputs — the reference
reads them through forward hooks instead (image_attacks.py:273-292,
base_attacks.py:745-756).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import pixel
from ..ops.activations import grad_scaled_relu


@dataclasses.dataclass
class ImageModel:
    """An image backbone + params + the ordered tap keys it exposes."""

    name: str
    module: Any
    params: Any
    tap_keys: tuple = ()

    def apply01(self, frames01_nhwc):
        logits, _ = self.module.apply(self.params, frames01_nhwc)
        if logits is None:
            raise ValueError(
                f"bundle {self.name!r} was built truncated (no classifier "
                "head → logits=None); rebuild with truncate=False")
        return logits

    def apply01_taps(self, frames01_nhwc):
        logits, taps = self.module.apply(self.params, frames01_nhwc)
        return logits, [taps[k] for k in self.tap_keys]


@dataclasses.dataclass
class VideoModel:
    """A video backbone + params. ``module`` maps a [0,1] (B,C,T,H,W) clip to
    (logits, taps-dict)."""

    name: str
    module: Any
    params: Any
    tap_keys: tuple = ()

    def apply01(self, clip01_bcthw):
        logits, _ = self.module.apply(self.params, clip01_bcthw)
        return logits

    def apply01_taps(self, clip01_bcthw):
        logits, taps = self.module.apply(self.params, clip01_bcthw)
        return logits, [taps[k] for k in self.tap_keys]

    def apply_norm(self, clip_norm_bcthw):
        """Forward on an already ImageNet-normalized clip. White-box attacks
        differentiate w.r.t. the normalized input (the reference's gradients
        live there, e.g. base_attacks.py:284-287) and several transforms (DI's
        zero-padding, SIM's 1/2^i scaling) act in that domain."""
        logits, _ = self.module.clone(normalize=False).apply(self.params, clip_norm_bcthw)
        return logits

    def apply_norm_taps(self, clip_norm_bcthw):
        logits, taps = self.module.clone(normalize=False).apply(self.params, clip_norm_bcthw)
        return logits, [taps[k] for k in self.tap_keys]

    def with_relu_grad_scale(self, scale: float) -> "VideoModel":
        """SGM support: rebuild with all non-stem ReLU gradients scaled by
        ``scale`` (replaces the reference's backward hooks,
        base_attacks.py:495-511)."""
        return dataclasses.replace(self, module=self.module.clone(relu_grad_scale=scale))

    def with_taps(self, tap_keys: Sequence[str]) -> "VideoModel":
        return dataclasses.replace(self, tap_keys=tuple(tap_keys))


class TinyVideoNet(nn.Module):
    """Small 3-D CNN standing in for I3D/SlowFast/TPN in engine tests
    (the 'fake backbone' strategy, SURVEY.md §4). Exposes taps 'block1',
    'block2' and honors ``relu_grad_scale`` like the real video models."""

    num_classes: int = 10
    width: int = 8
    relu_grad_scale: float = 1.0
    normalize: bool = True

    def _relu(self, x):
        if self.relu_grad_scale == 1.0:
            return nn.relu(x)
        return grad_scaled_relu(x, self.relu_grad_scale)

    @nn.compact
    def __call__(self, clip01_bcthw):
        x = jnp.transpose(clip01_bcthw, (0, 2, 3, 4, 1))  # → (B,T,H,W,C)
        if self.normalize:
            x = pixel.normalize(x, channel_axis=-1)
        taps = {}
        # stem relu is NOT grad-scaled (reference skips '0.relu',
        # base_attacks.py:510)
        x = nn.relu(nn.Conv(self.width, (3, 3, 3), strides=(1, 2, 2), name="stem")(x))
        x = self._relu(nn.Conv(self.width * 2, (3, 3, 3), strides=(1, 2, 2), name="b1")(x))
        taps["block1"] = x
        # residual block: skip connections are what make SGM's grad scaling
        # change gradient *signs* (paths traverse different ReLU counts)
        x = self._relu(nn.Conv(self.width * 2, (3, 3, 3), name="b2")(x)) + x
        taps["block2"] = x
        x = self._relu(nn.Conv(self.width * 4, (3, 3, 3), strides=(2, 2, 2), name="b3")(x))
        x = jnp.mean(x, axis=(1, 2, 3))
        return nn.Dense(self.num_classes, name="head")(x), taps


def rebind_params(bundle, params):
    """Shallow-rebind a bundle's params (used by jitted attack runners to
    take params as runtime arguments instead of HLO constants). Works on the
    dataclass bundles and on duck-typed test models alike."""
    import copy
    import dataclasses as _dc

    if _dc.is_dataclass(bundle):
        return _dc.replace(bundle, params=params)
    clone = copy.copy(bundle)
    clone.params = params
    return clone


def init_bundle(module, example, name: str, tap_keys=(), seed: int = 0):
    """Initialize params and wrap into the right bundle type by example rank."""
    params = module.init(jax.random.PRNGKey(seed), example)
    cls = VideoModel if example.ndim == 5 else ImageModel
    return cls(name=name, module=module, params=params, tap_keys=tuple(tap_keys))
