"""Temporal Pyramid Network (gluoncv `tpn_resnet{50,101}_f32s2_kinetics400`).

Backbone: slow-only inflated ResNet exposing ``layer1..layer4`` attributes —
the reference taps model.layer1/layer2 (base_attacks.py:743,
image_attacks.py:519). Stem Conv3d (1,7,7); temporal (3,1,1) conv1 kernels in
stages 3-4 (SlowOnly convention); no temporal downsampling in the backbone.

Neck (TPN, Yang et al. 2020): features from layer3 + layer4 →
  spatial modulation (stride-2 convs to align spatial sizes) →
  temporal rate modulation (temporal max-pool per level) →
  top-down + bottom-up information flow (stride/upsample convs) →
  level fusion (concat → 1×1 conv) → head fc(400).
The training-only auxiliary CE head is omitted (inference/attack framework).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .video_common import ReluMixin, conv3d, max_pool3d, to_channel_last


class TPNBottleneck(nn.Module, ReluMixin):
    features: int
    spatial_stride: int = 1
    temporal_kernel: int = 1
    downsample: bool = False
    relu_grad_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        st = (1, self.spatial_stride, self.spatial_stride)
        y = self._relu(conv3d(self.features, (self.temporal_kernel, 1, 1),
                              dtype=self.dtype, name="conv1")(x))
        y = self._relu(conv3d(self.features, (1, 3, 3), st, dtype=self.dtype,
                              name="conv2")(y))
        y = conv3d(self.features * 4, (1, 1, 1), dtype=self.dtype, name="conv3")(y)
        if self.downsample:
            residual = conv3d(self.features * 4, (1, 1, 1), st, dtype=self.dtype,
                              name="downsample")(x)
        return self._relu(y + residual)


class TPN(nn.Module, ReluMixin):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    num_classes: int = 400
    neck_channels: int = 1024
    temporal_stages: Sequence[int] = (2, 3)  # (3,1,1) conv1 kernels here
    relu_grad_scale: float = 1.0
    normalize: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, clip01_bcthw):
        x = to_channel_last(clip01_bcthw, self.normalize, self.dtype)
        taps: dict = {}
        # stem + neck ReLUs unscaled; block-0 ReLUs unscaled — mirrors the
        # reference SGM's name-filtered hooks ('relu' in name and not
        # '0.relu', base_attacks.py:509-511)
        x = nn.relu(conv3d(self.width, (1, 7, 7), (1, 2, 2), dtype=self.dtype,
                           name="conv1")(x))
        x = max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        feats_out = []
        for stage in range(4):
            feats = self.width * (2**stage)
            tk = 3 if stage in self.temporal_stages else 1
            for block in range(self.stage_sizes[stage]):
                first = block == 0
                x = TPNBottleneck(
                    feats,
                    spatial_stride=2 if (first and stage > 0) else 1,
                    temporal_kernel=tk,
                    downsample=first,
                    relu_grad_scale=1.0 if first else self.relu_grad_scale,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x)
            taps[f"layer{stage + 1}"] = x
            feats_out.append(x)

        # ---- TPN neck over layer3 (fine) and layer4 (coarse) ----
        c = self.neck_channels
        fine, coarse = feats_out[2], feats_out[3]
        # spatial modulation: align fine level to coarse spatial size
        fine = nn.relu(conv3d(c, (1, 3, 3), (1, 2, 2), dtype=self.dtype,
                              name="spatial_mod_0")(fine))
        coarse = nn.relu(conv3d(c, (1, 1, 1), dtype=self.dtype,
                                name="spatial_mod_1")(coarse))
        # temporal rate modulation: coarse level pooled 2× in time
        t = fine.shape[1]
        coarse = max_pool3d(coarse, (2, 1, 1), (2, 1, 1)) if t > 1 else coarse
        # top-down flow: nearest-upsample coarse in time (gather handles
        # non-divisible T, e.g. odd clip lengths), add to fine
        idx = (jnp.arange(fine.shape[1]) * coarse.shape[1]) // fine.shape[1]
        fine = fine + coarse[:, idx]
        # bottom-up flow: downsample fine, add to coarse
        down = max_pool3d(fine, (2, 1, 1), (2, 1, 1)) if t > 1 else fine
        coarse = coarse + down[:, :coarse.shape[1]]
        # level fusion
        pooled = jnp.concatenate(
            [jnp.mean(fine, axis=(1, 2, 3)), jnp.mean(coarse, axis=(1, 2, 3))],
            axis=-1)
        fused = nn.relu(nn.Dense(2048, dtype=self.dtype, name="fusion")(pooled))
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(fused)
        return logits.astype(jnp.float32), taps


def tpn_resnet50(**kw) -> TPN:
    return TPN(stage_sizes=(3, 4, 6, 3), **kw)


def tpn_resnet101(**kw) -> TPN:
    return TPN(stage_sizes=(3, 4, 23, 3), **kw)


def tpn_tiny(**kw) -> TPN:
    # stage 2 has two blocks: SGM scaling skips block 0
    return TPN(stage_sizes=(1, 2, 1, 1), width=8, neck_channels=32,
               num_classes=10, **kw)
