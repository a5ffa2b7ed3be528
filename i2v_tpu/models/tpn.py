"""Temporal Pyramid Network (gluoncv `tpn_resnet{50,101}_f32s2_kinetics400`).

Backbone: slow-only inflated ResNet exposing ``layer1..layer4`` attributes —
the reference taps model.layer1/layer2 (base_attacks.py:743,
image_attacks.py:519). Stem Conv3d (1,7,7); temporal (3,1,1) conv1 kernels in
stages 3-4 (SlowOnly convention); no temporal downsampling in the backbone.

Neck (TPN, Yang et al. 2020) — structured to match the gluoncv/TPN-repo
module graph so real checkpoints convert parameter-for-parameter
(tools/convert_gluoncv.convert_tpn), over the two pyramid levels
layer3 (C=16w) and layer4 (C=32w):

  spatial modulation   level-0: ConvModule (1,3,3)/(1,2,2) 16w→32w;
                       level-1: identity
  temporal modulation  per level: grouped conv (3,1,1) groups=32 32w→16w
                       (no bias) + temporal max-pool ×scale (ceil mode)
  top-down flow        fine += nearest-upsample(coarse)   [scale (1,1,1)]
  level fusion 2       per level: grouped 1×1×1 ConvModule (groups=32)
                       → concat → 1×1×1 fusion ConvModule → 32w
  bottom-up flow       coarse += conv (3,1,1) (fine)   [no norm/act]
  level fusion 1       same shape as fusion 2
  pyramid fusion       concat(topdown, bottomup) → 1×1×1 ConvModule → 32w
  head                 global avg-pool → fc(num_classes)

Faithfully reproduces the TPN-repo forward's list-aliasing: the bottom-up
flow consumes the top-down-MUTATED level features (``temporal_modulation_outs
= outs`` aliases the same list the top-down loop writes into), not the
pristine temporal-modulation outputs. The training-only auxiliary CE head is
omitted (inference/attack framework).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
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


def _pool_t_ceil(x, scale: int):
    """Torch MaxPool3d((s,1,1),(s,1,1),ceil_mode=True) over the T axis.

    -inf end-padding reproduces ceil_mode's clipped final window exactly;
    the reshape+max form keeps the gradient an elementwise eq-mask instead
    of nn.max_pool's TPU-slow select-and-scatter (see max_pool_hw2)."""
    if scale <= 1:
        return x
    b, t, h, w, c = x.shape
    pad = (-t) % scale
    if pad:
        x = jnp.concatenate(
            [x, jnp.full((b, pad, h, w, c), -jnp.inf, x.dtype)], axis=1)
    return x.reshape(b, (t + pad) // scale, scale, h, w, c).max(axis=2)


class TPN(nn.Module, ReluMixin):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    num_classes: int = 400
    temporal_stages: Sequence[int] = (2, 3)  # (3,1,1) conv1 kernels here
    # TemporalModulation pool scales per pyramid level (f32s2 config: the
    # 32-frame clip pools to T=1 at both levels)
    temporal_scales: Sequence[int] = (32, 32)
    # upsample scale of the top-down flow (f32s2 config: identity)
    upsample_scale: int = 1
    neck_groups: int = 32
    relu_grad_scale: float = 1.0
    remat: bool = False  # see i3d.I3DResNet.remat
    normalize: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, clip01_bcthw):
        x = to_channel_last(clip01_bcthw, self.normalize, self.dtype)
        taps: dict = {}
        # SGM name filter ('relu' in name and not '0.relu',
        # base_attacks.py:509-511): the TPN-repo backbone names its stem
        # activation `relu` (a module attribute, unlike I3D's anonymous
        # Sequential slot), so the reference's hook DOES scale the stem
        # here; block-0 ReLUs stay unscaled ('0.relu' exclusion).
        x = self._relu(conv3d(self.width, (1, 7, 7), (1, 2, 2),
                              dtype=self.dtype, name="conv1")(x))
        x = max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        feats_out = []
        block_cls = nn.remat(TPNBottleneck) if self.remat else TPNBottleneck
        for stage in range(4):
            feats = self.width * (2**stage)
            tk = 3 if stage in self.temporal_stages else 1
            for block in range(self.stage_sizes[stage]):
                first = block == 0
                x = block_cls(
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

        # ---- TPN neck over layer3 (fine, 16w) and layer4 (coarse, 32w) ----
        planes = self.width * 32      # spatial-modulation target channels
        out_c = self.width * 16       # neck out_channels
        g = self.neck_groups

        def level_fusion(prefix, levels):
            # LevelFusion: per-level grouped 1×1×1 ConvModule (Downampling
            # with norm+act, identity pool) → concat → fusion ConvModule.
            # Under the reference SGM name filter only `ops.1.relu` matches
            # ('0.relu' is excluded; the Sequential fusion ReLU has a numeric
            # name) — so the coarse-level ReLU alone is grad-scaled.
            fused = []
            for i, f in enumerate(levels):
                y = conv3d(out_c, (1, 1, 1), groups=g, dtype=self.dtype,
                           name=f"{prefix}_op{i}")(f)
                fused.append(self._relu(y) if i > 0 else nn.relu(y))
            y = jnp.concatenate(fused, axis=-1)
            return nn.relu(conv3d(planes, (1, 1, 1), dtype=self.dtype,
                                  name=f"{prefix}_fusion")(y))

        # spatial modulation ('...0.0.relu' → unscaled under the SGM filter)
        fine = nn.relu(conv3d(planes, (1, 3, 3), (1, 2, 2), dtype=self.dtype,
                              name="sm_0_0")(feats_out[2]))
        coarse = feats_out[3]  # identity level
        # temporal modulation: grouped (3,1,1) conv (bias-free in the source;
        # the converter emits a zero bias) + ceil-mode temporal max-pool
        fine = _pool_t_ceil(
            conv3d(out_c, (3, 1, 1), groups=g, dtype=self.dtype, name="tm_0")(fine),
            self.temporal_scales[0])
        coarse = _pool_t_ceil(
            conv3d(out_c, (3, 1, 1), groups=g, dtype=self.dtype, name="tm_1")(coarse),
            self.temporal_scales[1])
        # top-down flow: fine += nearest-upsample(coarse)
        up = jnp.repeat(coarse, self.upsample_scale, axis=1) \
            if self.upsample_scale > 1 else coarse
        fine = fine + up
        topdown = level_fusion("lf2", [fine, coarse])
        # bottom-up flow — on the top-down-mutated `fine` (the TPN-repo list
        # aliasing); plain conv, no norm/activation, identity pool
        coarse = coarse + conv3d(out_c, (3, 1, 1), dtype=self.dtype,
                                 name="down_0")(fine)
        bottomup = level_fusion("lf1", [fine, coarse])
        # pyramid fusion of the two pyramids
        y = jnp.concatenate([topdown, bottomup], axis=-1)
        y = nn.relu(conv3d(planes, (1, 1, 1), dtype=self.dtype, name="pyramid")(y))
        # head: global avg-pool → fc (dropout is inference-inactive)
        pooled = jnp.mean(y, axis=(1, 2, 3))
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(pooled)
        return logits.astype(jnp.float32), taps


def tpn_resnet50(**kw) -> TPN:
    return TPN(stage_sizes=(3, 4, 6, 3), **kw)


def tpn_resnet101(**kw) -> TPN:
    return TPN(stage_sizes=(3, 4, 23, 3), **kw)


def tpn_tiny(**kw) -> TPN:
    # stage 2 has two blocks: SGM scaling skips block 0
    return TPN(stage_sizes=(1, 2, 1, 1), width=8, temporal_scales=(2, 2),
               num_classes=10, **kw)
