"""SlowFast networks (gluoncv `slowfast_8x8_resnet{50,101}_kinetics400`).

Two pathways over one clip (SlowFast paper, gluoncv torch naming — the
reference taps `slow_res2/fast_res2/...`, base_attacks.py:741,
image_attacks.py:517):
  - the model subsamples its own input the way the gluoncv 8x8 forward
    does — fast = x[:, :, ::2], slow = x[:, :, ::8] — so a 32-frame clip
    becomes 16 fast / 4 slow frames (``fast_stride``/``slow_stride`` knobs;
    frames skipped by both pathways get ZERO attack gradient, exactly as
    through the reference's model)
  - fast: width β·64 = 8, temporal (3,1,1) convs in every stage, stem
    Conv3d (5,7,7)
  - slow: width 64, temporal convs only in stages 3-4 (non-degenerate
    late), stem Conv3d (1,7,7)
  - lateral fast→slow fusion after pool1/res2/res3/res4: time-strided
    Conv3d (5,1,1) stride (slow_stride/fast_stride,1,1) to 2βC channels,
    concatenated onto slow
  - head: global-avg-pool both pathways, concat [slow, fast], fc(400)

Taps: ``slow_res{2..5}``, ``fast_res{2..5}`` (gluoncv stage names).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .video_common import ReluMixin, conv3d, max_pool3d, to_channel_last


class SFBottleneck(nn.Module, ReluMixin):
    """SlowFast bottleneck: optional (3,1,1) temporal kernel on conv1."""

    features: int
    out_features: int
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
        y = conv3d(self.out_features, (1, 1, 1), dtype=self.dtype, name="conv3")(y)
        if self.downsample:
            residual = conv3d(self.out_features, (1, 1, 1), st, dtype=self.dtype,
                              name="downsample")(x)
        return self._relu(y + residual)


class SlowFast(nn.Module, ReluMixin):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    fast_stride: int = 2      # gluoncv 8x8 forward: fast = x[:, :, ::2]
    slow_stride: int = 8      #                      slow = x[:, :, ::8]
    beta_inv: int = 8         # fast width = width // beta_inv
    width: int = 64
    num_classes: int = 400
    # stages with temporal (3,1,1) convs: fast = all, slow = late only
    slow_temporal_stages: Sequence[int] = (2, 3)
    relu_grad_scale: float = 1.0
    remat: bool = False  # see i3d.I3DResNet.remat
    normalize: bool = True
    dtype: Any = jnp.float32

    def _stage(self, x, pathway: str, stage: int):
        feats = self.width * (2**stage)
        if pathway == "fast":
            feats //= self.beta_inv
            tk = 3
        else:
            tk = 3 if stage in self.slow_temporal_stages else 1
        block_cls = nn.remat(SFBottleneck) if self.remat else SFBottleneck
        for block in range(self.stage_sizes[stage]):
            first = block == 0
            x = block_cls(
                feats, feats * 4,
                spatial_stride=2 if (first and stage > 0) else 1,
                temporal_kernel=tk,
                downsample=first,
                # reference SGM hooks skip '0.relu' names (base_attacks.py:
                # 509-511) → each stage's block 0 is unscaled
                relu_grad_scale=1.0 if first else self.relu_grad_scale,
                dtype=self.dtype,
                name=f"{pathway}_res{stage + 2}_{block}",
            )(x)
        return x

    def _lateral(self, fast, stage_name: str, channels: int):
        """Time-strided fast→slow connection: Conv3d (5,1,1)/(α,1,1) where
        α = slow_stride/fast_stride. ReLU unscaled: gluoncv lateral
        activations aren't named '*relu*', so the reference's SGM hooks
        never touch them."""
        alpha = self.slow_stride // self.fast_stride
        return nn.relu(conv3d(channels, (5, 1, 1), (alpha, 1, 1),
                              dtype=self.dtype,
                              name=f"lateral_{stage_name}")(fast))

    @nn.compact
    def __call__(self, clip01_bcthw):
        x = to_channel_last(clip01_bcthw, self.normalize, self.dtype)
        taps: dict = {}
        fast_w = self.width // self.beta_inv

        # stem ReLUs unscaled (see _stage note on the reference's hook filter)
        fast = nn.relu(conv3d(fast_w, (5, 7, 7), (1, 2, 2), dtype=self.dtype,
                              name="fast_conv1")(x[:, ::self.fast_stride]))
        fast = max_pool3d(fast, (1, 3, 3), (1, 2, 2), (0, 1, 1))

        slow = x[:, ::self.slow_stride]
        slow = nn.relu(conv3d(self.width, (1, 7, 7), (1, 2, 2), dtype=self.dtype,
                              name="slow_conv1")(slow))
        slow = max_pool3d(slow, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        slow = jnp.concatenate(
            [slow, self._lateral(fast, "p1", 2 * fast_w)], axis=-1)

        for stage in range(4):
            fast = self._stage(fast, "fast", stage)
            slow = self._stage(slow, "slow", stage)
            taps[f"fast_res{stage + 2}"] = fast
            taps[f"slow_res{stage + 2}"] = slow
            if stage < 3:
                lat = self._lateral(
                    fast, f"res{stage + 2}",
                    2 * (fast_w * (2**stage)) * 4,
                )
                slow = jnp.concatenate([slow, lat], axis=-1)

        pooled = jnp.concatenate(
            [jnp.mean(slow, axis=(1, 2, 3)), jnp.mean(fast, axis=(1, 2, 3))],
            axis=-1)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(pooled)
        return logits.astype(jnp.float32), taps


def slowfast_resnet50(**kw) -> SlowFast:
    return SlowFast(stage_sizes=(3, 4, 6, 3), **kw)


def slowfast_resnet101(**kw) -> SlowFast:
    return SlowFast(stage_sizes=(3, 4, 23, 3), **kw)


def slowfast_tiny(**kw) -> SlowFast:
    # stage 2 has two blocks: SGM scaling skips block 0 (see _stage).
    # fast keeps every frame so short test clips stay non-degenerate.
    return SlowFast(stage_sizes=(1, 2, 1, 1), width=8, beta_inv=4,
                    fast_stride=1, slow_stride=4, num_classes=10, **kw)
