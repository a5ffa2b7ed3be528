"""I3D ResNet with non-local blocks (gluoncv `i3d_nl5_resnet{50,101}_v1_kinetics400`).

Topology (mmaction/gluoncv I3D convention, matched so gluoncv checkpoints
convert 1:1 — reference loads these via gluoncv get_model, attack.py:73):
  - stem: Conv3d 64 (5,7,7)/(2,2,2), pool (1,3,3)/(1,2,2)
  - pool2 (2,1,1)/(2,1,1) after res-layer 1 (temporal 16→8 on 32-frame clips)
  - 4 bottleneck stages, spatial strides (1,2,2,2); '3x1x1' inflation at the
    per-stage frequencies below; 5 non-local blocks after blocks (1,3) of
    stage 2 and (1,3,5) of stage 3
  - head: global avg-pool → fc(400)

Taps: ``res_layer{i}`` (stage outputs). The reference's TAP uses
res_layers[0:2] (base_attacks.py:739); ILAF uses res_layers[1]
(image_attacks.py:515).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .video_common import Bottleneck3D, NonLocal3D, ReluMixin, conv3d, max_pool3d, to_channel_last

# '3x1x1' inflation frequency per stage (mmaction i3d defaults)
_INFLATE_R50 = ((1, 1, 1), (1, 0, 1, 0), (1, 0, 1, 0, 1, 0), (0, 1, 0))
_INFLATE_R101 = (
    (1, 1, 1),
    (1, 0, 1, 0),
    tuple((1, 0) * 12)[:23],
    (0, 1, 0),
)
# non-local block positions (after these block indices), per stage
_NL5 = ((), (1, 3), (1, 3, 5), ())


class I3DResNet(nn.Module, ReluMixin):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    inflate_freq: Sequence[Sequence[int]] = _INFLATE_R50
    nonlocal_pos: Sequence[Sequence[int]] = _NL5
    nl_sub_sample: bool = True   # see NonLocal3D: param-free structure knobs
    nl_type: str = "gaussian"
    width: int = 64
    num_classes: int = 400
    relu_grad_scale: float = 1.0
    # rematerialize each bottleneck in the backward pass: trades MXU
    # recompute for activation HBM, letting white-box attacks that carry
    # extra per-pixel state (MI momentum) run at the reference's batch 16
    remat: bool = False
    normalize: bool = True
    dtype: Any = jnp.float32

    def _stem(self, x):
        # SGM grad-scale placement mirrors the reference's name-filtered hooks
        # ('relu' in name and not '0.relu', base_attacks.py:509-511): the stem
        # ReLU (an unnamed Sequential slot in gluoncv) and each stage's
        # block-0 ReLUs are NOT scaled.
        x = nn.relu(conv3d(self.width, (5, 7, 7), (2, 2, 2), dtype=self.dtype,
                           name="conv1")(x))
        return max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))

    @nn.compact
    def __call__(self, clip01_bcthw):
        x = to_channel_last(clip01_bcthw, self.normalize, self.dtype)
        taps: dict = {}
        # remat the stem as well: its pre-pool activation is the largest
        # single tensor in the model (B·T·112²·64)
        x = nn.remat(I3DResNet._stem)(self, x) if self.remat else self._stem(x)
        for stage in range(4):
            feats = self.width * (2**stage)
            block_cls = nn.remat(Bottleneck3D) if self.remat else Bottleneck3D
            for block in range(self.stage_sizes[stage]):
                first = block == 0
                x = block_cls(
                    feats,
                    spatial_stride=2 if (first and stage > 0) else 1,
                    downsample=first,
                    inflate=bool(self.inflate_freq[stage][block]),
                    relu_grad_scale=1.0 if first else self.relu_grad_scale,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x)
                if block in self.nonlocal_pos[stage]:
                    x = NonLocal3D(feats * 4, sub_sample=self.nl_sub_sample,
                                   nl_type=self.nl_type, dtype=self.dtype,
                                   name=f"layer{stage + 1}_{block}_nl")(x)
            taps[f"res_layer{stage + 1}"] = x
            if stage == 0:
                x = max_pool3d(x, (2, 1, 1), (2, 1, 1))
        x = jnp.mean(x, axis=(1, 2, 3))
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        # full tap dict: unused entries are dead-code-eliminated under jit
        return logits.astype(jnp.float32), taps


def i3d_resnet50(**kw) -> I3DResNet:
    return I3DResNet(stage_sizes=(3, 4, 6, 3), inflate_freq=_INFLATE_R50, **kw)


def i3d_resnet101(**kw) -> I3DResNet:
    return I3DResNet(stage_sizes=(3, 4, 23, 3), inflate_freq=_INFLATE_R101, **kw)


def i3d_tiny(**kw) -> I3DResNet:
    """Width-8 variant for checkpoint-free tests. Stage 2 has TWO blocks so
    SGM's relu grad scaling (which skips every block 0) stays observable."""
    return I3DResNet(stage_sizes=(1, 2, 1, 1),
                     inflate_freq=((1,), (1, 0), (1,), (0,)),
                     nonlocal_pos=((), (0,), (), ()),
                     width=8, num_classes=10, **kw)
