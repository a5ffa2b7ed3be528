"""Image-model registry: names, depth→tap tables, construction, checkpoints.

The reference addresses taps by a hand-maintained depth→module map per
architecture (image_attacks.py:260-271); the same depth indices map here onto
explicit tap keys:

  resnet      depth d → stage d output            (layer{d}[-1])
  alexnet     {1:1, 2:4, 3:7, 4:11}               (features[i] ReLU)
  vgg         {1:1, 2:11, 3:20, 4:29}             (features[i] ReLU)
  squeezenet  {1:3, 2:6, 3:9, 4:12}               (Fire expand3x3 ReLU)

Pretrained weights: torchvision state_dicts converted by
:mod:`i2v_tpu.models.convert` and stored as msgpack under ``I2V_TPU_CKPTS``
(default ``./checkpoints``). Without a checkpoint the bundle is random-init
(tests; a warning is emitted for attack use).
"""

from __future__ import annotations

import os
import warnings
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp

from . import resnet as _resnet
from . import vgg as _vgg
from .api import ImageModel

IMAGE_MODEL_NAMES = ("resnet", "vgg", "alexnet", "squeezenet", "densenet", "vit")

DEPTH_TO_TAP: Mapping[str, Mapping[int, int]] = {
    "resnet": {1: 1, 2: 2, 3: 3, 4: 4},
    "alexnet": {1: 1, 2: 4, 3: 7, 4: 11},
    "vgg": {1: 1, 2: 11, 3: 20, 4: 29},
    "squeezenet": {1: 3, 2: 6, 3: 9, 4: 12},
    # densenet161 is in the reference zoo (image_attacks.py:96-99) but has no
    # attack tap table there; dense-block outputs are the natural analogue
    "densenet": {1: 1, 2: 2, 3: 3, 4: 4},
    # ViT (TPAMI get_vits): transformer block outputs
    "vit": {1: 2, 2: 5, 3: 8, 4: 11},
}


def ckpt_dir() -> str:
    return os.environ.get("I2V_TPU_CKPTS", "./checkpoints")


def _clamped_taps(tap_keys, hi: int, lo: int = 1) -> tuple:
    """Clamp tap keys into [lo, hi] and dedupe preserving order — for the
    width/depth-reduced tiny variants whose stage count is below the
    full-size tap tables'."""
    out: list = []
    for t in tap_keys:
        c = max(lo, min(t, hi))
        if c not in out:
            out.append(c)
    return tuple(out)


def build_image_model(
    name: str,
    depths: int | Sequence[int],
    *,
    truncate: bool = True,
    tiny: bool = False,
    dtype=jnp.float32,
):
    """Construct the Flax module + ordered tap keys for reference-style
    (model name, depth(s)). ``tiny=True`` builds a width-reduced variant for
    checkpoint-free tests."""
    list_depths = not isinstance(depths, int)
    if isinstance(depths, int):
        depths = [depths]
    tap_keys = tuple(sorted(DEPTH_TO_TAP[name][d] for d in depths))
    kw = dict(taps=tap_keys, truncate=truncate, dtype=dtype)
    if name == "resnet":
        module = (_resnet.resnet_tiny(**kw) if tiny else _resnet.resnet101(**kw))
    elif name == "vgg":
        module = _vgg.VGG16(width_mult=0.125 if tiny else 1.0, **kw)
    elif name == "alexnet":
        module = _vgg.AlexNet(width_mult=0.125 if tiny else 1.0, **kw)
    elif name == "squeezenet":
        # list depths (AENS) hook the whole Fire module — concat(e1,e3) —
        # where scalar depths hook the expand3x3 ReLU (TPAMI_attack.py:197-200
        # vs image_attacks.py:268-271)
        module = _vgg.SqueezeNet11(width_mult=0.25 if tiny else 1.0,
                                   fire_taps=list_depths, **kw)
    elif name == "densenet":
        from . import densenet as _densenet

        if tiny:
            # tiny has 2 dense blocks — clamp the depth-3/4 taps (and
            # dedupe, preserving request order) or the tap dict would have
            # no entry for the requested key
            n_blocks = len(_densenet.densenet_tiny(dtype=kw["dtype"])
                           .block_config)
            tap_keys = _clamped_taps(tap_keys, n_blocks)
            kw["taps"] = tap_keys
            module = _densenet.densenet_tiny(**kw)
        else:
            module = _densenet.densenet161(**kw)
    elif name == "vit":
        from . import vit as _vit

        if tiny:
            depth = _vit.vit_tiny(dtype=kw["dtype"]).depth
            # clamp AND dedupe: min() alone maps distinct depths onto the
            # same block, silently double-weighting one tap in multi-tap
            # (AENS) losses
            tap_keys = _clamped_taps(tap_keys, depth - 1, lo=0)
            module = _vit.vit_tiny(taps=tap_keys, truncate=truncate,
                                   dtype=kw["dtype"])
        else:
            module = _vit.vit_base_patch16_224(taps=tap_keys,
                                               truncate=truncate,
                                               dtype=kw["dtype"])
    else:
        raise ValueError(f"unknown image model {name!r}; have {IMAGE_MODEL_NAMES}")
    return module, tap_keys


def _load_params(name: str):
    """Load converted pretrained params if present, else None. Arrays are
    device_put once here — params are runtime jit arguments, and host numpy
    arrays would otherwise re-upload the weights on every attack call."""
    path = os.path.join(ckpt_dir(), f"{name}.msgpack")
    if not os.path.exists(path):
        return None
    from flax import serialization

    with open(path, "rb") as f:
        restored = serialization.msgpack_restore(f.read())
    return jax.device_put(restored)


def get_image_models(
    names: Sequence[str],
    depths: Mapping[str, int | Sequence[int]] | int,
    *,
    truncate: bool = True,
    tiny: bool = False,
    input_hw: int = 224,
    dtype=jnp.float32,
    seed: int = 0,
) -> list[ImageModel]:
    """Build bundles for the reference's ``get_models(model_name_lists)``
    call sites (image_attacks.py:110-115) with depth selection attached."""
    bundles = []
    for i, name in enumerate(names):
        d = depths if isinstance(depths, int) else depths[name]
        module, tap_keys = build_image_model(
            name, d, truncate=truncate, tiny=tiny, dtype=dtype
        )
        params = None if tiny else _load_params(name)
        if params is None:
            if not tiny:
                warnings.warn(
                    f"no pretrained checkpoint for {name!r} under {ckpt_dir()!r}; "
                    "using random init (run tools/convert_torchvision.py)"
                )
            example = jnp.zeros((1, input_hw, input_hw, 3), dtype=jnp.float32)
            params = module.init(jax.random.PRNGKey(seed + i), example)
        else:
            params = {"params": params} if "params" not in params else params
        bundles.append(ImageModel(name=name, module=module, params=params,
                                  tap_keys=tap_keys))
    return bundles
