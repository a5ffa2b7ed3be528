"""Video-model registry: the six reference models (utils.py:8-15) + tap maps.

Checkpoints: gluoncv state_dicts converted by tools/convert_gluoncv.py into
msgpack under I2V_TPU_CKPTS; random init (with warning) otherwise.
"""

from __future__ import annotations

import os
import warnings
from typing import Optional

import jax
import jax.numpy as jnp

from . import i3d, slowfast, tpn
from .api import VideoModel

VIDEO_BUILDERS = {
    "i3d_resnet50": i3d.i3d_resnet50,
    "i3d_resnet101": i3d.i3d_resnet101,
    "slowfast_resnet50": slowfast.slowfast_resnet50,
    "slowfast_resnet101": slowfast.slowfast_resnet101,
    "tpn_resnet50": tpn.tpn_resnet50,
    "tpn_resnet101": tpn.tpn_resnet101,
}

TINY_BUILDERS = {
    "i3d_resnet50": i3d.i3d_tiny,
    "i3d_resnet101": i3d.i3d_tiny,
    "slowfast_resnet50": slowfast.slowfast_tiny,
    "slowfast_resnet101": slowfast.slowfast_tiny,
    "tpn_resnet50": tpn.tpn_tiny,
    "tpn_resnet101": tpn.tpn_tiny,
}


def _family(name: str) -> str:
    return name.split("_")[0]


# per-architecture target layers (reference: base_attacks.py:737-743)
TAP_TAPS = {
    "i3d": ("res_layer1", "res_layer2"),
    "slowfast": ("slow_res2", "slow_res3", "fast_res2", "fast_res3"),
    "tpn": ("layer1", "layer2"),
}

# ILAF mid-layers (reference: image_attacks.py:513-519)
ILAF_TAPS = {
    "i3d": ("res_layer2",),
    "slowfast": ("slow_res2", "fast_res2"),
    "tpn": ("layer2",),
}


def tap_keys_for(model_name: str, purpose: str = "tap") -> tuple:
    table = TAP_TAPS if purpose == "tap" else ILAF_TAPS
    return table[_family(model_name)]


def _ckpt_path(name: str, ucf: bool) -> str:
    root = os.environ.get("I2V_TPU_CKPTS", "./checkpoints")
    suffix = "_ucf101" if ucf else ""
    return os.path.join(root, f"{name}{suffix}.msgpack")


def get_video_model(
    name: str,
    *,
    tiny: bool = False,
    ucf101: bool = False,
    dtype=jnp.float32,
    remat: bool = False,
    example_shape: Optional[tuple] = None,
    seed: int = 0,
) -> VideoModel:
    """Build a video-model bundle for a reference model name.

    ``ucf101=True`` loads the fine-tuned 101-class checkpoint (reference:
    reference_ucf101.py:107-117). ``remat=True`` rematerializes bottlenecks
    in backward passes (activation HBM ↔ MXU recompute)."""
    if name not in VIDEO_BUILDERS:
        raise ValueError(f"unknown video model {name!r}; have {sorted(VIDEO_BUILDERS)}")
    builder = TINY_BUILDERS[name] if tiny else VIDEO_BUILDERS[name]
    kw = {"dtype": dtype, "remat": remat}
    if not tiny and ucf101:
        kw["num_classes"] = 101
    module = builder(**kw)

    restored = None
    if not tiny:
        path = _ckpt_path(name, ucf101)
        if os.path.exists(path):
            from flax import serialization

            with open(path, "rb") as f:
                restored = serialization.msgpack_restore(f.read())
            if "params" in restored:
                restored = restored["params"]
    if restored is None and not tiny:
        warnings.warn(
            f"no converted checkpoint for {name!r}"
            f"{' (ucf101)' if ucf101 else ''}; using random init "
            "(run tools/convert_gluoncv.py)"
        )
    if example_shape is None:
        example_shape = (1, 3, 8, 32, 32) if tiny else (1, 3, 32, 224, 224)
    example = jnp.zeros(example_shape, dtype=jnp.float32)
    params = module.init(jax.random.PRNGKey(seed), example)
    if restored is not None:
        # overlay the converted subtree onto the init tree: a checkpoint that
        # maps only the backbone (e.g. TPN before its neck naming is
        # discovered via convert_gluoncv --report) must load and run, with
        # the random-init remainder called out loudly
        merged, missing = _overlay(params["params"], restored)
        if missing:
            warnings.warn(
                f"checkpoint for {name!r} left {len(missing)} module(s) at "
                f"random init: {sorted(missing)[:8]}"
                f"{'…' if len(missing) > 8 else ''} — transfer numbers are "
                "NOT valid until these convert (see convert_gluoncv --report)"
            )
        params = {"params": merged}
    # device_put once: params are runtime jit args (see registry)
    params = jax.device_put(params)
    return VideoModel(name=name, module=module, params=params,
                      tap_keys=tap_keys_for(name, "tap"))


def _overlay(init: dict, restored: dict):
    """Overlay ``restored`` onto ``init`` (same treedef where present).
    Returns (merged, names of top-level init modules absent in restored)."""
    merged = dict(init)
    missing = {k for k in init if k not in restored}
    for k, v in restored.items():
        if k in init and isinstance(init[k], dict) and isinstance(v, dict):
            sub, _ = _overlay(init[k], v)
            merged[k] = sub
        else:
            merged[k] = v
    return merged, missing
