"""Pixel-domain transforms: the normalize / un-normalize / ε-project sandwich.

The reference mutates tensors in place through a normalize→perturb→project→
re-normalize sandwich (reference: base_attacks.py:145-158, image_attacks.py:50-63,
e.g. base_attacks.py:289-293). Here the same math is expressed as pure functions
over an explicit [0,1]-domain image variable, which jit/scan thread functionally.

Layout convention: channel axis is explicit. Clips at the artifact boundary are
``(B, C, T, H, W)`` float32 in the *normalized* domain (matching the reference's
``{label}-adv.npy`` protocol, reference: attack.py:92-96); internally the
TPU-friendly layout is ``(N, H, W, C)`` frames (NHWC convs map onto the MXU).
"""

from __future__ import annotations

import jax.numpy as jnp

# ImageNet statistics, used by both torchvision image models and the
# gluoncv Kinetics-400 video models (reference: base_attacks.py:39-40).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _stats(x: jnp.ndarray, channel_axis: int):
    shape = [1] * x.ndim
    shape[channel_axis] = 3
    mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype).reshape(shape)
    std = jnp.asarray(IMAGENET_STD, dtype=x.dtype).reshape(shape)
    return mean, std


def normalize(x: jnp.ndarray, channel_axis: int = -1) -> jnp.ndarray:
    """[0,1] pixel domain → ImageNet-normalized domain."""
    mean, std = _stats(x, channel_axis)
    return (x - mean) / std


def unnormalize(x: jnp.ndarray, channel_axis: int = -1) -> jnp.ndarray:
    """ImageNet-normalized domain → [0,1] pixel domain."""
    mean, std = _stats(x, channel_axis)
    return x * std + mean


def scale_perts(perts: jnp.ndarray, channel_axis: int = -1) -> jnp.ndarray:
    """Normalized-domain perturbation → pixel-domain scale (÷std only).

    Equivalent of the reference's ``_transform_perts`` used by TAP's smoothness
    regularizer (reference: base_attacks.py:138-143, 795).
    """
    _, std = _stats(perts, channel_axis)
    return perts / std


def project_linf(adv: jnp.ndarray, clean: jnp.ndarray, epsilon: float) -> jnp.ndarray:
    """Project ``adv`` into the ε-ball around ``clean`` ∩ [0,1].

    Pixel-domain equivalent of the reference's per-step tail
    ``delta = clamp(adv-orig, ±ε); adv = clamp(orig+delta, 0, 1)``
    (reference: base_attacks.py:291-292).
    """
    delta = jnp.clip(adv - clean, -epsilon, epsilon)
    return jnp.clip(clean + delta, 0.0, 1.0)


def rebuild_adv(clean01: jnp.ndarray, modifier: jnp.ndarray, epsilon: float) -> jnp.ndarray:
    """Additive-modifier rebuild used by the Adam-based image-guided attacks:
    ``clamp(clean + clamp(modifier, ±ε), 0, 1)`` (reference: image_attacks.py:331).
    """
    return jnp.clip(clean01 + jnp.clip(modifier, -epsilon, epsilon), 0.0, 1.0)


def sign_step_project(
    adv01: jnp.ndarray,
    grad: jnp.ndarray,
    clean01: jnp.ndarray,
    step_size: float,
    epsilon: float,
) -> jnp.ndarray:
    """One full sign-attack pixel update:
    ``adv + α·sign(g)`` then ε-ball and [0,1] projection.

    Pure-jnp reference implementation; the fused Pallas version lives in
    :mod:`i2v_tpu.ops.pallas_kernels` and must match this bit-for-bit.
    """
    stepped = adv01 + step_size * jnp.sign(grad)
    return project_linf(stepped, clean01, epsilon)


def flatten_clip_to_frames(clip_bcthw: jnp.ndarray) -> jnp.ndarray:
    """(B,C,T,H,W) → (B·T, H, W, C) NHWC frame batch.

    The reference flattens clips into frame batches for image models with
    ``permute([0,2,1,3,4]).reshape(b*f,c,h,w)`` (reference:
    image_attacks.py:300-301); we additionally move to NHWC for the TPU.
    """
    b, c, t, h, w = clip_bcthw.shape
    return jnp.transpose(clip_bcthw, (0, 2, 3, 4, 1)).reshape(b * t, h, w, c)


def unflatten_frames_to_clip(frames_nhwc: jnp.ndarray, batch: int) -> jnp.ndarray:
    """(B·T, H, W, C) → (B, C, T, H, W), inverse of flatten_clip_to_frames."""
    bt, h, w, c = frames_nhwc.shape
    t = bt // batch
    return jnp.transpose(frames_nhwc.reshape(batch, t, h, w, c), (0, 4, 1, 2, 3))
