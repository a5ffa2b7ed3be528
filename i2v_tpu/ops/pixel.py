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

import functools as _functools

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


@_functools.lru_cache(maxsize=1)
def _u8_norm_lut():
    """(3·256,) float32 LUT: ``lut[c·256 + v] = (v/255 − mean_c)/std_c``,
    computed with HOST numpy arithmetic. u8 pixels take only 256 values per
    channel, so the host half of ToTensor+Normalize is exactly tabulable.
    Cached: ingest runs eagerly per batch, and rebuilding + re-uploading the
    table every call would pay an avoidable host→device round trip."""
    import numpy as np

    v = np.arange(256, dtype=np.float32) / np.float32(255.0)
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    return jnp.asarray(
        ((v[None, :] - mean[:, None]) / std[:, None]).reshape(-1))


def ingest_u8_clips(u8_bthwc: jnp.ndarray) -> jnp.ndarray:
    """Device-side ingest: raw uint8 (B,T,H,W,3) clips → [0,1] (B,3,T,H,W).

    The TPU-native dual of the reference's host-side ToTensor+Normalize →
    upload → unnormalize chain (datasets.py:86-93 + base_attacks.py:145-158):
    shipping the decoded uint8 frames and doing the arithmetic on device cuts
    host→device traffic 4× (the usual ingest bottleneck — PCIe on a real
    host, ~10 MB/s on this relay). The result is BIT-IDENTICAL to the
    f32-upload path's clean01, making u8 ingress a pure transport
    optimization, not a numerics knob (tests/test_ops.py,
    tests/test_parallel.py pin this).

    How bit-identity is achieved: TPU f32 divide is NOT correctly rounded
    (it lowers to reciprocal-multiply — measured 1-ULP drift vs numpy on
    ~16% of bytes), so the divide-bearing host half (/255 → (x−mean)/std)
    is precomputed on host into a per-channel 256-entry LUT and applied as
    an exact device gather; the remaining unnormalize (·std + mean) is the
    SAME eager device op the f32 path runs (TPU f32 mul/add ARE correctly
    rounded — verified elementwise against numpy for all 768 LUT inputs).

    The uint8 transpose runs before the f32 upcast — 4× less transpose
    traffic if XLA materializes it. The unnormalize MUST stay an eager
    op-by-op dispatch: under an enclosing jit XLA contracts mul+add into
    FMA, which shifts the last bit vs the f32 path's eager unnormalize,
    and the flat-start cosine objectives amplify last-bit input
    differences chaotically. The gather itself is fusion-proof (exact
    regardless), and runs once per batch — off the attack's hot loop.
    """
    idx = jnp.transpose(u8_bthwc, (0, 4, 1, 2, 3)).astype(jnp.int32)
    idx = idx + 256 * jnp.arange(3, dtype=jnp.int32).reshape(1, 3, 1, 1, 1)
    norm = jnp.take(_u8_norm_lut(), idx)
    return unnormalize(norm, channel_axis=1)


def is_u8_clips(videos) -> bool:
    """True for the raw uint8 (B,T,H,W,3) ingest layout (vs the normalized
    f32 (B,C,T,H,W) contract). uint8 rank-5 channel-LAST is the u8 ingress
    contract — a normalized-domain clip can never be uint8."""
    return (hasattr(videos, "dtype") and videos.dtype == jnp.uint8
            and videos.ndim == 5 and videos.shape[-1] == 3)


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
