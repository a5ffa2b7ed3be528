"""Gradient/perturbation smoothing kernels and temporal moves.

Covers the translation-invariance Gaussian kernels (reference:
base_attacks.py:427-445, 626-649), TAP's uniform smoothing kernels
(reference: base_attacks.py:713-735), and TemporalTranslation's 1-D temporal
kernels + cycle moves (reference: video_attacks.py:38-148). Convolutions use
``lax.conv_general_dilated`` with ``feature_group_count`` (depthwise), which
XLA tiles onto the MXU; temporal smoothing is a single tensordot over the
variant axis instead of a reshape+matmul.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Kernel construction (host-side numpy; all tiny constants baked into jit)
# ---------------------------------------------------------------------------

def _norm_pdf(x: np.ndarray) -> np.ndarray:
    return np.exp(-0.5 * x * x) / math.sqrt(2.0 * math.pi)


def ti_kernel_2d(kernlen: int = 15, nsig: float = 3.0) -> np.ndarray:
    """Translation-invariance 2-D Gaussian (reference: base_attacks.py:427-432)."""
    x = np.linspace(-nsig, nsig, kernlen)
    k1 = _norm_pdf(x)
    k2 = np.outer(k1, k1)
    return (k2 / k2.sum()).astype(np.float32)


def ti_kernel_3d(kernlen: int = 15, nsig: float = 3.0) -> np.ndarray:
    """Separable 3-D Gaussian: k3[i] = k1[i]·outer(k1,k1), normalized
    (reference: base_attacks.py:626-634)."""
    x = np.linspace(-nsig, nsig, kernlen)
    k1 = _norm_pdf(x)
    k2 = np.outer(k1, k1)
    k3 = k1[:, None, None] * k2[None]
    return (k3 / k3.sum()).astype(np.float32)


def uniform_kernel_2d(kernlen: int) -> np.ndarray:
    """TAP uniform 2-D kernel (reference: base_attacks.py:713-717)."""
    k = np.ones((kernlen, kernlen))
    return (k / k.sum()).astype(np.float32)


def uniform_kernel_3d(kernlen: int, temporal_kernlen: int) -> np.ndarray:
    """TAP uniform 3-D kernel (reference: base_attacks.py:719-722)."""
    k = np.ones((temporal_kernlen, kernlen, kernlen))
    return (k / k.sum()).astype(np.float32)


def temporal_kernel(kernlen: int, mode: str = "gaussian") -> np.ndarray:
    """TemporalTranslation 1-D kernel over cycle-shift variants
    (reference: video_attacks.py:52-79). Modes: gaussian / linear / uniform
    (the reference spells uniform 'random')."""
    if mode == "gaussian":
        assert kernlen % 2 == 1
        if kernlen == 1:
            # sigma would be 0 → 0/0 NaN kernel; a length-1 kernel is the
            # identity regardless of mode
            return np.ones((1,), np.float32)
        k = (kernlen - 1) / 2
        sigma = k / 3.0
        xs = np.arange(-int(k), int(k) + 1, dtype=np.float64)
        k1 = np.exp(-(xs**2) / (2 * sigma**2)) / (sigma * math.sqrt(2 * math.pi))
    elif mode == "linear":
        k = int((kernlen - 1) / 2)
        ramp = [1 - i / (k + 1) for i in range(k + 1)]
        k1 = np.array(ramp[::-1][:-1] + ramp)
    elif mode in ("uniform", "random"):
        k1 = np.ones(kernlen)
    else:
        raise ValueError(f"unknown temporal kernel mode {mode!r}")
    return (k1 / k1.sum()).astype(np.float32)


# ---------------------------------------------------------------------------
# Depthwise convolutions over clip gradients (B, C, T, H, W)
# ---------------------------------------------------------------------------

def depthwise_conv2d_frames(grads_bcthw: jnp.ndarray, kernel2d) -> jnp.ndarray:
    """Per-frame depthwise 2-D convolution of a clip gradient with one shared
    spatial kernel, SAME padding. Equivalent of the reference's 32-iteration
    frame loop (base_attacks.py:434-443) collapsed into ONE conv by folding
    the T axis into the batch — no scalar loops for XLA to choke on.
    """
    b, c, t, h, w = grads_bcthw.shape
    kernel2d = jnp.asarray(kernel2d, dtype=grads_bcthw.dtype)
    kh, kw = kernel2d.shape
    frames = jnp.transpose(grads_bcthw, (0, 2, 1, 3, 4)).reshape(b * t, c, h, w)
    # Depthwise: one (kh,kw) filter per channel. OIHW with O=C, I=1, groups=C.
    filt = jnp.tile(kernel2d[None, None], (c, 1, 1, 1))
    out = jax.lax.conv_general_dilated(
        frames,
        filt,
        window_strides=(1, 1),
        padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)],
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return jnp.transpose(out.reshape(b, t, c, h, w), (0, 2, 1, 3, 4))


def depthwise_conv3d(grads_bcthw: jnp.ndarray, kernel3d) -> jnp.ndarray:
    """Depthwise 3-D convolution over (T,H,W) with one shared kernel, SAME
    padding (reference: base_attacks.py:640, 734)."""
    c = grads_bcthw.shape[1]
    kernel3d = jnp.asarray(kernel3d, dtype=grads_bcthw.dtype)
    kt, kh, kw = kernel3d.shape
    filt = jnp.tile(kernel3d[None, None], (c, 1, 1, 1, 1))
    return jax.lax.conv_general_dilated(
        grads_bcthw,
        filt,
        window_strides=(1, 1, 1),
        padding=[(kt // 2, kt // 2), (kh // 2, kh // 2), (kw // 2, kw // 2)],
        feature_group_count=c,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )


def _band_matrix(n: int, k1d, dtype):
    """(n, n) banded matrix B with B[i, j] = k1d[j−i+r]: B·x equals the
    SAME-zero-padded cross-correlation of x with k1d along that axis."""
    k1d = jnp.asarray(k1d, dtype)
    r = k1d.shape[0] // 2
    diff = jnp.arange(n)[None, :] - jnp.arange(n)[:, None] + r
    valid = (diff >= 0) & (diff < k1d.shape[0])
    return jnp.where(valid, k1d[jnp.clip(diff, 0, k1d.shape[0] - 1)], 0.0)


def depthwise_conv3d_separable(grads_bcthw: jnp.ndarray, k1d) -> jnp.ndarray:
    """Depthwise SAME smoothing with the separable kernel k1d⊗k1d⊗k1d as
    three banded matmuls on the MXU. The equivalent 15³ depthwise conv3d has
    3-channel groups that cannot tile onto the MXU (measured ~10× slower on
    v5e); per-factor normalization × 3 equals the reference's whole-kernel
    normalization because (k⊗k⊗k).sum() = k.sum()³."""
    k1d = np.asarray(k1d, np.float32)
    k1d = k1d / k1d.sum()
    t, h, w = grads_bcthw.shape[2:]
    dt = grads_bcthw.dtype
    hi = jax.lax.Precision.HIGHEST
    x = jnp.einsum("ts,bcshw->bcthw", _band_matrix(t, k1d, dt), grads_bcthw,
                   precision=hi)
    x = jnp.einsum("hs,bctsw->bcthw", _band_matrix(h, k1d, dt), x, precision=hi)
    return jnp.einsum("ws,bcths->bcthw", _band_matrix(w, k1d, dt), x,
                      precision=hi)


def gaussian_1d(kernlen: int = 15, nsig: float = 3.0) -> np.ndarray:
    """The 1-D Gaussian factor of the TI kernels (reference:
    base_attacks.py:427-429)."""
    return _norm_pdf(np.linspace(-nsig, nsig, kernlen)).astype(np.float32)


def ti_smooth_2d(grads_bcthw: jnp.ndarray, kernel2d) -> jnp.ndarray:
    """TIFGSM gradient smoothing incl. its idiosyncratic re-normalization by
    mean |g| over dims (C,T,H) only — W excluded — faithfully preserved
    (reference: base_attacks.py:444)."""
    out = depthwise_conv2d_frames(grads_bcthw, kernel2d)
    return out / jnp.mean(jnp.abs(out), axis=(1, 2, 3), keepdims=True)


def ti_smooth_2d_separable(grads_bcthw: jnp.ndarray, k1d) -> jnp.ndarray:
    """ti_smooth_2d with the outer-product Gaussian applied as two banded
    matmuls over H and W (see depthwise_conv3d_separable — same 3-channel
    depthwise-conv MXU problem, same exact separability)."""
    k1d = np.asarray(k1d, np.float32)
    k1d = k1d / k1d.sum()
    h, w = grads_bcthw.shape[3:]
    dt = grads_bcthw.dtype
    hi = jax.lax.Precision.HIGHEST
    x = jnp.einsum("hs,bctsw->bcthw", _band_matrix(h, k1d, dt), grads_bcthw,
                   precision=hi)
    out = jnp.einsum("ws,bcths->bcthw", _band_matrix(w, k1d, dt), x,
                     precision=hi)
    return out / jnp.mean(jnp.abs(out), axis=(1, 2, 3), keepdims=True)


# ---------------------------------------------------------------------------
# TemporalTranslation moves and variant smoothing
# ---------------------------------------------------------------------------

def cycle_move(clip_bcthw: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Circular temporal shift: frame i → (i+shift) mod T
    (reference: video_attacks.py:93-105) — a single jnp.roll on the T axis."""
    return jnp.roll(clip_bcthw, shift, axis=2)


def large_move_shift(move: int, frames: int) -> int:
    """'large' move-type shift mapping (reference: video_attacks.py:107-122)."""
    if move == 0:
        return 0
    direction = -1 if move < 0 else 1
    return direction * ((abs(move) + (frames // 2 - 1)) % frames)


def cycle_variants(clip_bcthw: jnp.ndarray, shifts) -> jnp.ndarray:
    """Stack of cycle-shifted clip variants (D, B, C, T, H, W). The reference
    builds these one Python-loop copy at a time (video_attacks.py:191-200);
    here the shifts are (D, T, T) one-hot permutation matrices contracted on
    the MXU — a gather would differentiate to a TPU scatter (the fan-out is
    on the white-box gradient path), while the einsum's VJP is the transposed
    einsum. One source frame per output frame, so values are bit-exact.
    """
    t = clip_bcthw.shape[2]
    shifts = jnp.asarray(shifts, dtype=jnp.int32)
    idx = (jnp.arange(t)[None, :] - shifts[:, None]) % t  # (D, T) source index
    perm = jax.nn.one_hot(idx, t, dtype=clip_bcthw.dtype)  # (D, T_out, T_src)
    # precision=HIGHEST: TPU default matmul precision would bf16-quantize
    # the f32 clip through the 0/1 contraction
    return jnp.einsum("dts,bcshw->dbcthw", perm, clip_bcthw,
                      precision=jax.lax.Precision.HIGHEST)


def exchange_frames(clip_bcthw: jnp.ndarray, exchange_pairs) -> jnp.ndarray:
    """Swap frame pairs — TemporalTranslation's 'Exchange' move variant
    (reference: video_attacks.py:142-148; defined there but unused by the
    shipped forward, kept for API parity). NOTE the reference's sequential
    in-place swap loses the first frame of each pair when pairs share an
    index; this version is a single permutation gather (the intent)."""
    t = clip_bcthw.shape[2]
    perm = list(range(t))
    for a, b in exchange_pairs:
        perm[a], perm[b] = perm[b], perm[a]
    return jnp.take(clip_bcthw, jnp.asarray(perm), axis=2)


def smooth_variant_grads(grads_dbcthw: jnp.ndarray, kernel1d) -> jnp.ndarray:
    """Weighted sum of per-variant gradients with a 1-D kernel over the variant
    axis (reference: video_attacks.py:81-91, expressed there as a matmul on a
    flattened view)."""
    kernel1d = jnp.asarray(kernel1d, dtype=grads_dbcthw.dtype)
    return jnp.tensordot(kernel1d, grads_dbcthw, axes=(0, 0))
