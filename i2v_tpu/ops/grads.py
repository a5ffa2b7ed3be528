"""Gradient normalization helpers (equivalent of reference utils.py:58-67)."""

from __future__ import annotations

import jax.numpy as jnp


def norm_grads(grads: jnp.ndarray, frame_level: bool = True) -> jnp.ndarray:
    """L1-mean gradient normalization over a (B, C, T, H, W) clip gradient.

    ``frame_level=True`` normalizes each frame by mean |g| over (C,H,W);
    otherwise each clip by mean |g| over (C,T,H,W). The reference asserts a
    32-frame layout (utils.py:61); here any T is accepted (the layout contract
    is enforced by static shapes under jit).
    """
    if grads.ndim != 5:
        raise ValueError(f"expected (B,C,T,H,W) clip gradient, got shape {grads.shape}")
    axes = (1, 3, 4) if frame_level else (1, 2, 3, 4)
    norm = jnp.mean(jnp.abs(grads), axis=axes, keepdims=True)
    return grads / norm


def l1_normalize(grads: jnp.ndarray) -> jnp.ndarray:
    """Whole-tensor L1 normalization (reference: base_attacks.py:398-399)."""
    return grads / jnp.sum(jnp.abs(grads))
