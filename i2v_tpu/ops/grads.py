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
    # an identically-zero gradient slice (SlowFast never reads odd temporal
    # frames: fast=x[:,::2], slow=x[:,::8]) would make this 0/0 → NaN that
    # poisons the momentum carry and the saved artifacts (the reference's
    # torch version has the same latent NaN, utils.py:58-67 — consciously
    # fixed); zero gradient normalizes to zero. Keyed on ``norm == 0`` (not
    # ``> 0``) so a genuinely-NaN gradient still propagates loudly instead
    # of being silently zeroed.
    return jnp.where(norm == 0, 0.0, grads / jnp.where(norm == 0, 1.0, norm))


def l1_normalize(grads: jnp.ndarray) -> jnp.ndarray:
    """Whole-tensor L1 normalization (reference: base_attacks.py:398-399);
    all-zero gradients normalize to zero (0/0 guard as in norm_grads;
    NaN-preserving for the same reason)."""
    total = jnp.sum(jnp.abs(grads))
    return jnp.where(total == 0, 0.0, grads / jnp.where(total == 0, 1.0, total))
