"""Gradient-surgery activations.

SGM (Skip Gradient Method) scales the gradient flowing through every
(non-stem) ReLU by γ^0.5; the reference does this with backward hooks
(base_attacks.py:495-511). Hooks don't exist in a functional world — a
custom-VJP ReLU is the precise equivalent: identical forward, backward
multiplied by the scale after the ReLU mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def grad_scaled_relu(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    return jnp.maximum(x, 0)


def _gsr_fwd(x, scale):
    return jnp.maximum(x, 0), x


def _gsr_bwd(scale, x, g):
    return (g * scale * (x > 0).astype(g.dtype),)


grad_scaled_relu.defvjp(_gsr_fwd, _gsr_bwd)


@jax.custom_vjp
def signed_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sign(x)·√|x| with a finite gradient at 0.

    TAP's feature distance maps activations through sign(f)·√|f|
    (reference: base_attacks.py:790). The plain composition has gradient
    0·∞ = NaN at x = 0 — and ReLU-output taps are exactly 0 on half their
    units, so the reference formulation NaNs (verified against torch).
    Conscious fix (SURVEY.md appendix): exact derivative 1/(2√|x|) off zero,
    0 at zero.
    """
    return jnp.sign(x) * jnp.sqrt(jnp.abs(x))


def _ssqrt_fwd(x):
    return signed_sqrt(x), x


def _ssqrt_bwd(x, g):
    denom = 2.0 * jnp.sqrt(jnp.abs(x))
    grad = jnp.where(x == 0, 0.0, g / jnp.where(denom == 0, 1.0, denom))
    return (grad.astype(g.dtype),)


signed_sqrt.defvjp(_ssqrt_fwd, _ssqrt_bwd)
