"""Coarse-to-fine (multigrid) schedule for the image-guided attacks.

The I2V/ENS cosine objective spends the reference's 60 Adam steps
(image_attacks.py:372-376) entirely at 224² — but the early steps only carve
out the low-frequency structure of the perturbation. Borrowing the multigrid
idea from video-model *training* (Wu et al., "A Multigrid Method for
Efficiently Training Video Models", arXiv:1912.00998), the first K steps run
on ``scale×``-downsampled clips (1/scale² the FLOPs and activation traffic
per step), the resulting modifier is nearest-upsampled as a warm start, and
the remaining steps refine at full resolution. With K=30 of 60 at scale 2
the surrogate work drops to ~62% of the full-resolution schedule.

This is an OPT-IN approximation lever (``--multigrid K`` on the image-guided
CLIs): the attack trajectory differs from the reference's, so runs that must
reproduce the paper's tables bit-for-bit should leave it off. The ε-ball and
[0,1] invariants are exact in every phase (the modifier is re-clipped inside
``rebuild_adv`` at both resolutions), and the recorded per-step cost vector
concatenates both phases (coarse costs are sums of per-frame cosines, the
same scale as fine costs).

Mechanics: the coarse phase is a standard sharded runner over
area-downsampled clips that returns its final modifier
(``return_modifier=True``); the fine phase is a standard sharded runner
warm-started via ``mod_init``. Adam moments restart at the switch — the
coarse moments live on a different grid and a fresh bias-corrected start at
the fine scale is both simpler and empirically stabler than interpolating
second moments.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..models.api import ImageModel
from .sharded import make_sharded_i2v_runner


def downsample_clips(clean01: jnp.ndarray, scale: int) -> jnp.ndarray:
    """(B,C,T,H,W) → (B,C,T,H/s,W/s) exact area mean (requires s | H, W)."""
    b, c, t, h, w = clean01.shape
    if h % scale or w % scale:
        raise ValueError(f"multigrid scale {scale} must divide the spatial "
                         f"size ({h}×{w})")
    x = clean01.reshape(b, c, t, h // scale, scale, w // scale, scale)
    return x.mean(axis=(4, 6))


def upsample_modifier(mod_frames: jnp.ndarray, scale: int) -> jnp.ndarray:
    """(N,h,w,3) → (N,h·s,w·s,3) nearest (block-repeat) upsample.

    Nearest keeps the warm start inside the same ±ε box the coarse phase
    converged in (any interpolation of values in [-ε,ε] also stays in range,
    but nearest preserves the coarse optimum's per-block values exactly)."""
    return jnp.repeat(jnp.repeat(mod_frames, scale, axis=1), scale, axis=2)


def make_multigrid_i2v_runner(
    models: Sequence[ImageModel],
    mesh: Mesh,
    *,
    steps: int,
    coarse_steps: int,
    scale: int = 2,
    step_size: float = 0.005,
    epsilon: float = 16 / 255,
    donate: bool = False,
    frame_chunk: int | str | None = None,
    coarse_frame_chunk: int | str | None | type(...) = ...,
    param_dtype=None,
    runner_factory=None,
):
    """Two-phase runner with the sharded-runner calling convention:
    ``runner(clean01, n_real=None) -> (adv01 clips, per-step costs)`` where
    ``len(costs) == steps`` (coarse ‖ fine). Adaptive AENS is not supported —
    its coefficient state is resolution-coupled (per-tap cosine sums change
    magnitude with the frame area), so a cross-grid handoff would feed the
    softmax a mixed signal.

    ``runner_factory``: the phase-runner builder — default
    ``make_sharded_i2v_runner`` (dp/sp mesh); pass
    ``ensemble.make_ensemble_parallel_runner`` to compose the coarse-to-fine
    schedule with model-axis parallelism (both factories share the
    ``mod_init``/``return_modifier`` handoff contract)."""
    if not 0 < coarse_steps < steps:
        raise ValueError(f"coarse_steps must be in (0, {steps}), "
                         f"got {coarse_steps}")
    if scale < 2:
        raise ValueError(f"multigrid scale must be ≥ 2, got {scale}")
    if param_dtype is not None:
        # cast ONCE and share: each sub-runner would otherwise materialize
        # its own param_dtype copy of every surrogate (~300 MB doubled for
        # the 4-model ensemble at bf16)
        import dataclasses

        cast = lambda x: (x.astype(param_dtype)
                          if jnp.issubdtype(x.dtype, jnp.floating) else x)
        models = [dataclasses.replace(m, params=jax.tree.map(cast, m.params))
                  for m in models]
        param_dtype = None
    if coarse_frame_chunk is ...:
        # the coarse phase's activations are 1/scale² the fine phase's, so
        # the fine chunk size is a safe (if conservative) default there
        # ('auto' re-resolves per phase against each phase's resolution)
        coarse_frame_chunk = frame_chunk
    factory = runner_factory or make_sharded_i2v_runner
    # param_dtype was normalized to None by the shared cast above, so both
    # factories see the same kwargs (the ensemble factory has no param_dtype)
    coarse = factory(
        models, mesh, steps=coarse_steps, step_size=step_size,
        epsilon=epsilon, donate=donate, frame_chunk=coarse_frame_chunk,
        return_modifier=True)
    fine = factory(
        models, mesh, steps=steps - coarse_steps, step_size=step_size,
        epsilon=epsilon, donate=donate, frame_chunk=frame_chunk)
    up = jax.jit(upsample_modifier, static_argnums=1)
    down = jax.jit(downsample_clips, static_argnums=1)

    def runner(clean01, n_real=None):
        _, costs_c, mod_c = coarse(down(clean01, scale), n_real=n_real)
        adv, costs_f = fine(clean01, n_real=n_real,
                            mod_init=up(mod_c, scale))
        return adv, jnp.concatenate([costs_c, costs_f])

    return runner
