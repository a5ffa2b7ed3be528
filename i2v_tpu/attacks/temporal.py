"""TemporalTranslation: video-domain transfer attack.

Reference: video_attacks.py:14-230. Per step it (1) builds ``kernlen``
temporally cycle-shifted clip variants, (2) queries the white-box gradient of
each, (3) smooths the variant-gradient stack with a 1-D kernel both aligned
('same position') and unshifted-back ('different position'), (4) mixes them
(1−w)·s + w·d, (5) optional momentum, (6) sign-step + ε-projection.

TPU re-design: the variant fan-out is a vmapped gather (no per-variant tensor
copies in Python), gradients are computed by a vmap-of-grad over the variant
axis inside lax.map chunks (the reference's ≤5-query sub-batching,
video_attacks.py:203-210, becomes a compile-time chunk size), and the kernel
smoothing is one tensordot. The whole step loop is a single jitted scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.api import VideoModel, rebind_params
from ..ops import losses, pixel, smoothing
from .core import Attack, SignAttackConfig, run_sign_attack


class TemporalTranslation(Attack):
    """params: kernlen (default 15), momentum (bool), weight (w of unaligned
    grads), move_type ('adj'|'large'|'random'), kernel_mode
    ('gaussian'|'linear'|'uniform'/'random'), chunk (gradient queries per
    compile chunk; reference uses ceil(L/5), video_attacks.py:203-207)."""

    def __init__(self, model: VideoModel, params: dict | None = None,
                 epsilon=16 / 255, steps=10, delay=1.0):
        super().__init__("TemporalTranslation", model)
        p = dict(kernlen=15, momentum=False, weight=0.0, move_type="adj",
                 kernel_mode="gaussian", chunk=5)
        p.update(params or {})
        self.epsilon = epsilon
        self.steps = steps
        self.step_size = epsilon / steps
        self.delay = delay
        self.kernlen = int(p["kernlen"])
        self.momentum = bool(p["momentum"])
        self.weight = float(p["weight"])
        self.move_type = str(p["move_type"])
        self.kernel_mode = str(p["kernel_mode"])
        self.chunk = int(p["chunk"])
        max_move = (self.kernlen - 1) // 2
        self.moves = tuple(range(-max_move, max_move + 1))
        self._kernel = smoothing.temporal_kernel(self.kernlen, self.kernel_mode)
        self._jit_cache: dict = {}

    # -- shift schedules ------------------------------------------------------
    def _static_shifts(self, frames: int):
        if self.move_type == "adj":
            return jnp.asarray(self.moves, dtype=jnp.int32)
        if self.move_type == "large":
            return jnp.asarray(
                [smoothing.large_move_shift(m, frames) for m in self.moves],
                dtype=jnp.int32,
            )
        return None  # 'random': per-step dynamic shifts

    def _attack01(self, clean01, labels, rng):
        key = (clean01.shape, self._targeted)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(self._build_runner(clean01.shape))
        return self._jit_cache[key](self.model.params, clean01, labels, rng)

    def _build_runner(self, shape):
        targeted = self._targeted
        kernel = jnp.asarray(self._kernel)
        weight = self.weight
        moves = jnp.asarray(self.moves, dtype=jnp.int32)
        frames = shape[2]
        static_shifts = self._static_shifts(frames)
        d = len(self.moves)
        chunk = max(1, min(self.chunk, d))
        while d % chunk:
            chunk -= 1
        cfg = SignAttackConfig(epsilon=self.epsilon, steps=self.steps,
                               step_size=self.step_size,
                               use_momentum=self.momentum, decay=self.delay,
                               grad_norm="frame" if self.momentum else None)

        def runner(params, clean01, labels, rng):
            model = rebind_params(self.model, params)

            def ce_cost(x_norm, labels):
                return targeted * losses.cross_entropy(model.apply_norm(x_norm), labels)

            cost_and_grad_one = jax.value_and_grad(ce_cost)

            def variant_grads(adv_norm, labels, shifts):
                """Per-step cost + (D, B, C, T, H, W) variant gradients."""
                variants = smoothing.cycle_variants(adv_norm, shifts)

                def per_chunk(vc):
                    return jax.vmap(lambda v: cost_and_grad_one(v, labels))(vc)

                grouped = variants.reshape(d // chunk, chunk, *variants.shape[1:])
                costs, g = jax.lax.map(per_chunk, grouped)
                return costs.reshape(d).mean(), g.reshape(d, *variants.shape[1:])

            def tt_grad_fn(adv01, labels, key):
                """The TemporalTranslation gradient, as a core-engine GradFn:
                variant fan-out → chunked grads → unshift → 1-D smooth → mix."""
                if static_shifts is not None:
                    shifts = static_shifts
                else:  # 'random' move type (video_attacks.py:124-140)
                    rand = jax.random.randint(key, (d,), 0, 101) % frames
                    shifts = jnp.where(moves == 0, 0, jnp.sign(moves) * rand)
                adv_norm = pixel.normalize(adv01, channel_axis=1)
                cost, g = variant_grads(adv_norm, labels, shifts)
                # unshift each variant's gradient by the NOMINAL move list —
                # the reference rolls back by self.cycle_move_list even when
                # 'large'/'random' applied a different actual shift
                # (video_attacks.py:169-170); parity requires the same.
                idx = (jnp.arange(frames)[None, :] + moves[:, None]) % frames
                g_unshift = jax.vmap(lambda gi, ix: jnp.take(gi, ix, axis=2))(g, idx)
                s_grad = smoothing.smooth_variant_grads(g, kernel)
                d_grad = smoothing.smooth_variant_grads(g_unshift, kernel)
                return cost, (1.0 - weight) * s_grad + weight * d_grad

            return run_sign_attack(tt_grad_fn, clean01, labels, cfg, rng=rng)

        return runner
