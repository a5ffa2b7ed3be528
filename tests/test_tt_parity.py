"""End-to-end TemporalTranslation parity vs an independent oracle.

The oracle re-expresses the REFERENCE algorithm (video_attacks.py:93-229)
step by step with python loops + np.roll — variants built with _cycle_move
semantics (new[(i+m)%T] = old[i] ≡ roll(+m)), per-variant CE gradients,
1-D kernel smoothing as a matmul over the flattened stack, unshift of the
unaligned stack by the NOMINAL move list (video_attacks.py:169-170),
(1-w)·s + w·d mixing, frame-level norm_grads + momentum (utils.py:58-67,
video_attacks.py:217-221), and the unnormalize → sign step → ε-project →
[0,1] clamp → renormalize tail (video_attacks.py:224-228).

Gradients themselves come from the same Flax bundle in both paths (their
parity vs torch is covered by the converter/loss tests); what this locks in
is every TemporalTranslation-specific transformation around them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import i2v_tpu.attacks as attacks
from i2v_tpu.models import TinyVideoNet, init_bundle
from i2v_tpu.ops import losses, pixel, smoothing

EPS = 16 / 255


@pytest.fixture(scope="module")
def bundle():
    clip = jnp.zeros((1, 3, 8, 32, 32), dtype=jnp.float32)
    return init_bundle(TinyVideoNet(), clip, "tinyvid", tap_keys=())


def _oracle_tt(bundle, videos_norm, labels, *, kernlen, steps, weight,
               momentum, move_type, delay=1.0):
    """Reference TemporalTranslation re-expressed independently (see module
    docstring). Frame count comes from the clip (the reference hardcodes 32;
    the test clip is shorter, matching the port's generalization)."""
    frames = videos_norm.shape[2]
    k = (kernlen - 1) // 2
    moves = list(range(-k, k + 1))
    kernel = np.asarray(smoothing.temporal_kernel(kernlen, "gaussian"),
                        np.float64)
    step_size = EPS / steps

    grad_fn = jax.jit(jax.grad(
        lambda x, y: losses.cross_entropy(bundle.apply_norm(x), y)))

    def applied_shift(m):
        if move_type == "large":
            return smoothing.large_move_shift(m, frames)
        return m  # 'adj'

    adv = np.asarray(videos_norm, np.float32)
    clean01 = np.asarray(pixel.unnormalize(videos_norm, channel_axis=1))
    mom = np.zeros_like(adv)
    for _ in range(steps):
        grads = []
        for m in moves:
            variant = np.roll(adv, applied_shift(m), axis=2)
            grads.append(np.asarray(grad_fn(jnp.asarray(variant), labels)))
        stack = np.stack(grads)  # (D, B, C, T, H, W)
        unshifted = np.stack(
            [np.roll(g, -m, axis=2) for g, m in zip(grads, moves)])
        s = (kernel @ stack.reshape(kernlen, -1)).reshape(adv.shape)
        d = (kernel @ unshifted.reshape(kernlen, -1)).reshape(adv.shape)
        grad = ((1.0 - weight) * s + weight * d).astype(np.float32)
        if momentum:
            norm = np.mean(np.abs(grad), axis=(1, 3, 4), keepdims=True)
            grad = grad / norm
            grad = grad + mom * delay
            mom = grad
        adv01 = np.asarray(pixel.unnormalize(jnp.asarray(adv), channel_axis=1))
        adv01 = adv01 + step_size * np.sign(grad)
        delta = np.clip(adv01 - clean01, -EPS, EPS)
        adv01 = np.clip(clean01 + delta, 0.0, 1.0)
        adv = np.asarray(pixel.normalize(jnp.asarray(adv01), channel_axis=1))
    return adv


@pytest.mark.parametrize("move_type,momentum,weight", [
    ("adj", False, 0.0),
    ("adj", True, 0.4),
    ("large", True, 0.5),
])
def test_tt_matches_reference_oracle(bundle, move_type, momentum, weight):
    rng = np.random.RandomState(42)
    videos = pixel.normalize(
        jnp.asarray(rng.rand(1, 3, 8, 32, 32).astype(np.float32)),
        channel_axis=1)
    labels = jnp.asarray([2])
    params = dict(kernlen=3, momentum=momentum, weight=weight,
                  move_type=move_type, kernel_mode="gaussian", chunk=3)
    atk = attacks.TemporalTranslation(bundle, params, steps=3)
    got = np.asarray(atk(videos, labels))
    want = _oracle_tt(bundle, videos, labels, kernlen=3, steps=3,
                      weight=weight, momentum=momentum, move_type=move_type)
    # fp32 conv nondeterminism can flip the sign of near-zero gradient pixels;
    # demand near-exact agreement on the overwhelming majority
    agree = np.isclose(got, want, atol=2e-3)
    assert agree.mean() > 0.999, f"only {agree.mean():.4%} pixels agree"
    np.testing.assert_allclose(got.mean(), want.mean(), atol=1e-4)
