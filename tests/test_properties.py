"""Property-based invariants (SURVEY.md §4: 'property-test the ε-ball/[0,1]
invariants after every step on random inputs')."""

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from i2v_tpu.ops import pixel

_settings = settings(max_examples=15, deadline=None)


def _arrays(draw, lo=0.0, hi=1.0):
    shape = draw(st.tuples(st.integers(1, 3), st.just(3), st.integers(1, 4),
                           st.integers(2, 6), st.integers(2, 6)))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.RandomState(seed)
    return rng.uniform(lo, hi, size=shape).astype(np.float32)


@_settings
@given(st.data(), st.floats(1 / 255, 64 / 255))
def test_project_linf_invariants(data, eps):
    clean = jnp.asarray(_arrays(data.draw))
    adv = clean + jnp.asarray(
        np.random.RandomState(0).uniform(-0.5, 0.5, clean.shape).astype(np.float32))
    out = np.asarray(pixel.project_linf(adv, clean, eps))
    assert (out >= 0).all() and (out <= 1).all()
    assert (np.abs(out - np.asarray(clean)) <= eps + 1e-6).all()


@_settings
@given(st.data(), st.floats(1 / 255, 64 / 255))
def test_project_idempotent(data, eps):
    clean = jnp.asarray(_arrays(data.draw))
    adv = clean + 0.3
    once = pixel.project_linf(adv, clean, eps)
    twice = pixel.project_linf(once, clean, eps)
    np.testing.assert_allclose(np.asarray(once), np.asarray(twice), atol=1e-7)


@_settings
@given(st.data(), st.floats(1 / 255, 64 / 255), st.floats(-1, 1))
def test_rebuild_adv_in_ball(data, eps, mod_scale):
    clean = jnp.asarray(_arrays(data.draw))
    modifier = jnp.full_like(clean, mod_scale)
    out = np.asarray(pixel.rebuild_adv(clean, modifier, eps))
    assert (out >= 0).all() and (out <= 1).all()
    assert (np.abs(out - np.asarray(clean)) <= eps + 1e-6).all()


@_settings
@given(st.data(), st.floats(1 / 255, 32 / 255), st.floats(1e-4, 0.1))
def test_sign_step_within_ball(data, eps, alpha):
    clean = jnp.asarray(_arrays(data.draw))
    grad = jnp.asarray(
        np.random.RandomState(1).randn(*clean.shape).astype(np.float32))
    adv = clean
    for _ in range(3):
        adv = pixel.sign_step_project(adv, grad, clean, alpha, eps)
    a = np.asarray(adv)
    assert (a >= 0).all() and (a <= 1).all()
    assert (np.abs(a - np.asarray(clean)) <= eps + 1e-6).all()


@_settings
@given(st.data())
def test_normalize_inverse(data):
    x = jnp.asarray(_arrays(data.draw))
    y = pixel.unnormalize(pixel.normalize(x, channel_axis=1), channel_axis=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=2e-6)
