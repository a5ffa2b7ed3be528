"""Chained runner segments ≡ one contiguous run (opt_state_io).

The sharded runner's ``opt_state_io``/``return_modifier``/``mod_init``/
``opt_init`` plumbing must make N chained short calls BIT-IDENTICAL to one
long run: this is both attack-state checkpoint/resume (the reference's
killed runs restart from scratch — SURVEY §5) and the measurement device
for the true-f32 HIGHEST cost on a worker that crashes long HIGHEST
programs (tools/perf_probe.py exec_ens16_f32hp_chained, VERDICT r4 next
#5). It also pins the structural assumption that optax.adam's state is
(ScaleByAdamState, EmptyState) — if an optax upgrade reshapes that, these
tests fail before the probe silently measures a different optimization.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from i2v_tpu.models import get_image_models
from i2v_tpu.parallel import attack_mesh
from i2v_tpu.parallel.sharded import make_sharded_i2v_runner

ENS_NAMES = ["resnet", "vgg"]
ENS_DEPTHS = {"resnet": 2, "vgg": 3}


@pytest.fixture(scope="module")
def setup():
    models = get_image_models(ENS_NAMES, ENS_DEPTHS, tiny=True, input_hw=32)
    mesh = attack_mesh()
    rng = np.random.RandomState(0)
    clean = jnp.asarray(rng.rand(2, 3, 8, 32, 32).astype(np.float32))
    return models, mesh, clean


def test_optax_adam_state_structure():
    import optax

    opt = optax.adam(0.005, b1=0.9, b2=0.999, eps=1e-8, eps_root=0.0)
    st = opt.init(jnp.zeros((3,)))
    assert isinstance(st, tuple) and len(st) == 2
    assert isinstance(st[0], optax.ScaleByAdamState)
    assert isinstance(st[1], optax.EmptyState)
    rebuilt = (optax.ScaleByAdamState(count=st[0].count, mu=st[0].mu,
                                      nu=st[0].nu), optax.EmptyState())
    assert jax.tree.structure(rebuilt) == jax.tree.structure(st)


def test_chained_segments_bit_identical(setup):
    models, mesh, clean = setup
    full = make_sharded_i2v_runner(models, mesh, steps=12, step_size=0.005)
    adv_full, costs_full = full(clean)

    seg = make_sharded_i2v_runner(models, mesh, steps=4, step_size=0.005,
                                  return_modifier=True, opt_state_io=True)
    mod = opt = None
    costs_all = []
    for _ in range(3):
        adv, costs, mod, opt = seg(clean, mod_init=mod, opt_init=opt)
        costs_all.append(np.asarray(costs))
    np.testing.assert_array_equal(np.concatenate(costs_all),
                                  np.asarray(costs_full))
    np.testing.assert_array_equal(np.asarray(adv), np.asarray(adv_full))


def test_explicit_zero_opt_init_matches_default(setup):
    """Feeding explicit zeros as opt_init compiles ONE program for every
    segment of a chain (the perf-probe trick) and must equal the opt.init
    path bit-for-bit."""
    models, mesh, clean = setup
    seg = make_sharded_i2v_runner(models, mesh, steps=5, step_size=0.005,
                                  return_modifier=True, opt_state_io=True)
    adv_a, costs_a, mod_a, opt_a = seg(clean)

    from i2v_tpu.attacks.i2v import MODIFIER_INIT

    b, c, t, h, w = clean.shape
    mod0 = jnp.full((b * t, h, w, c), MODIFIER_INIT, jnp.float32)
    zero_opt = (jnp.zeros([], jnp.int32), jnp.zeros_like(mod0),
                jnp.zeros_like(mod0))
    adv_b, costs_b, mod_b, opt_b = seg(clean, mod_init=mod0,
                                       opt_init=zero_opt)
    np.testing.assert_array_equal(np.asarray(costs_a), np.asarray(costs_b))
    np.testing.assert_array_equal(np.asarray(adv_a), np.asarray(adv_b))
    np.testing.assert_array_equal(np.asarray(opt_a[0]), np.asarray(opt_b[0]))


def test_chained_opt_state_count_advances(setup):
    models, mesh, clean = setup
    seg = make_sharded_i2v_runner(models, mesh, steps=4, step_size=0.005,
                                  return_modifier=True, opt_state_io=True)
    _, _, mod, opt = seg(clean)
    assert int(np.asarray(opt[0])) == 4
    _, _, mod, opt = seg(clean, mod_init=mod, opt_init=opt)
    assert int(np.asarray(opt[0])) == 8
