"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2v_tpu.models import get_image_models
from i2v_tpu.parallel import attack_mesh, clip_sharding, frame_sharding, shard_clips
from i2v_tpu.parallel.dist import process_shard_bounds
from i2v_tpu.parallel.sharded import make_sharded_i2v_runner


def test_mesh_factorization():
    mesh = attack_mesh()
    assert mesh.devices.size == 8
    assert mesh.shape["data"] * mesh.shape["frames"] == 8
    m2 = attack_mesh(data=4)
    assert m2.shape == {"data": 4, "frames": 2}


def test_sharded_i2v_matches_single_device():
    models = get_image_models(["resnet"], {"resnet": 2}, tiny=True, input_hw=32)
    mesh = attack_mesh()
    runner = make_sharded_i2v_runner(models, mesh, steps=3)
    clean01 = jnp.asarray(np.random.RandomState(0).rand(4, 3, 8, 32, 32).astype(np.float32))
    adv_sharded, costs_sharded = runner(shard_clips(clean01, mesh))

    mesh1 = attack_mesh(jax.devices()[:1])
    runner1 = make_sharded_i2v_runner(models, mesh1, steps=3)
    adv_single, costs_single = runner1(shard_clips(clean01, mesh1))

    np.testing.assert_allclose(
        np.asarray(adv_sharded), np.asarray(adv_single), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(costs_sharded), np.asarray(costs_single), rtol=1e-5
    )


def test_sharded_aens_runs():
    models = get_image_models(
        ["resnet", "alexnet"], {"resnet": [1, 2], "alexnet": [2, 3]},
        tiny=True, input_hw=32)
    mesh = attack_mesh()
    runner = make_sharded_i2v_runner(models, mesh, steps=2, adaptive=True)
    clean01 = jnp.full((2, 3, 8, 32, 32), 0.4, jnp.float32)
    adv, costs = runner(shard_clips(clean01, mesh))
    assert adv.shape == clean01.shape
    assert np.isfinite(np.asarray(costs)).all()


def test_frame_chunked_grad_accumulation_matches_full_batch():
    """frame_chunk computes the SAME costs/adv as the full-batch program —
    the objective is per-frame separable, so chunked gradient accumulation
    is exact, not an approximation. Covers I2V and adaptive AENS."""
    rng = np.random.RandomState(3)
    clean01 = jnp.asarray(rng.rand(2, 3, 8, 32, 32).astype(np.float32))
    mesh = attack_mesh(jax.devices()[:1])

    models = get_image_models(["resnet"], {"resnet": 2}, tiny=True, input_hw=32)
    full = make_sharded_i2v_runner(models, mesh, steps=3)
    chunked = make_sharded_i2v_runner(models, mesh, steps=3, frame_chunk=4)
    adv_f, costs_f = full(shard_clips(clean01, mesh))
    adv_c, costs_c = chunked(shard_clips(clean01, mesh))
    np.testing.assert_allclose(np.asarray(costs_c), np.asarray(costs_f),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(adv_c), np.asarray(adv_f), atol=2e-6)

    # chunk_unroll is a SCHEDULING knob: same chunk math, but XLA fuses the
    # unrolled pair differently, so agreement is last-ulp (measured 6e-8
    # rel on CPU), not bit-exact — tolerances reflect that
    unrolled = make_sharded_i2v_runner(models, mesh, steps=3, frame_chunk=4,
                                       chunk_unroll=2)
    adv_u, costs_u = unrolled(shard_clips(clean01, mesh))
    np.testing.assert_allclose(np.asarray(costs_u), np.asarray(costs_c),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(adv_u), np.asarray(adv_c),
                               atol=2e-6)

    amodels = get_image_models(
        ["resnet", "alexnet"], {"resnet": [1, 2], "alexnet": [2, 3]},
        tiny=True, input_hw=32)
    for kw in ({"adaptive": True, "aens_momentum": 0.5},
               {"adaptive": True, "coef_ce": True}):
        full = make_sharded_i2v_runner(amodels, mesh, steps=3, **kw)
        chunked = make_sharded_i2v_runner(amodels, mesh, steps=3,
                                          frame_chunk=8, **kw)
        _, costs_f = full(shard_clips(clean01, mesh))
        _, costs_c = chunked(shard_clips(clean01, mesh))
        np.testing.assert_allclose(np.asarray(costs_c), np.asarray(costs_f),
                                   rtol=1e-5, err_msg=str(kw))


@pytest.mark.slow
def test_full_size_ens_f32_vs_bf16_cost_trajectory():
    """Full-size 4-surrogate ENS: the bf16 cost trajectory must track f32
    within an explicit tolerance (VERDICT r1 weak #1 — the bf16 bench row is
    only publishable alongside a validated deviation). 32 frames @ 224²,
    3 steps, random weights (deviation is architecture/dtype-driven, not
    weight-driven)."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        models32 = get_image_models(
            ["resnet", "vgg", "squeezenet", "alexnet"],
            {"resnet": 2, "vgg": 3, "squeezenet": 2, "alexnet": 3},
            input_hw=224, dtype=jnp.float32)
        models16 = get_image_models(
            ["resnet", "vgg", "squeezenet", "alexnet"],
            {"resnet": 2, "vgg": 3, "squeezenet": 2, "alexnet": 3},
            input_hw=224, dtype=jnp.bfloat16)
    mesh = attack_mesh(data=1)  # all 8 CPU devices on the frame axis
    clean01 = jnp.asarray(
        np.random.RandomState(0).rand(1, 3, 32, 224, 224).astype(np.float32))
    costs = {}
    for tag, models in (("f32", models32), ("bf16", models16)):
        runner = make_sharded_i2v_runner(models, mesh, steps=2,
                                         step_size=0.005)
        _, c = runner(shard_clips(clean01, mesh))
        costs[tag] = np.asarray(c)
    # the cosine objective starts at ~n_taps·n_frames (flat maximum) and
    # descends; bf16 matmul noise must stay within 1% of the f32 trajectory
    rel = np.abs(costs["bf16"] - costs["f32"]) / np.abs(costs["f32"])
    assert rel.max() < 1e-2, f"bf16 deviates {rel.max():.4f} from f32: " \
                             f"{costs['bf16']} vs {costs['f32']}"


def test_param_dtype_cast_runs():
    models = get_image_models(["resnet"], {"resnet": 2}, tiny=True, input_hw=32)
    mesh = attack_mesh(jax.devices()[:1])
    runner = make_sharded_i2v_runner(models, mesh, steps=2,
                                     param_dtype=jnp.bfloat16)
    clean01 = jnp.full((2, 3, 8, 32, 32), 0.4, jnp.float32)
    adv, costs = runner(shard_clips(clean01, mesh))
    assert adv.dtype == jnp.float32 and np.isfinite(np.asarray(costs)).all()


def test_sharded_attack_pads_indivisible_trailing_batch():
    """A trailing partial batch (b % mesh data axis != 0) must run through
    the same sharded program via pad-and-slice, and the pad clips must not
    change the real clips' adversarial output."""
    from i2v_tpu.parallel.sharded import ShardedImageGuidedAttack

    models = get_image_models(["resnet"], {"resnet": 2}, tiny=True, input_hw=32)
    mesh = attack_mesh()
    atk = ShardedImageGuidedAttack(models, mesh, steps=2, step_size=0.005)
    rng = np.random.RandomState(0)
    videos8 = jnp.asarray(rng.rand(8, 3, 8, 32, 32).astype(np.float32))
    adv8 = np.asarray(atk(videos8, video_names=[f"v{i}" for i in range(8)]))
    # trailing batch of 3 (indivisible by data=4): same first-3 result
    adv3 = np.asarray(atk(videos8[:3], video_names=["v0", "v1", "v2"]))
    assert adv3.shape == (3, 3, 8, 32, 32)
    np.testing.assert_allclose(adv3, adv8[:3], atol=2e-6)


def test_sharded_attack_u8_ingress_bitwise_matches_f32():
    """Raw uint8 (B,T,H,W,3) ingest must produce bit-identical adversarial
    outputs to the normalized-f32 (B,3,T,H,W) path (ops.pixel.ingest_u8_clips
    reproduces the f32 path's clean01 exactly) — including through the
    pad-and-slice trailing-batch path, whose clip-length axis differs
    between the two layouts."""
    from i2v_tpu.data.transforms import u8_clip_to_normalized
    from i2v_tpu.parallel.sharded import ShardedImageGuidedAttack

    models = get_image_models(["resnet"], {"resnet": 2}, tiny=True, input_hw=32)
    mesh = attack_mesh()
    rng = np.random.RandomState(7)
    u8 = rng.randint(0, 256, (4, 8, 32, 32, 3), dtype=np.uint8)
    norm = np.stack([u8_clip_to_normalized(c) for c in u8])

    atk = ShardedImageGuidedAttack(models, mesh, steps=2, step_size=0.005)
    adv_f32 = np.asarray(atk(jnp.asarray(norm)))
    adv_u8 = np.asarray(atk(u8))
    np.testing.assert_array_equal(adv_u8, adv_f32)
    # trailing partial batch (3 % data-axis != 0) through the u8 layout
    adv_u8_3 = np.asarray(atk(u8[:3]))
    assert adv_u8_3.shape == (3, 3, 8, 32, 32)
    np.testing.assert_array_equal(adv_u8_3, adv_f32[:3])


def test_sharded_pad_is_inert_for_adaptive_aens():
    """Adaptive AENS shares per-batch softmax coefficients across clips, so
    pad-and-slice is only output-preserving if the pad frames are masked out
    of the per-tap loss sums (the runner's frame mask). Two checks, both
    same-mesh (the adaptive dynamics start at the cosine flat maximum, where
    cross-mesh reduction-order noise amplifies — same-mesh is bit-exact):

    1. runner: padded batch + mask == true unpadded batch, exactly.
    2. adapter: ShardedImageGuidedAttack pads/slices/threads n_real so its
       result equals the masked runner on the identical mesh — including
       the persisted cross-call coefficient state.
    """
    from i2v_tpu.ops import pixel
    from i2v_tpu.parallel.sharded import (
        ShardedImageGuidedAttack, make_sharded_i2v_runner)

    models = get_image_models(
        ["resnet", "alexnet"], {"resnet": [1, 2], "alexnet": [2]},
        tiny=True, input_hw=32)
    rng = np.random.RandomState(1)
    videos3 = jnp.asarray(rng.rand(3, 3, 8, 32, 32).astype(np.float32))
    videos4 = jnp.concatenate([videos3, videos3[-1:]], axis=0)
    kw = dict(steps=3, step_size=0.005, adaptive=True, aens_momentum=0.5)

    # (1) runner-level inertness, 1-device mesh: bit-exact
    mesh1 = attack_mesh(jax.devices()[:1])
    r_ref = make_sharded_i2v_runner(models, mesh1, **kw)
    r_pad = make_sharded_i2v_runner(models, mesh1, **kw)
    c3 = pixel.unnormalize(videos3, channel_axis=1)
    c4 = pixel.unnormalize(videos4, channel_axis=1)
    adv_ref, costs_ref = r_ref(shard_clips(c3, mesh1))
    adv_pad, costs_pad = r_pad(shard_clips(c4, mesh1), n_real=3)
    np.testing.assert_array_equal(np.asarray(adv_pad)[:3], np.asarray(adv_ref))
    np.testing.assert_array_equal(np.asarray(costs_pad), np.asarray(costs_ref))

    # (2) adapter wiring on the default (data=4) mesh vs the masked runner
    # on the SAME mesh: b=3 pads to 4 with a repeat of the last clip
    mesh = attack_mesh()
    atk = ShardedImageGuidedAttack(models, mesh, **kw)
    oracle = make_sharded_i2v_runner(models, mesh, **kw)
    adv3 = np.asarray(atk(videos3, video_names=["a", "b", "c"]))
    want, want_costs = oracle(shard_clips(c4, mesh), n_real=3)
    want = np.asarray(pixel.normalize(want[:3], channel_axis=1))
    np.testing.assert_allclose(adv3, want, atol=2e-6)
    got_costs = np.float32(
        [atk.loss_info["a"][i]["cost"] for i in range(3)])
    np.testing.assert_allclose(got_costs, np.asarray(want_costs), rtol=1e-6)
    # second call (divisible batch of 4): persisted coeffs must match too
    videos4b = jnp.asarray(rng.rand(4, 3, 8, 32, 32).astype(np.float32))
    adv2 = np.asarray(atk(videos4b, video_names=list("defg")))
    want2, _ = oracle(
        shard_clips(pixel.unnormalize(videos4b, channel_axis=1), mesh))
    want2 = np.asarray(pixel.normalize(want2, channel_axis=1))
    np.testing.assert_allclose(adv2, want2, atol=2e-6)


def test_sharded_frame_chunk_trailing_batch_snaps_to_divisor():
    """--sharded --frame_chunk on a trailing partial batch: when the chunk
    doesn't divide the frame batch, the runner snaps to the largest divisor
    that fits instead of raising (exact — frame-separable objective)."""
    models = get_image_models(["resnet"], {"resnet": 2}, tiny=True, input_hw=32)
    mesh = attack_mesh(jax.devices()[:1])
    clean01 = jnp.asarray(
        np.random.RandomState(2).rand(3, 3, 8, 32, 32).astype(np.float32))
    full = make_sharded_i2v_runner(models, mesh, steps=2)
    # 24 frames, chunk 16 → snaps to 12
    chunked = make_sharded_i2v_runner(models, mesh, steps=2, frame_chunk=16)
    adv_f, costs_f = full(shard_clips(clean01, mesh))
    adv_c, costs_c = chunked(shard_clips(clean01, mesh))
    np.testing.assert_allclose(np.asarray(costs_c), np.asarray(costs_f),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(adv_c), np.asarray(adv_f), atol=2e-6)


def test_resolve_frame_chunk_table():
    """'auto' resolves to the measured optima (PERF_PROBE.json exec_ens16_*)
    and re-expresses them as a constant activation-byte budget for other
    dtypes/resolutions; ints and None pass through; junk raises."""
    from i2v_tpu.parallel.sharded import resolve_frame_chunk

    bf16, f32 = jnp.bfloat16, jnp.float32
    # production resolution: the two measured sweet spots
    assert resolve_frame_chunk("auto", 512, (224, 224), bf16) == 256
    assert resolve_frame_chunk("auto", 512, (224, 224), f32) == 128
    # multigrid's 112² bf16 coarse phase: budget covers the batch → unchunked
    assert resolve_frame_chunk("auto", 512, (112, 112), bf16) is None
    # the chunk is global and sharded, so the budget scales with the mesh
    assert resolve_frame_chunk("auto", 4096, (224, 224), bf16,
                               n_devices=8) == 2048
    assert resolve_frame_chunk("auto", 2048, (224, 224), bf16,
                               n_devices=8) is None
    assert resolve_frame_chunk(64, 512, (224, 224), bf16) == 64
    assert resolve_frame_chunk(None, 512, (224, 224), bf16) is None
    with pytest.raises(ValueError):
        resolve_frame_chunk("fast", 512, (224, 224), bf16)


def test_auto_frame_chunk_runner_matches_explicit(monkeypatch):
    """frame_chunk='auto' resolves at trace time into the SAME program the
    equivalent explicit chunk builds (bit-identical outputs). The byte
    budget is shrunk so 'auto' picks a chunked program at tiny test shapes;
    a junk string raises at build time."""
    from i2v_tpu.parallel import sharded as sh

    rng = np.random.RandomState(5)
    clean01 = jnp.asarray(rng.rand(2, 3, 8, 32, 32).astype(np.float32))
    mesh = attack_mesh(jax.devices()[:1])
    models = get_image_models(["resnet"], {"resnet": 2}, tiny=True,
                              input_hw=32)
    # budget = 4 frames of 32² f32 → auto resolves to chunk 4 (16 frames)
    monkeypatch.setattr(sh, "AUTO_CHUNK_BYTES", 4 * 4 * 32 * 32)
    auto = sh.make_sharded_i2v_runner(models, mesh, steps=2,
                                      frame_chunk="auto")
    expl = sh.make_sharded_i2v_runner(models, mesh, steps=2, frame_chunk=4)
    adv_a, costs_a = auto(shard_clips(clean01, mesh))
    adv_e, costs_e = expl(shard_clips(clean01, mesh))
    np.testing.assert_array_equal(np.asarray(costs_a), np.asarray(costs_e))
    np.testing.assert_array_equal(np.asarray(adv_a), np.asarray(adv_e))
    with pytest.raises(ValueError):
        sh.make_sharded_i2v_runner(models, mesh, steps=2, frame_chunk="fast")


def test_auto_frame_chunk_model_parallel(monkeypatch):
    """'auto' on the model-axis runner resolves per DEVICE against the local
    frame slice and matches the explicit-chunk trajectory."""
    from i2v_tpu.parallel import sharded as sh
    from i2v_tpu.parallel.ensemble import (ensemble_mesh,
                                           make_ensemble_parallel_runner)

    models = get_image_models(
        ["resnet", "alexnet"], {"resnet": [1, 2], "alexnet": [2, 3]},
        tiny=True, input_hw=32)
    clean01 = jnp.asarray(
        np.random.RandomState(9).rand(2, 3, 8, 32, 32).astype(np.float32))
    mesh = ensemble_mesh(jax.devices()[:4], model=2)  # local slice = 8 frames
    monkeypatch.setattr(sh, "AUTO_CHUNK_BYTES", 4 * 4 * 32 * 32)
    auto = make_ensemble_parallel_runner(models, mesh, steps=2,
                                         frame_chunk="auto")
    expl = make_ensemble_parallel_runner(models, mesh, steps=2, frame_chunk=4)
    _, costs_a = auto(clean01)
    _, costs_e = expl(clean01)
    np.testing.assert_array_equal(np.asarray(costs_a), np.asarray(costs_e))


def test_shardings():
    mesh = attack_mesh()
    cs, fs = clip_sharding(mesh), frame_sharding(mesh)
    x = shard_clips(jnp.zeros((8, 3, 4, 8, 8)), mesh)
    assert x.sharding == cs
    f = jax.device_put(jnp.zeros((16, 8, 8, 3)), fs)
    assert f.sharding.is_equivalent_to(fs, 4)


def test_process_shard_bounds():
    # reference contract: 400 samples, 4 shards → 100 each
    assert process_shard_bounds(400, 4, 0) == (0, 100)
    assert process_shard_bounds(400, 4, 3) == (300, 400)
    # remainder goes to the last shard
    assert process_shard_bounds(101, 4, 3) == (75, 101)
    # single process default
    assert process_shard_bounds(10) == (0, 10)


def test_dryrun_multichip_8():
    import sys

    if "/root/repo" not in sys.path:
        sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_ensemble_parallel_gradient_matches_sequential():
    """The psum'd model-axis gradient equals the sequential ensemble gradient.

    (Full-trajectory comparison is not meaningful on random-init models:
    step-0 gradients are ~1e-6 and Adam's rsqrt amplifies float-summation-
    order differences chaotically; the per-step GRADIENT is the invariant.)
    """
    from i2v_tpu.parallel.ensemble import shard_map
    from jax.sharding import PartitionSpec as P

    from i2v_tpu.attacks.i2v import MODIFIER_INIT
    from i2v_tpu.models import get_image_models
    from i2v_tpu.ops import losses, pixel
    from i2v_tpu.ops import pallas_kernels as pk
    from i2v_tpu.parallel.ensemble import ensemble_mesh, make_ensemble_parallel_runner

    models = get_image_models(
        ["resnet", "alexnet"], {"resnet": 2, "alexnet": 3}, tiny=True,
        input_hw=32)
    clean01 = jnp.asarray(
        np.random.RandomState(0).rand(2, 3, 8, 32, 32).astype(np.float32))
    frames = jnp.asarray(pixel.flatten_clip_to_frames(clean01))

    def taps_of(g, fr):
        return list(models[g].apply01_taps(fr)[1])

    clean_all = [jax.lax.stop_gradient(t) for g in range(2) for t in taps_of(g, frames)]

    def seq_obj(mod):
        adv = pk.rebuild_adv(frames, mod, 16 / 255)
        taps = [t for g in range(2) for t in taps_of(g, adv)]
        return losses.i2v_cost(taps, clean_all)

    mod0 = jnp.full_like(frames, MODIFIER_INIT)
    cost_ref, g_ref = jax.value_and_grad(seq_obj)(mod0)

    mesh = ensemble_mesh(jax.devices()[:4], model=2)

    def body(fr):
        clean = [[jax.lax.stop_gradient(t) for t in taps_of(g, fr)] for g in range(2)]

        def mk(g):
            def o(mod):
                adv = pk.rebuild_adv(fr, mod, 16 / 255)
                return losses.i2v_cost(taps_of(g, adv), clean[g])

            return jax.value_and_grad(o)

        gi = jax.lax.axis_index("model")
        c, gr = jax.lax.switch(gi, [mk(0), mk(1)], jnp.full_like(fr, MODIFIER_INIT))
        return (jax.lax.psum(c, "model") / mesh.shape["frames"],
                jax.lax.psum(gr, "model"))

    cost_par, g_par = jax.jit(shard_map(
        body, mesh=mesh, in_specs=P("frames"),
        out_specs=(P(), P("frames"))))(frames)
    # per-frame-shard costs differ; psum over 'frames' too for the total
    np.testing.assert_allclose(np.asarray(g_par), np.asarray(g_ref),
                               atol=1e-7, rtol=1e-3)

    # and the full runner executes end-to-end with finite outputs
    runner = make_ensemble_parallel_runner(models, mesh, steps=2)
    adv, costs = runner(clean01)
    assert adv.shape == clean01.shape
    assert np.isfinite(np.asarray(adv)).all()
    # per-step costs are the FULL-batch value (psum over model AND frames)
    np.testing.assert_allclose(float(costs[0]), float(cost_ref), rtol=1e-4)


def test_ensemble_parallel_trajectory_matches_sequential_adam():
    """Multi-step cost-trajectory parity of the model-axis runner vs a plain
    single-device Adam loop over the same objective. Exercises the flat
    clean-tap storage round trip (flatten→concat→pad→slice→reshape→recast)
    across every step: any corruption of the stored clean taps would bend
    the trajectory from step 1 on. 64² inputs give O(1)-scale costs, large
    enough that float-order chaos stays below rtol (unlike the 32² case
    documented in the gradient test above)."""
    from i2v_tpu.attacks.i2v import MODIFIER_INIT, adam_like_torch
    from i2v_tpu.models import get_image_models
    from i2v_tpu.ops import losses, pixel
    from i2v_tpu.ops import pallas_kernels as pk
    from i2v_tpu.parallel.ensemble import ensemble_mesh, make_ensemble_parallel_runner

    steps = 4
    models = get_image_models(
        ["resnet", "alexnet"], {"resnet": 2, "alexnet": 2}, tiny=True,
        input_hw=64)
    clean01 = jnp.asarray(
        np.random.RandomState(0).rand(2, 3, 8, 64, 64).astype(np.float32))
    frames = pixel.flatten_clip_to_frames(clean01)
    clean_taps = [jax.lax.stop_gradient(t)
                  for m in models for t in m.apply01_taps(frames)[1]]

    def obj(mod):
        adv = pk.rebuild_adv(frames, mod, 16 / 255)
        taps = [t for m in models for t in m.apply01_taps(adv)[1]]
        return losses.i2v_cost(taps, clean_taps)

    opt = adam_like_torch(0.005)
    mod = jnp.full_like(frames, MODIFIER_INIT)
    state = opt.init(mod)
    seq_costs = []
    for _ in range(steps):
        c, g = jax.value_and_grad(obj)(mod)
        seq_costs.append(float(c))
        upd, state = opt.update(g, state)
        mod = jax.tree.map(lambda a, b: a + b, mod, upd)

    runner = make_ensemble_parallel_runner(
        models, ensemble_mesh(jax.devices()[:4], model=2), steps=steps)
    _, costs = runner(clean01)
    np.testing.assert_allclose(np.asarray(costs), np.asarray(seq_costs),
                               rtol=1e-4)

    # pad-and-slice masking: a padded batch with n_real=1 must compute the
    # EXACT single-clip objective — pad frames are inert in cost & gradient
    frames1 = pixel.flatten_clip_to_frames(clean01[:1])
    clean_taps1 = [jax.lax.stop_gradient(t)
                   for m in models for t in m.apply01_taps(frames1)[1]]

    def obj1(mod):
        adv = pk.rebuild_adv(frames1, mod, 16 / 255)
        taps = [t for m in models for t in m.apply01_taps(adv)[1]]
        return losses.i2v_cost(taps, clean_taps1)

    mod = jnp.full_like(frames1, MODIFIER_INIT)
    state = opt.init(mod)
    seq1 = []
    for _ in range(steps):
        c, g = jax.value_and_grad(obj1)(mod)
        seq1.append(float(c))
        upd, state = opt.update(g, state)
        mod = jax.tree.map(lambda a, b: a + b, mod, upd)
    padded = jnp.concatenate([clean01[:1], clean01[:1]], axis=0)
    adv_pad, costs_pad = runner(padded, n_real=1)
    np.testing.assert_allclose(np.asarray(costs_pad), np.asarray(seq1),
                               rtol=1e-4)
    # (pixel-level comparison is NOT the invariant: reduction order differs
    # between the psum'd shards and the sequential loop and Adam amplifies
    # last-ulp differences chaotically — cost trajectory is; see the
    # test_i2v_parity.py methodology note)
    a = np.asarray(adv_pad[:1])
    assert (a >= 0).all() and (a <= 1).all()
    assert (np.abs(a - np.asarray(clean01[:1])) <= 16 / 255 + 1e-6).all()


def test_model_parallel_aens_matches_sharded_runner():
    """Adaptive AENS under model-axis parallelism: the per-tap coefficient
    signal assembled by disjoint static-offset embeddings + one psum must
    reproduce the data/frame-sharded runner's cost trajectory — including
    across TWO consecutive calls (coefficients persist call-to-call in both,
    TPAMI_attack.py:165,265). 64² inputs keep float-order chaos below rtol
    (see the trajectory test above)."""
    from i2v_tpu.parallel.ensemble import (ensemble_mesh,
                                           make_ensemble_parallel_runner)

    models = get_image_models(
        ["resnet", "alexnet"], {"resnet": [1, 2], "alexnet": [2, 3]},
        tiny=True, input_hw=64)
    clean01 = jnp.asarray(
        np.random.RandomState(5).rand(2, 3, 8, 64, 64).astype(np.float32))
    mesh1 = attack_mesh(jax.devices()[:1])
    for kw in ({"aens_momentum": 0.5}, {"coef_ce": True}):
        ref_runner = make_sharded_i2v_runner(
            models, mesh1, steps=3, adaptive=True, **kw)
        mp_runner = make_ensemble_parallel_runner(
            models, ensemble_mesh(jax.devices()[:4], model=2), steps=3,
            adaptive=True, **kw)
        for call in range(2):
            _, costs_ref = ref_runner(shard_clips(clean01, mesh1))
            _, costs_mp = mp_runner(clean01)
            np.testing.assert_allclose(
                np.asarray(costs_mp), np.asarray(costs_ref), rtol=2e-4,
                err_msg=f"{kw} call {call}")


def test_model_parallel_frame_chunk_is_exact():
    """frame_chunk on the model-axis runner computes the SAME cost
    trajectory as the unchunked program — exact accumulation over each
    device's local frame slice, for both the plain ENS objective and
    adaptive AENS. (Pixels are NOT compared: the lax.map chunk body fuses
    differently from the unchunked program inside the lax.switch branch,
    and the last-ulp gradient differences amplify chaotically through Adam
    from the cosine flat-maximum start — same methodology note as the
    oracle-parity tests.)"""
    from i2v_tpu.parallel.ensemble import (ensemble_mesh,
                                           make_ensemble_parallel_runner)

    models = get_image_models(
        ["resnet", "alexnet"], {"resnet": [1, 2], "alexnet": [2, 3]},
        tiny=True, input_hw=32)
    clean01 = jnp.asarray(
        np.random.RandomState(7).rand(2, 3, 8, 32, 32).astype(np.float32))
    mesh = ensemble_mesh(jax.devices()[:4], model=2)  # frames axis = 2
    for kw in ({}, {"adaptive": True, "aens_momentum": 0.5}):
        full = make_ensemble_parallel_runner(models, mesh, steps=3, **kw)
        chunk = make_ensemble_parallel_runner(models, mesh, steps=3,
                                              frame_chunk=4, **kw)
        adv_f, costs_f = full(clean01)
        adv_c, costs_c = chunk(clean01)
        np.testing.assert_allclose(np.asarray(costs_c), np.asarray(costs_f),
                                   rtol=1e-5, err_msg=str(kw))
        a, c = np.asarray(adv_c), np.asarray(clean01)
        assert (a >= 0).all() and (a <= 1).all()
        assert (np.abs(a - c) <= 16 / 255 + 1e-6).all()


def test_whitebox_dp_sharding_matches_single_device():
    """White-box attacks are data-parallel by sharding propagation alone:
    device_put the clip batch with the mesh sharding and the jitted scan
    runs sharded (CE-mean psum inserted by XLA)."""
    import i2v_tpu.attacks as attacks
    from i2v_tpu.models import TinyVideoNet, init_bundle
    from i2v_tpu.ops import pixel

    bundle = init_bundle(TinyVideoNet(), jnp.zeros((8, 3, 4, 16, 16)), "t")
    clips01 = jnp.asarray(
        np.random.RandomState(0).rand(8, 3, 4, 16, 16).astype(np.float32))
    videos = pixel.normalize(clips01, channel_axis=1)
    labels = jnp.arange(8) % 10

    mesh = attack_mesh(data=8, frames=1)
    adv_sharded = attacks.BIM(bundle, steps=3)(
        shard_clips(videos, mesh), jax.device_put(labels))
    adv_single = attacks.BIM(bundle, steps=3)(videos, labels)
    np.testing.assert_allclose(
        np.asarray(adv_sharded), np.asarray(adv_single), atol=1e-5)


def test_exchange_frames():
    from i2v_tpu.ops import smoothing

    x = jnp.asarray(np.random.RandomState(1).rand(1, 3, 6, 2, 2).astype(np.float32))
    y = smoothing.exchange_frames(x, [(0, 5), (1, 3)])
    np.testing.assert_array_equal(np.asarray(y[:, :, 0]), np.asarray(x[:, :, 5]))
    np.testing.assert_array_equal(np.asarray(y[:, :, 5]), np.asarray(x[:, :, 0]))
    np.testing.assert_array_equal(np.asarray(y[:, :, 1]), np.asarray(x[:, :, 3]))
    np.testing.assert_array_equal(np.asarray(y[:, :, 2]), np.asarray(x[:, :, 2]))


def test_runner_aot_cost_analysis_hook():
    """make_sharded_i2v_runner exposes its jitted inner + example args for
    AOT lowering (tools/perf_probe.py 'cost' roofline audit)."""
    mesh = attack_mesh(jax.devices()[:2])
    models = get_image_models(["resnet"], {"resnet": 1}, tiny=True, input_hw=16)
    runner = make_sharded_i2v_runner(models, mesh, steps=2)
    clean01 = shard_clips(jnp.full((2, 3, 2, 16, 16), 0.5, jnp.float32), mesh)
    compiled = runner.jitted.lower(*runner.example_args(clean01)).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    assert float(ca.get("flops", 0)) > 0
    adv, costs = runner(clean01)  # the public callable still runs
    assert np.isfinite(np.asarray(costs)).all()


class TestMultigrid:
    """parallel/multigrid.py: coarse-to-fine schedule + mod_init plumbing."""

    def _models(self):
        return get_image_models(["resnet"], {"resnet": 2}, tiny=True,
                                input_hw=32)

    def test_mod_init_default_fill_is_bit_identical(self):
        """Passing mod_init = the reference fill must reproduce the
        default-init program bit-for-bit (plumbing exactness)."""
        from i2v_tpu.attacks.i2v import MODIFIER_INIT

        models = self._models()
        mesh = attack_mesh()
        r = make_sharded_i2v_runner(models, mesh, steps=3)
        clean01 = jnp.asarray(
            np.random.RandomState(0).rand(2, 3, 8, 32, 32).astype(np.float32))
        adv_a, costs_a = r(shard_clips(clean01, mesh))
        mod0 = jnp.full((2 * 8, 32, 32, 3), MODIFIER_INIT, jnp.float32)
        adv_b, costs_b = r(shard_clips(clean01, mesh), mod_init=mod0)
        np.testing.assert_array_equal(np.asarray(adv_a), np.asarray(adv_b))
        np.testing.assert_array_equal(np.asarray(costs_a), np.asarray(costs_b))

    def test_return_modifier_roundtrips_through_rebuild(self):
        from i2v_tpu.ops import pallas_kernels as pk
        from i2v_tpu.ops import pixel

        models = self._models()
        mesh = attack_mesh()
        r = make_sharded_i2v_runner(models, mesh, steps=2,
                                    return_modifier=True)
        clean01 = jnp.asarray(
            np.random.RandomState(1).rand(2, 3, 8, 32, 32).astype(np.float32))
        adv, costs, mod = r(shard_clips(clean01, mesh))
        assert mod.shape == (2 * 8, 32, 32, 3)
        frames = pixel.flatten_clip_to_frames(clean01)
        rebuilt = pixel.unflatten_frames_to_clip(
            pk.rebuild_adv(frames, mod, 16 / 255), 2)
        np.testing.assert_allclose(np.asarray(adv), np.asarray(rebuilt),
                                   atol=1e-6)

    @pytest.mark.parametrize("scale", [2, 4])
    def test_multigrid_invariants_and_cost_layout(self, scale):
        from i2v_tpu.parallel.multigrid import make_multigrid_i2v_runner

        models = self._models()
        mesh = attack_mesh()
        eps = 16 / 255
        runner = make_multigrid_i2v_runner(models, mesh, steps=6,
                                           coarse_steps=3, scale=scale)
        rng = np.random.RandomState(2)
        clean01 = jnp.asarray(rng.rand(2, 3, 8, 32, 32).astype(np.float32))
        adv, costs = runner(shard_clips(clean01, mesh))
        assert adv.shape == clean01.shape and costs.shape == (6,)
        a, c = np.asarray(adv), np.asarray(clean01)
        assert (a >= 0).all() and (a <= 1).all()
        assert (np.abs(a - c) <= eps + 1e-6).all()
        assert np.isfinite(np.asarray(costs)).all()
        # the warm start must actually carry over: the first fine-phase cost
        # sits below the coarse phase's initial cost (descent held across
        # the grid switch)
        assert float(costs[3]) < float(costs[0])

    def test_multigrid_warm_start_beats_cold_fine_phase(self):
        """The upsampled coarse modifier is a better fine-phase start than
        the reference fill: fine-phase step-0 cost is lower than a cold
        full-resolution step-0 cost."""
        from i2v_tpu.parallel.multigrid import make_multigrid_i2v_runner

        models = self._models()
        mesh = attack_mesh()
        clean01 = jnp.asarray(
            np.random.RandomState(3).rand(2, 3, 8, 32, 32).astype(np.float32))
        cold = make_sharded_i2v_runner(models, mesh, steps=3)
        _, costs_cold = cold(shard_clips(clean01, mesh))
        mg = make_multigrid_i2v_runner(models, mesh, steps=6, coarse_steps=3)
        _, costs_mg = mg(shard_clips(clean01, mesh))
        assert float(costs_mg[3]) < float(costs_cold[0])

    def test_multigrid_pad_and_slice_trailing_batch(self):
        from i2v_tpu.parallel.sharded import ShardedImageGuidedAttack
        from i2v_tpu.ops import pixel

        models = self._models()
        mesh = attack_mesh()
        atk = ShardedImageGuidedAttack(models, mesh, steps=4, step_size=0.005,
                                       multigrid=2)
        rng = np.random.RandomState(4)
        videos = pixel.normalize(
            jnp.asarray(rng.rand(3, 3, 8, 32, 32).astype(np.float32)),
            channel_axis=1)  # 3 clips on an 8-device mesh -> pad path
        adv = atk(videos, None, [f"v{i}" for i in range(3)])
        assert adv.shape == videos.shape
        assert np.isfinite(np.asarray(adv)).all()

    def test_multigrid_composes_with_model_parallel(self):
        """The coarse-to-fine schedule runs over the model-axis runner via
        the runner_factory hook (mod_init/return_modifier handoff contract):
        cost trajectory matches the sharded multigrid's, invariants hold,
        and the adaptive guard carries over to EnsembleParallelAttack."""
        from i2v_tpu.parallel.ensemble import (EnsembleParallelAttack,
                                               ensemble_mesh,
                                               make_ensemble_parallel_runner)
        from i2v_tpu.parallel.multigrid import make_multigrid_i2v_runner

        models = get_image_models(
            ["resnet", "alexnet"], {"resnet": [1, 2], "alexnet": [2, 3]},
            tiny=True, input_hw=32)
        clean01 = jnp.asarray(
            np.random.RandomState(11).rand(2, 3, 8, 32, 32).astype(np.float32))
        smesh = attack_mesh(jax.devices()[:1])
        ref = make_multigrid_i2v_runner(models, smesh, steps=4, coarse_steps=2)
        _, costs_r = ref(shard_clips(clean01, smesh))
        emesh = ensemble_mesh(jax.devices()[:4], model=2)
        mp = make_multigrid_i2v_runner(
            models, emesh, steps=4, coarse_steps=2,
            runner_factory=make_ensemble_parallel_runner)
        adv_m, costs_m = mp(clean01)
        np.testing.assert_allclose(np.asarray(costs_m), np.asarray(costs_r),
                                   rtol=2e-4)
        a, c = np.asarray(adv_m), np.asarray(clean01)
        assert (a >= 0).all() and (a <= 1).all()
        assert (np.abs(a - c) <= 16 / 255 + 1e-6).all()
        with pytest.raises(ValueError, match="adaptive"):
            EnsembleParallelAttack(models, emesh, steps=4, adaptive=True,
                                   multigrid=2)

    def test_multigrid_rejects_bad_config(self):
        from i2v_tpu.parallel.multigrid import (downsample_clips,
                                                make_multigrid_i2v_runner)

        models = self._models()
        mesh = attack_mesh()
        with pytest.raises(ValueError, match="coarse_steps"):
            make_multigrid_i2v_runner(models, mesh, steps=3, coarse_steps=3)
        with pytest.raises(ValueError, match="scale"):
            make_multigrid_i2v_runner(models, mesh, steps=3, coarse_steps=1,
                                      scale=1)
        with pytest.raises(ValueError, match="divide"):
            downsample_clips(jnp.zeros((1, 3, 2, 30, 30)), 4)
        from i2v_tpu.parallel.sharded import ShardedImageGuidedAttack

        with pytest.raises(ValueError, match="adaptive"):
            ShardedImageGuidedAttack(models, mesh, steps=4, step_size=0.005,
                                     adaptive=True, multigrid=2)

    def test_downsample_is_exact_area_mean(self):
        from i2v_tpu.parallel.multigrid import downsample_clips

        x = jnp.arange(2 * 3 * 2 * 4 * 4, dtype=jnp.float32).reshape(
            2, 3, 2, 4, 4)
        got = np.asarray(downsample_clips(x, 2))
        want = np.asarray(x).reshape(2, 3, 2, 2, 2, 2, 2).mean(axis=(4, 6))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_multigrid_param_dtype_shares_one_cast(self):
        """param_dtype casts the surrogate weights ONCE, shared by both
        phases (each sub-runner materializing its own copy would double the
        ~300MB ensemble weight HBM)."""
        from i2v_tpu.parallel import multigrid as mg_mod
        from i2v_tpu.parallel.multigrid import make_multigrid_i2v_runner
        from i2v_tpu.parallel import sharded as sharded_mod

        models = self._models()
        mesh = attack_mesh()
        seen = []
        orig = sharded_mod.make_sharded_i2v_runner

        def spy(models, *a, **kw):
            seen.append((models, kw.get("param_dtype")))
            return orig(models, *a, **kw)

        mg_mod.make_sharded_i2v_runner = spy
        try:
            runner = make_multigrid_i2v_runner(
                models, mesh, steps=4, coarse_steps=2,
                param_dtype=jnp.bfloat16)
        finally:
            mg_mod.make_sharded_i2v_runner = orig
        assert len(seen) == 2
        # both phases received the SAME pre-cast bundles with no further cast
        assert seen[0][0] is seen[1][0] and seen[0][1] is None is seen[1][1]
        leaf = jax.tree_util.tree_leaves(seen[0][0][0].params)[0]
        assert leaf.dtype == jnp.bfloat16
        clean01 = jnp.asarray(
            np.random.RandomState(5).rand(2, 3, 8, 32, 32).astype(np.float32))
        _, costs = runner(shard_clips(clean01, mesh))
        assert np.isfinite(np.asarray(costs)).all()


def test_prefetch_lands_batches_in_mesh_clip_sharding():
    """--sharded --prefetch must device_put batches with the attack mesh's
    clip sharding (not whole onto device 0 to be re-distributed later);
    indivisible trailing batches fall back to unsharded."""
    import argparse

    from i2v_tpu.cli import common
    from i2v_tpu.data import synthetic as synthetic_mod
    from i2v_tpu.parallel.mesh import clip_sharding

    args = argparse.Namespace(sharded=True, prefetch=1, batch_size=8,
                              tiny=True, data="synthetic")
    ds = synthetic_mod.SyntheticAttackDataset(n_samples=11, clip_len=4, size=32)
    batches = list(common.batch_iterator(args, ds, synthetic_mod.iterate_batches))
    mesh = attack_mesh()
    want = clip_sharding(mesh)
    assert batches[0]["clips"].sharding.is_equivalent_to(
        want, batches[0]["clips"].ndim)
    # 11 % 8: the 3-clip trailing batch can't shard over the 8-wide axis —
    # it must land (unsharded) rather than raise
    assert batches[-1]["clips"].shape[0] == 3
