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


class TestTAPOracle:
    def test_tap_cost_and_grad_match_torch_at_generic_point(self):
        """TAP cost components (ce, reg, distance) and the full cost gradient
        vs a 100%-torch re-expression of base_attacks.py:685-814, evaluated
        at a FIXED perturbed point on a converted live mini-I3D.

        (Full-trajectory comparison is not meaningful: the signed-sqrt
        feature distance has an ill-conditioned gradient near adv == clean,
        so sign steps amplify cross-framework fp32 noise — the reference is
        itself pixel-chaotic across hardware. The per-step COST MATH and the
        gradient at a generic point are the framework-parity invariants.)"""
        torch = pytest.importorskip("torch")
        import importlib.util
        import os

        import torch.nn.functional as TF

        from i2v_tpu.models.api import VideoModel, rebind_params
        from i2v_tpu.models.i3d import I3DResNet
        from i2v_tpu.ops import smoothing as sm_ops

        from .test_convert_video import TorchMiniI3D, _randomize_bn

        spec = importlib.util.spec_from_file_location(
            "convert_gluoncv",
            os.path.join(os.path.dirname(__file__), "..", "tools",
                         "convert_gluoncv.py"))
        cg = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(cg)

        tm = TorchMiniI3D().eval()
        _randomize_bn(tm)
        params = cg.convert_i3d(tm.state_dict(), stage_sizes=(1, 1, 1, 1))
        module = I3DResNet(stage_sizes=(1, 1, 1, 1),
                           inflate_freq=((1,), (1,), (1,), (0,)),
                           nonlocal_pos=((), (), (), ()),
                           width=8, num_classes=10)
        bundle = VideoModel(name="i3d", module=module,
                            params={"params": params},
                            tap_keys=("res_layer1", "res_layer2"))

        rng_np = np.random.RandomState(13)
        clean01 = rng_np.rand(1, 3, 8, 32, 32).astype(np.float32)
        # smooth perturbation: a ±sign pattern smoothed by the uniform
        # kernel lands exactly on |.|'s kink (sign(0) disagreements blow up
        # the reg gradient); continuous noise keeps the objective
        # differentiable at the probe point
        pert = (0.8 * EPS * np.tanh(rng_np.randn(*clean01.shape))
                ).astype(np.float32)
        adv01 = np.clip(clean01 + pert, 0, 1)
        labels = jnp.asarray([3])

        # ---- jax cost components + grad (the TAP objective as built by the
        # attack's runner: apply_norm_taps + tap_feature_distance +
        # depthwise_conv3d of the std-scaled perturbation) ----
        x_clean = pixel.normalize(jnp.asarray(clean01), channel_axis=1)
        _, clean_taps = bundle.apply_norm_taps(x_clean)
        clean_taps = [jax.lax.stop_gradient(t) for t in clean_taps]
        kernel = sm_ops.uniform_kernel_3d(3, 3)

        def cost_fn(x_norm):
            logits, taps = bundle.apply_norm_taps(x_norm)
            ce = losses.cross_entropy(logits, labels)
            dist = jnp.sum(losses.tap_feature_distance(taps, clean_taps, 1))
            perts = pixel.scale_perts(x_norm - x_clean, channel_axis=1)
            reg = jnp.sum(jnp.abs(sm_ops.depthwise_conv3d(perts, kernel)))
            return ce + 1e3 * reg + 0.05 * dist, (ce, reg, dist)

        x_adv = pixel.normalize(jnp.asarray(adv01), channel_axis=1)
        (cost_j, (ce_j, reg_j, dist_j)), g_jax = jax.value_and_grad(
            cost_fn, has_aux=True)(x_adv)

        # ---- torch oracle at the same point ----
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1, 1)
        acts = []
        hs = [tm.res_layers[0].register_forward_hook(
                  lambda m, i, o: acts.append(o)),
              tm.res_layers[1].register_forward_hook(
                  lambda m, i, o: acts.append(o))]
        k3 = np.ones((3, 3, 3), np.float32) / 27.0
        stack3 = torch.from_numpy(np.stack([k3] * 3)[:, None])

        v_clean = torch.from_numpy(np.asarray(x_clean))
        acts.clear()
        tm(v_clean)
        ori_feats = [a.detach() for a in acts]
        v_adv = torch.from_numpy(np.asarray(x_adv)).requires_grad_(True)
        acts.clear()
        out = tm(v_adv)
        ce_t = TF.cross_entropy(out, torch.tensor([3]))
        dists = []
        for a, o in zip(acts, ori_feats):
            sa = torch.sign(a) * torch.sqrt(torch.abs(a))
            so = torch.sign(o) * torch.sqrt(torch.abs(o))
            dists.append(torch.norm((sa - so).reshape(1, -1), p=2, dim=1))
        dist_t = torch.sum(torch.stack(dists))
        perts_t = (v_adv - v_clean) / std
        reg_t = torch.sum(torch.abs(
            TF.conv3d(perts_t, stack3, groups=3, padding=[1, 1, 1])))
        cost_t = ce_t + 1e3 * reg_t + 0.05 * dist_t
        g_torch = torch.autograd.grad(cost_t, v_adv)[0].numpy()
        for h in hs:
            h.remove()

        np.testing.assert_allclose(float(ce_j), float(ce_t.detach()), rtol=1e-3)
        np.testing.assert_allclose(float(reg_j), float(reg_t.detach()), rtol=1e-4)
        np.testing.assert_allclose(float(dist_j), float(dist_t.detach()), rtol=1e-3)
        scale = np.abs(g_torch).max()
        np.testing.assert_allclose(np.asarray(g_jax), g_torch,
                                   atol=2e-3 * scale)

    def test_tap_attack_descends_and_records(self):
        """The TAP attack itself runs end-to-end and records all three cost
        components per step (reference's loss_info keys overwrite each other
        via a shadowed loop var, base_attacks.py:811-813 — consciously
        fixed)."""
        from i2v_tpu.models import TinyVideoNet, init_bundle

        clip = jnp.zeros((1, 3, 8, 32, 32), dtype=jnp.float32)
        vb = init_bundle(TinyVideoNet(), clip, "t",
                         tap_keys=("block1", "block2"))
        videos = pixel.normalize(
            jnp.asarray(np.random.RandomState(4).rand(1, 3, 8, 32, 32)
                        .astype(np.float32)), channel_axis=1)
        atk = attacks.TAP(vb, dict(kernlen=3, temporal_kernlen=3,
                                   conv3d=True), steps=3)
        atk(videos, jnp.asarray([2]), ["vid"])
        # base-class loss_info contract: per-video keys, all three cost
        # components per step, JSON-serializable string values
        assert set(atk.loss_info) == {"vid"}
        for i in range(3):
            assert {"cost", "ce loss", "reg_cost", "distance"} <= set(
                atk.loss_info["vid"][i])
