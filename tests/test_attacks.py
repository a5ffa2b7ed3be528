"""Attack engine tests on tiny checkpoint-free backbones (SURVEY.md §4):
ε-ball/[0,1] invariants after every attack, loss movement in the right
direction, analytic one-step cases, and torch-parity of the Adam update."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import i2v_tpu.attacks as attacks
from i2v_tpu.models import TinyVideoNet, get_image_models, init_bundle
from i2v_tpu.ops import losses, pixel

EPS = 16 / 255


@pytest.fixture(scope="module")
def video_bundle():
    clip = jnp.zeros((2, 3, 4, 32, 32), dtype=jnp.float32)
    return init_bundle(TinyVideoNet(), clip, "tinyvid", tap_keys=("block1", "block2"))


@pytest.fixture(scope="module")
def clean_batch():
    rng = np.random.RandomState(0)
    clips01 = rng.rand(2, 3, 4, 32, 32).astype(np.float32)
    videos = pixel.normalize(jnp.asarray(clips01), channel_axis=1)  # loader domain
    labels = jnp.asarray([1, 3])
    return videos, labels


def _check_invariants(adv_norm, videos_norm):
    adv01 = np.asarray(pixel.unnormalize(adv_norm, channel_axis=1))
    clean01 = np.asarray(pixel.unnormalize(videos_norm, channel_axis=1))
    assert adv01.min() >= -1e-5 and adv01.max() <= 1 + 1e-5
    assert np.abs(adv01 - clean01).max() <= EPS + 1e-5


def _ce(bundle, videos_norm, labels):
    logits = bundle.apply_norm(videos_norm)
    return float(losses.cross_entropy(logits, labels))


class TestSignAttacks:
    def test_fgsm_invariants_and_ascent(self, video_bundle, clean_batch):
        videos, labels = clean_batch
        atk = attacks.FGSM(video_bundle)
        adv = atk(videos, labels)
        _check_invariants(adv, videos)
        assert _ce(video_bundle, adv, labels) > _ce(video_bundle, videos, labels)

    def test_fgsm_analytic_step(self, video_bundle, clean_batch):
        # one ε-step of sign: every pixel moved by exactly ε or clipped at 0/1
        videos, labels = clean_batch
        adv = attacks.FGSM(video_bundle)(videos, labels)
        adv01 = np.asarray(pixel.unnormalize(adv, channel_axis=1))
        clean01 = np.asarray(pixel.unnormalize(videos, channel_axis=1))
        delta = np.abs(adv01 - clean01)
        at_eps = np.isclose(delta, EPS, atol=1e-5)
        at_bound = np.isclose(adv01, 0, atol=1e-5) | np.isclose(adv01, 1, atol=1e-5)
        zero_grad = np.isclose(delta, 0, atol=1e-6)
        assert (at_eps | at_bound | zero_grad).all()

    def test_bim_ascends_loss(self, video_bundle, clean_batch):
        videos, labels = clean_batch
        adv = attacks.BIM(video_bundle, steps=5)(videos, labels)
        _check_invariants(adv, videos)
        assert _ce(video_bundle, adv, labels) > _ce(video_bundle, videos, labels)

    def test_mifgsm(self, video_bundle, clean_batch):
        videos, labels = clean_batch
        adv = attacks.MIFGSM(video_bundle, steps=3)(videos, labels)
        _check_invariants(adv, videos)

    def test_batch_chunked_grad_matches_full(self, video_bundle, clean_batch):
        """batch_chunk gradient accumulation is exact for the mean-CE
        engine: chunked MIFGSM must reproduce the full-batch adversarial
        output (momentum + frame-norm run on the assembled full gradient)."""
        import dataclasses

        videos, labels = clean_batch
        full = attacks.MIFGSM(video_bundle, steps=4)
        adv_full = np.asarray(full(videos, labels))
        chunked = attacks.MIFGSM(video_bundle, steps=4)
        chunked.cfg = dataclasses.replace(chunked.cfg, batch_chunk=1)
        adv_chunk = np.asarray(chunked(videos, labels))
        np.testing.assert_allclose(adv_chunk, adv_full, atol=2e-6)
        # BIM too (no momentum path)
        full_b = attacks.BIM(video_bundle, steps=3)
        chunk_b = attacks.BIM(video_bundle, steps=3)
        chunk_b.cfg = dataclasses.replace(chunk_b.cfg, batch_chunk=1)
        np.testing.assert_allclose(np.asarray(chunk_b(videos, labels)),
                                   np.asarray(full_b(videos, labels)),
                                   atol=2e-6)

    def test_batch_chunk_indivisible_snaps_to_divisor(self, video_bundle,
                                                      clean_batch):
        """A trailing partial batch (b % batch_chunk != 0) must not raise:
        the engine snaps to the largest divisor of b that fits, which is
        exact for the equal-chunk mean-CE accumulation."""
        import dataclasses

        videos, labels = clean_batch
        videos3 = jnp.concatenate([videos, videos[:1]], axis=0)
        labels3 = jnp.concatenate([labels, labels[:1]])
        full = attacks.BIM(video_bundle, steps=3)
        adv_full = np.asarray(full(videos3, labels3))
        chunked = attacks.BIM(video_bundle, steps=3)
        chunked.cfg = dataclasses.replace(chunked.cfg, batch_chunk=2)
        np.testing.assert_allclose(np.asarray(chunked(videos3, labels3)),
                                   adv_full, atol=2e-6)

    def test_difgsm(self, video_bundle, clean_batch):
        videos, labels = clean_batch
        atk = attacks.DIFGSM(video_bundle, steps=3, momentum=True)
        adv = atk(videos, labels, rng=jax.random.PRNGKey(7))
        _check_invariants(adv, videos)

    def test_tifgsm_2d_and_3d(self, video_bundle, clean_batch):
        videos, labels = clean_batch
        for cls in (attacks.TIFGSM, attacks.TIFGSM3D):
            adv = cls(video_bundle, steps=2, kernlen=5)(videos, labels)
            _check_invariants(adv, videos)

    def test_sgm_gamma_one_equals_bim(self, video_bundle, clean_batch):
        videos, labels = clean_batch
        a = attacks.SGM(video_bundle, steps=3, gamma=1.0)(videos, labels)
        b = attacks.BIM(video_bundle, steps=3)(videos, labels)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_sgm_gamma_changes_result(self, video_bundle, clean_batch):
        videos, labels = clean_batch
        a = attacks.SGM(video_bundle, steps=3, gamma=0.2)(videos, labels)
        b = attacks.BIM(video_bundle, steps=3)(videos, labels)
        assert float(jnp.abs(a - b).max()) > 1e-4

    def test_sim(self, video_bundle, clean_batch):
        videos, labels = clean_batch
        adv = attacks.SIM(video_bundle, steps=2, scale_steps=3)(videos, labels)
        _check_invariants(adv, videos)

    def test_sim_batch_scales_equivalent(self, video_bundle, clean_batch):
        """batch_scales folds the scale copies into the batch axis; the
        stacked mean-CE cost and gradient equal the scan path's exactly in
        real arithmetic. Compare at the gradient level — the downstream
        sign step amplifies fp reduction-order noise at zero crossings, so
        comparing adv outputs would test float ordering, not math."""
        videos, labels = clean_batch
        from i2v_tpu.ops import pixel as px

        clean01 = px.unnormalize(videos, channel_axis=1)
        g = {}
        for flag in (False, True):
            atk = attacks.SIM(video_bundle, steps=1, scale_steps=3,
                              batch_scales=flag)
            cost, grad = atk._build_grad_fn(video_bundle)(
                clean01, labels, jax.random.PRNGKey(0))
            g[flag] = (float(cost), np.asarray(grad))
        assert g[True][0] == pytest.approx(g[False][0], rel=1e-5)
        scale = np.abs(g[False][1]).max()
        np.testing.assert_allclose(g[True][1], g[False][1],
                                   atol=1e-5 * scale)

    def test_whitebox_u8_ingress_bitwise_matches_f32(self, video_bundle):
        """Attack.__call__ accepts raw uint8 (B,T,H,W,3) batches (the
        --u8_ingress dataset layout) and produces bit-identical results to
        the normalized-f32 path — same PRNG stream, same clean01."""
        from i2v_tpu.data.transforms import u8_clip_to_normalized

        rng = np.random.RandomState(11)
        u8 = rng.randint(0, 256, (2, 4, 32, 32, 3), dtype=np.uint8)
        norm = np.stack([u8_clip_to_normalized(c) for c in u8])
        labels = jnp.asarray([1, 3])
        adv_f32 = np.asarray(
            attacks.BIM(video_bundle, steps=2)(jnp.asarray(norm), labels))
        adv_u8 = np.asarray(attacks.BIM(video_bundle, steps=2)(u8, labels))
        np.testing.assert_array_equal(adv_u8, adv_f32)

    def test_targeted_mode_descends_target_loss(self, video_bundle, clean_batch):
        videos, labels = clean_batch
        atk = attacks.BIM(video_bundle, steps=5)
        atk.set_attack_mode("targeted", lambda imgs, l: (l + 1) % 10)
        target = (labels + 1) % 10
        adv = atk(videos, labels)
        assert _ce(video_bundle, adv, target) < _ce(video_bundle, videos, target)

    def test_least_likely_mode(self, video_bundle, clean_batch):
        videos, labels = clean_batch
        atk = attacks.BIM(video_bundle, steps=3)
        atk.set_attack_mode("least_likely")
        adv = atk(videos, labels)
        _check_invariants(adv, videos)

    def test_invalid_mode_rejected(self, video_bundle):
        atk = attacks.BIM(video_bundle, steps=1)
        with pytest.raises(ValueError):
            atk.set_attack_mode("bogus")
        with pytest.raises(ValueError):
            atk.set_attack_mode("targeted")  # missing map function


class TestTAP:
    def test_tap_runs_and_records(self, video_bundle, clean_batch):
        import json

        videos, labels = clean_batch
        atk = attacks.TAP(video_bundle, params={"kernlen": 3, "temporal_kernlen": 3,
                                                "eta": 1e3, "conv3d": True}, steps=2)
        adv = atk(videos, labels, ["v0", "v1"])
        _check_invariants(adv, videos)
        # base-class loss_info contract: per-video keys, JSON-serializable
        # values (loss_info feeds json.dump), batches don't overwrite
        assert set(atk.loss_info.keys()) == {"v0", "v1"}
        assert {"cost", "ce loss", "reg_cost", "distance"} <= set(
            atk.loss_info["v0"][0].keys())
        json.dumps(atk.loss_info)
        atk(videos, labels, ["v2", "v3"])
        assert set(atk.loss_info.keys()) == {"v0", "v1", "v2", "v3"}

    def test_tap_2d_variant(self, video_bundle, clean_batch):
        videos, labels = clean_batch
        atk = attacks.TAP(video_bundle, params={"conv3d": False}, steps=2)
        _check_invariants(atk(videos, labels), videos)


class TestTemporalTranslation:
    def test_tt_invariants(self, video_bundle, clean_batch):
        videos, labels = clean_batch
        atk = attacks.TemporalTranslation(
            video_bundle, params={"kernlen": 5, "momentum": True, "weight": 0.3,
                                  "move_type": "adj", "kernel_mode": "gaussian"},
            steps=2)
        adv = atk(videos, labels)
        _check_invariants(adv, videos)

    def test_tt_move_types(self, video_bundle, clean_batch):
        videos, labels = clean_batch
        for mt in ("large", "random"):
            atk = attacks.TemporalTranslation(
                video_bundle, params={"kernlen": 3, "move_type": mt}, steps=1)
            _check_invariants(atk(videos, labels), videos)

    def test_tt_ascends_loss(self, video_bundle, clean_batch):
        videos, labels = clean_batch
        atk = attacks.TemporalTranslation(
            video_bundle, params={"kernlen": 3}, steps=5)
        adv = atk(videos, labels)
        assert _ce(video_bundle, adv, labels) > _ce(video_bundle, videos, labels)


@pytest.fixture(scope="module")
def tiny_image_models():
    return get_image_models(["resnet", "alexnet"],
                            {"resnet": 2, "alexnet": 3}, tiny=True, input_hw=32)


class TestI2VFamily:
    def test_i2v_cosine_descends(self, tiny_image_models, clean_batch):
        videos, labels = clean_batch
        atk = attacks.ImageGuidedFMDirection_Adam(
            tiny_image_models[:1], step_size=0.005, steps=8)
        adv = atk(videos, labels, video_names=["v0", "v1"])
        _check_invariants(adv, videos)
        costs = [float(atk.loss_info["v0"][i]["cost"]) for i in range(8)]
        assert costs[-1] < costs[0]

    def test_dr_descends(self, tiny_image_models, clean_batch):
        videos, labels = clean_batch
        atk = attacks.ImageGuidedStd_Adam(tiny_image_models[:1], step_size=0.005, steps=8)
        adv = atk(videos, labels, video_names=["a", "b"])
        _check_invariants(adv, videos)
        costs = [float(atk.loss_info["a"][i]["cost"]) for i in range(8)]
        assert costs[-1] < costs[0]

    def test_ens_multi_model(self, tiny_image_models, clean_batch):
        videos, labels = clean_batch
        atk = attacks.ImageGuidedFML2_Adam_MultiModels(tiny_image_models, steps=4)
        adv = atk(videos, labels, video_names=["a", "b"])
        _check_invariants(adv, videos)
        assert atk.step_size == 0.005  # reference-pinned

    def test_adam_matches_torch(self):
        torch = pytest.importorskip("torch")
        from i2v_tpu.attacks.i2v import adam_like_torch
        import optax

        w0 = np.array([0.5, -1.2, 2.0], np.float32)
        # optax path
        opt = adam_like_torch(0.01)
        w = jnp.asarray(w0)
        state = opt.init(w)
        for _ in range(5):
            g = 2 * w  # grad of sum(w^2)
            updates, state = opt.update(g, state)
            w = optax.apply_updates(w, updates)
        # torch path
        wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        topt = torch.optim.Adam([wt], lr=0.01)
        for _ in range(5):
            topt.zero_grad()
            (wt**2).sum().backward()
            topt.step()
        np.testing.assert_allclose(np.asarray(w), wt.detach().numpy(), atol=2e-5)


class TestAENS:
    def test_aens_coeff_math(self, tiny_image_models, clean_batch):
        videos, labels = clean_batch
        atk = attacks.AENS_I2V_MF(tiny_image_models, step_size=0.005,
                                  momentum=0.5, steps=3)
        adv, used_time, cost_saved = atk(videos, labels, video_names=["a", "b"])
        _check_invariants(adv, videos)
        assert cost_saved.shape == (3,)
        assert used_time > 0
        assert len(atk.weights) == 3
        # step-0 coefficients: softmax(softmax(ones) + 0.5*ones) = uniform
        np.testing.assert_allclose(atk.weights[0], np.full(2, 0.5), atol=1e-6)
        # later coefficients still simplex-normalized
        np.testing.assert_allclose(np.sum(atk.weights[-1]), 1.0, atol=1e-6)

    def test_aens_multilayer(self, clean_batch):
        videos, labels = clean_batch
        models = get_image_models(
            ["alexnet", "squeezenet"],
            {"alexnet": [2, 3], "squeezenet": [2, 3]}, tiny=True, input_hw=32)
        atk = attacks.AENS_I2V_MF(models, step_size=0.005, steps=2)
        adv, _, cost_saved = atk(videos, labels)
        assert atk.n_taps == 4
        _check_invariants(adv, videos)


class TestILAF:
    def test_ilaf_invariants(self, video_bundle, clean_batch):
        videos, labels = clean_batch
        bim_adv = attacks.BIM(video_bundle, steps=3)(videos, labels)
        atk = attacks.ILAF(video_bundle, "tiny", steps=4)
        out = atk(bim_adv, videos, labels, video_names=["a", "b"])
        _check_invariants(out, videos)
        assert out.shape == videos.shape

    def test_ilaf_amplifies_feature_shift(self, video_bundle, clean_batch):
        videos, labels = clean_batch
        bim_adv = attacks.BIM(video_bundle, steps=2)(videos, labels)
        out = attacks.ILAF(video_bundle, "tiny", steps=6)(bim_adv, videos, labels)

        def feat_shift(x_norm):
            clean01 = pixel.unnormalize(videos, channel_axis=1)
            x01 = pixel.unnormalize(x_norm, channel_axis=1)
            _, tc = video_bundle.apply01_taps(clean01)
            _, tx = video_bundle.apply01_taps(x01)
            return sum(float(jnp.linalg.norm(a - c)) for a, c in zip(tx, tc))

        assert feat_shift(out) > feat_shift(bim_adv)


class TestAnalytic:
    """Closed-form case (SURVEY.md §4): on a linear 2-class model the CE
    gradient direction is constant, so BIM has an exact solution
    adv = clip(clean + steps·α·sign(w₁−w₀) , ε-ball ∩ [0,1])."""

    class _Linear:
        def __init__(self, w, params=()):
            self.w = w  # (C,T,H,W) direction
            self.params = params  # attack engines pass params as jit args

        def apply_norm(self, x_norm):
            s = jnp.sum(x_norm * self.w[None], axis=(1, 2, 3, 4))
            return jnp.stack([-s, s], axis=-1)  # logits for classes 0,1

    def test_bim_closed_form(self):
        rng = np.random.RandomState(0)
        # small weights keep the logistic active (large |s| underflows the
        # CE gradient to exactly 0 in f32 and the attack correctly stalls)
        w = jnp.asarray((rng.randn(3, 4, 8, 8) * 0.01).astype(np.float32))
        model = self._Linear(w)
        clean01 = jnp.asarray(rng.rand(2, 3, 4, 8, 8).astype(np.float32))
        videos = pixel.normalize(clean01, channel_axis=1)
        labels = jnp.asarray([0, 0])  # true class 0 → ascend pushes toward 1

        steps, eps = 4, 16 / 255
        adv = attacks.BIM(model, steps=steps, epsilon=eps)(videos, labels)
        adv01 = np.asarray(pixel.unnormalize(adv, channel_axis=1))

        # ∂CE/∂x_norm ∝ +w for label 0 (σ'>0); sign step is +sign(w) each step
        expected = np.clip(
            np.asarray(clean01) + steps * (eps / steps) * np.sign(np.asarray(w))[None],
            np.asarray(clean01) - eps, np.asarray(clean01) + eps)
        expected = np.clip(expected, 0, 1)
        np.testing.assert_allclose(adv01, expected, atol=1e-5)


class TestAENSCoeffMath:
    def test_softmax_of_softmax_momentum(self, tiny_image_models, clean_batch):
        """Numeric check of coeffs = softmax(softmax(prev) + m·coeffs)
        (reference: TPAMI_attack.py:265) across two steps."""
        videos, labels = clean_batch
        models = get_image_models(
            ["alexnet", "squeezenet"],
            {"alexnet": [2, 3], "squeezenet": [2, 3]}, tiny=True, input_hw=32)
        m = 0.7
        atk = attacks.AENS_I2V_MF(models, step_size=0.005, momentum=m, steps=2)
        _, _, _ = atk(videos, labels)
        w0, w1 = np.asarray(atk.weights[0]), np.asarray(atk.weights[1])

        def softmax(x):
            e = np.exp(x - x.max())
            return e / e.sum()

        # step 0: prev = ones, coeffs = ones
        np.testing.assert_allclose(
            w0, softmax(softmax(np.ones(4)) + m * np.ones(4)), atol=1e-6)
        # step 1 uses the unweighted per-tap frame-summed cosines as prev;
        # whatever prev was, w1 must be softmax-normalized and momentum-skewed
        np.testing.assert_allclose(w1.sum(), 1.0, atol=1e-6)


class TestReviewRegressions:
    def test_aens_coeffs_persist_across_calls(self, tiny_image_models, clean_batch):
        """Reference TPAMI_attack.py:165,265: self.coeffs is instance state —
        video N+1's first step starts from video N's final coefficients
        (previous_cs_loss resets per call, :257)."""
        videos, labels = clean_batch
        atk = attacks.AENS_I2V_MF(tiny_image_models, step_size=0.005,
                                  momentum=0.5, steps=3)
        atk(videos, labels)
        first_run_w0 = np.asarray(atk.weights[0])
        final_coeffs = np.asarray(atk.coeffs)
        atk(videos, labels)
        second_run_w0 = np.asarray(atk.weights[0])
        # second call's step-0 coeffs = softmax(softmax(ones) + m*final_coeffs)
        expect = jax.nn.softmax(
            jax.nn.softmax(jnp.ones(2)) + 0.5 * jnp.asarray(final_coeffs))
        np.testing.assert_allclose(second_run_w0, np.asarray(expect), atol=1e-6)
        assert not np.allclose(second_run_w0, first_run_w0)

    def test_ilaf_zero_delta_is_finite(self, video_bundle, clean_batch):
        """adv == clean must not NaN the ILAF objective (0/0 guards)."""
        videos, labels = clean_batch
        out = attacks.ILAF(video_bundle, "tiny", steps=2)(videos, videos, labels)
        assert np.isfinite(np.asarray(out)).all()

    def test_save_int_mode_accuracy_domain(self, video_bundle, clean_batch,
                                           tmp_path, capsys):
        """save() must evaluate accuracy in the same (normalized) domain for
        both return types (reference fed the model raw [0,1] in int mode,
        base_attacks.py:119-123 — consciously fixed)."""
        videos, labels = clean_batch
        batches = [{"clips": videos, "labels": labels}]
        accs = {}
        for rt in ("float", "int"):
            atk = attacks.BIM(video_bundle, steps=2)
            atk.set_return_type(rt)
            atk.save(str(tmp_path / rt), batches)
            out = capsys.readouterr().out
            accs[rt] = out.strip().rsplit("Accuracy: ", 1)[1]
        assert accs["float"] == accs["int"]
        # the PERSISTED artifacts must be normalized f32 in both modes (the
        # eval protocol feeds them straight into apply_norm) — int mode
        # differs only by its uint8 quantization
        a_f = np.load(tmp_path / "float" / "1-adv.npy")
        a_i = np.load(tmp_path / "int" / "1-adv.npy")
        assert a_f.dtype == a_i.dtype == np.float32
        # uint8 truncation error ≤ 1/255 in [0,1] → ≤ (1/255)/min(std) ≈
        # 0.018 in the normalized domain
        np.testing.assert_allclose(a_i, a_f, atol=0.02)

    def test_tt_unshift_uses_nominal_moves(self, video_bundle, clean_batch):
        """'large' move-type: the reference unshifts variant grads by the
        NOMINAL move list (video_attacks.py:169-170), not the applied large
        shifts — weight>0 results must reflect that."""
        videos, labels = clean_batch
        atk = attacks.TemporalTranslation(
            video_bundle, dict(kernlen=3, weight=0.5, move_type="large"),
            steps=2)
        adv = atk(videos, labels)
        _check_invariants(adv, videos)


class TestAPIGuards:
    """Round-2 review fixes: attack API misuse fails with intent."""

    def test_aens_rejects_int_return_type(self):
        from i2v_tpu.attacks.i2v import AENS_I2V_MF
        from i2v_tpu.models import get_image_models

        models = get_image_models(["resnet"], {"resnet": [1, 2]}, tiny=True,
                                  input_hw=32)
        atk = AENS_I2V_MF(models, step_size=0.005, steps=2)
        atk.set_return_type("float")  # the only supported value
        with pytest.raises(NotImplementedError, match="triple"):
            atk.set_return_type("int")

    def test_ilaf_save_rejected_with_pointer_to_cli(self):
        from i2v_tpu.attacks.i2v import ILAF
        from i2v_tpu.models import TinyVideoNet, init_bundle, tap_keys_for
        import jax.numpy as jnp

        clip = jnp.zeros((1, 3, 4, 32, 32), jnp.float32)
        bundle = init_bundle(TinyVideoNet(), clip, "tinyvid",
                             tap_keys=("block1",))
        atk = ILAF(bundle, "tinyvid", steps=1)
        with pytest.raises(NotImplementedError, match="fine_tune"):
            atk.save("/tmp/nowhere", [])

    def test_temporal_kernel_len1_identity(self):
        import numpy as np

        from i2v_tpu.ops.smoothing import temporal_kernel

        for mode in ("gaussian", "linear", "uniform"):
            k = np.asarray(temporal_kernel(1, mode))
            assert k.shape == (1,) and np.isfinite(k).all()
            np.testing.assert_allclose(k, [1.0])
