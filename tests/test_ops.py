"""Unit tests for i2v_tpu.ops against closed-form cases and torch parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2v_tpu.ops import grads, losses, pixel, smoothing


class TestPixel:
    def test_normalize_roundtrip(self):
        x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32))
        y = pixel.unnormalize(pixel.normalize(x))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    def test_normalize_channel_axis(self):
        x = np.random.RandomState(1).rand(2, 3, 4, 8, 8).astype(np.float32)
        got = pixel.normalize(jnp.asarray(x), channel_axis=1)
        mean = np.array(pixel.IMAGENET_MEAN).reshape(1, 3, 1, 1, 1)
        std = np.array(pixel.IMAGENET_STD).reshape(1, 3, 1, 1, 1)
        np.testing.assert_allclose(np.asarray(got), (x - mean) / std, rtol=1e-4, atol=1e-6)

    def test_project_linf_invariants(self):
        rng = np.random.RandomState(2)
        clean = jnp.asarray(rng.rand(4, 3, 2, 8, 8).astype(np.float32))
        adv = clean + jnp.asarray(rng.randn(4, 3, 2, 8, 8).astype(np.float32))
        eps = 16 / 255
        out = np.asarray(pixel.project_linf(adv, clean, eps))
        assert (out >= 0).all() and (out <= 1).all()
        assert (np.abs(out - np.asarray(clean)) <= eps + 1e-6).all()

    def test_sign_step_analytic(self):
        # FGSM step on a known gradient: adv = clean + α·sign(g), in-ball.
        clean = jnp.full((1, 3, 1, 4, 4), 0.5, dtype=jnp.float32)
        g = jnp.ones_like(clean)
        out = pixel.sign_step_project(clean, g, clean, 0.01, 16 / 255)
        np.testing.assert_allclose(np.asarray(out), 0.51, atol=1e-7)

    def test_rebuild_adv_matches_reference_formula(self):
        rng = np.random.RandomState(3)
        clean = rng.rand(6, 8, 8, 3).astype(np.float32)
        m = (rng.randn(6, 8, 8, 3) * 0.2).astype(np.float32)
        eps = 16 / 255
        out = np.asarray(pixel.rebuild_adv(jnp.asarray(clean), jnp.asarray(m), eps))
        want = np.clip(clean + np.clip(m, -eps, eps), 0, 1)
        np.testing.assert_allclose(out, want, atol=1e-7)

    def test_flatten_unflatten_roundtrip(self):
        x = jnp.asarray(np.random.RandomState(4).rand(2, 3, 4, 8, 8).astype(np.float32))
        frames = pixel.flatten_clip_to_frames(x)
        assert frames.shape == (8, 8, 8, 3)
        back = pixel.unflatten_frames_to_clip(frames, 2)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_flatten_frame_order_matches_reference(self):
        # reference: permute([0,2,1,3,4]).reshape(b*f,c,h,w) — frame-major per clip
        x = np.arange(2 * 3 * 4 * 2 * 2, dtype=np.float32).reshape(2, 3, 4, 2, 2)
        frames = np.asarray(pixel.flatten_clip_to_frames(jnp.asarray(x)))
        want = x.transpose(0, 2, 3, 4, 1).reshape(8, 2, 2, 3)
        np.testing.assert_array_equal(frames, want)


class TestLosses:
    def test_cosine_matches_torch_semantics(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(5)
        a = rng.randn(6, 37).astype(np.float32)
        b = rng.randn(6, 37).astype(np.float32)
        got = np.asarray(losses.cosine_similarity_flat(jnp.asarray(a), jnp.asarray(b)))
        want = torch.nn.functional.cosine_similarity(
            torch.from_numpy(a), torch.from_numpy(b)
        ).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_cosine_identical_is_one(self):
        a = jnp.asarray(np.random.RandomState(6).randn(4, 2, 3, 5).astype(np.float32))
        got = losses.cosine_similarity_flat(a, a)
        np.testing.assert_allclose(np.asarray(got), 1.0, atol=1e-6)

    def test_dispersion_matches_torch_std(self):
        torch = pytest.importorskip("torch")
        x = np.random.RandomState(7).randn(4, 5, 6).astype(np.float32)
        got = float(losses.dispersion_cost([jnp.asarray(x)]))
        want = float(torch.from_numpy(x).std())
        assert abs(got - want) < 1e-4

    def test_cross_entropy_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(8)
        logits = rng.randn(5, 11).astype(np.float32)
        labels = rng.randint(0, 11, size=5)
        got = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
        want = float(
            torch.nn.CrossEntropyLoss()(
                torch.from_numpy(logits), torch.from_numpy(labels)
            )
        )
        assert abs(got - want) < 1e-4

    def test_ilaf_cost_direction(self):
        # When step features equal the init adv features, magnitude gain = 1
        # and angle = 1 → cost per tap = -(0.5 + 1) = -1.5.
        rng = np.random.RandomState(9)
        clean = jnp.asarray(rng.randn(2, 3, 4).astype(np.float32))
        adv = clean + jnp.asarray(rng.randn(2, 3, 4).astype(np.float32))
        dirs, norms = losses.feature_delta_direction([adv], [clean])
        cost = losses.ilaf_cost([adv], [clean], dirs, norms)
        np.testing.assert_allclose(float(cost), -1.5, atol=1e-5)

    def test_tap_distance_zero_for_identical(self):
        x = jnp.asarray(np.random.RandomState(10).randn(3, 4, 5).astype(np.float32))
        d = losses.tap_feature_distance([x], [x], batch=3)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


class TestGrads:
    def test_ingest_u8_clips_bitwise_matches_f32_path(self):
        """u8 ingress must be a pure transport optimization: ingest_u8_clips
        (device /255 → normalize → unnormalize) produces the SAME clean01 the
        f32 path does (host normalize → upload → device unnormalize), because
        both run the identical f32 op sequence. Bitwise is the contract —
        anything looser would make --u8_ingress a numerics knob."""
        from i2v_tpu.data import transforms

        u8 = np.random.RandomState(3).randint(
            0, 256, (2, 4, 8, 8, 3), dtype=np.uint8)
        host_norm = np.stack([transforms.u8_clip_to_normalized(c) for c in u8])
        clean01_f32 = np.asarray(
            pixel.unnormalize(jnp.asarray(host_norm), channel_axis=1))
        clean01_u8 = np.asarray(pixel.ingest_u8_clips(jnp.asarray(u8)))
        np.testing.assert_array_equal(clean01_u8, clean01_f32)

    def test_is_u8_clips_layout_detection(self):
        u8 = np.zeros((2, 4, 8, 8, 3), np.uint8)
        assert pixel.is_u8_clips(u8)
        assert not pixel.is_u8_clips(u8.astype(np.float32))
        assert not pixel.is_u8_clips(np.zeros((2, 3, 4, 8, 8), np.float32))
        # int-return-type adv clips are uint8 but channel-SECOND — not ingress
        assert not pixel.is_u8_clips(np.zeros((2, 3, 4, 8, 8), np.uint8))

    def test_norm_grads_frame_level(self):
        g = np.random.RandomState(11).randn(2, 3, 32, 4, 4).astype(np.float32)
        out = np.asarray(grads.norm_grads(jnp.asarray(g), frame_level=True))
        want = g / np.mean(np.abs(g), axis=(1, 3, 4), keepdims=True)
        np.testing.assert_allclose(out, want, rtol=1e-5)

    def test_norm_grads_clip_level(self):
        g = np.random.RandomState(12).randn(2, 3, 32, 4, 4).astype(np.float32)
        out = np.asarray(grads.norm_grads(jnp.asarray(g), frame_level=False))
        want = g / np.mean(np.abs(g), axis=(1, 2, 3, 4), keepdims=True)
        np.testing.assert_allclose(out, want, rtol=1e-5)

    def test_norm_grads_zero_frames_stay_zero(self):
        """SlowFast reads only x[:,::2] (fast) and x[:,::8] (slow), so odd
        temporal frames get identically-zero input gradients; per-frame
        normalization must return 0 for them, not 0/0 NaN (the reference's
        torch version has the same latent NaN — consciously fixed)."""
        g = np.random.RandomState(13).randn(2, 3, 8, 4, 4).astype(np.float32)
        g[:, :, 1::2] = 0.0  # frames no pathway touches
        out = np.asarray(grads.norm_grads(jnp.asarray(g), frame_level=True))
        assert np.isfinite(out).all()
        assert (out[:, :, 1::2] == 0).all()
        want = g[:, :, ::2] / np.mean(np.abs(g[:, :, ::2]), axis=(1, 3, 4),
                                      keepdims=True)
        np.testing.assert_allclose(out[:, :, ::2], want, rtol=1e-5)
        # all-zero input: l1_normalize is guarded the same way
        z = np.asarray(grads.l1_normalize(jnp.zeros((2, 3, 8, 4, 4))))
        assert np.isfinite(z).all() and (z == 0).all()
        # but a genuinely-NaN gradient (model overflow) must propagate
        # loudly, not be silently zeroed into a weak-but-passing attack
        bad = jnp.full((1, 3, 8, 4, 4), jnp.nan)
        assert np.isnan(np.asarray(grads.norm_grads(bad))).all()
        assert np.isnan(np.asarray(grads.l1_normalize(bad))).all()


class TestSmoothing:
    def test_ti_kernel_matches_scipy_formula(self):
        scipy_stats = pytest.importorskip("scipy.stats")
        x = np.linspace(-3, 3, 15)
        k1 = scipy_stats.norm.pdf(x)
        want = np.outer(k1, k1)
        want /= want.sum()
        np.testing.assert_allclose(smoothing.ti_kernel_2d(15, 3), want, rtol=1e-6)

    def test_ti_kernel_3d_normalized(self):
        k = smoothing.ti_kernel_3d(7, 3)
        assert k.shape == (7, 7, 7)
        np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)

    def test_temporal_kernels(self):
        for mode in ("gaussian", "linear", "uniform"):
            k = smoothing.temporal_kernel(15, mode)
            assert k.shape == (15,)
            np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
        # linear kernel is a symmetric ramp peaking at the center
        k = smoothing.temporal_kernel(7, "linear")
        np.testing.assert_allclose(k, k[::-1], rtol=1e-6)
        assert k[3] == k.max()

    def test_depthwise_conv2d_identity_kernel(self):
        g = jnp.asarray(np.random.RandomState(13).randn(1, 3, 4, 8, 8).astype(np.float32))
        ident = np.zeros((3, 3), np.float32)
        ident[1, 1] = 1.0
        out = smoothing.depthwise_conv2d_frames(g, ident)
        np.testing.assert_allclose(np.asarray(out), np.asarray(g), atol=1e-6)

    def test_depthwise_conv2d_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(14)
        g = rng.randn(2, 3, 4, 9, 9).astype(np.float32)
        k = smoothing.ti_kernel_2d(5, 3)
        got = np.asarray(smoothing.depthwise_conv2d_frames(jnp.asarray(g), k))
        stack = torch.from_numpy(np.tile(k[None, None], (3, 1, 1, 1)))
        want = np.empty_like(g)
        for t in range(4):
            want[:, :, t] = torch.nn.functional.conv2d(
                torch.from_numpy(g[:, :, t]), stack, groups=3, stride=1, padding=2
            ).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_depthwise_conv3d_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(15)
        g = rng.randn(1, 3, 6, 7, 7).astype(np.float32)
        k = smoothing.uniform_kernel_3d(3, 3)
        got = np.asarray(smoothing.depthwise_conv3d(jnp.asarray(g), k))
        stack = torch.from_numpy(np.tile(k[None, None], (3, 1, 1, 1, 1)))
        want = torch.nn.functional.conv3d(
            torch.from_numpy(g), stack, groups=3, stride=1, padding=1
        ).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_cycle_variants_match_manual_roll(self):
        x = jnp.asarray(np.random.RandomState(16).rand(1, 3, 8, 2, 2).astype(np.float32))
        shifts = [-2, -1, 0, 1, 2]
        vs = smoothing.cycle_variants(x, shifts)
        assert vs.shape == (5, 1, 3, 8, 2, 2)
        for i, s in enumerate(shifts):
            np.testing.assert_array_equal(
                np.asarray(vs[i]), np.asarray(jnp.roll(x, s, axis=2))
            )

    def test_smooth_variant_grads_is_weighted_sum(self):
        rng = np.random.RandomState(17)
        g = rng.randn(5, 1, 3, 4, 2, 2).astype(np.float32)
        k = smoothing.temporal_kernel(5, "gaussian")
        got = np.asarray(smoothing.smooth_variant_grads(jnp.asarray(g), k))
        want = np.tensordot(k, g, axes=(0, 0))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_large_move_shift(self):
        # frames=32: move 1 → (1+15)%32 = 16; move -1 → -16; move 0 → 0
        assert smoothing.large_move_shift(0, 32) == 0
        assert smoothing.large_move_shift(1, 32) == 16
        assert smoothing.large_move_shift(-1, 32) == -16
        assert smoothing.large_move_shift(7, 32) == 22


class TestPallasFallback:
    """On the CPU test platform the pallas module must dispatch to the jnp
    path and agree with i2v_tpu.ops.pixel exactly."""

    def test_sign_step_fallback(self):
        from i2v_tpu.ops import pallas_kernels as pk

        rng = np.random.RandomState(18)
        clean = jnp.asarray(rng.rand(2, 3, 4, 8, 8).astype(np.float32))
        adv = jnp.asarray(rng.rand(2, 3, 4, 8, 8).astype(np.float32))
        g = jnp.asarray(rng.randn(2, 3, 4, 8, 8).astype(np.float32))
        got = pk.sign_step_project(adv, g, clean, 0.01, 16 / 255)
        want = pixel.sign_step_project(adv, g, clean, 0.01, 16 / 255)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_rebuild_fallback_and_grad(self):
        from i2v_tpu.ops import pallas_kernels as pk

        rng = np.random.RandomState(19)
        clean = jnp.asarray(rng.rand(4, 8, 8, 3).astype(np.float32))
        m = jnp.asarray((rng.randn(4, 8, 8, 3) * 0.1).astype(np.float32))
        eps = 16 / 255
        got = pk.rebuild_adv(clean, m, eps)
        want = pixel.rebuild_adv(clean, m, eps)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-7)
        # gradient flows only where both clamps are inactive
        gfun = jax.grad(lambda mm: jnp.sum(pk.rebuild_adv(clean, mm, eps) ** 2))
        dm = np.asarray(gfun(m))
        assert np.isfinite(dm).all()
        clipped_out = np.abs(np.asarray(m)) > eps
        assert (dm[clipped_out] == 0).all()


class TestDiversityTorchParity:
    def test_diversity_gather_matches_reference_chain(self):
        """The static-shape DI gather must reproduce the reference's
        interpolate(nearest, low->rnd) -> pad -> interpolate(nearest,
        high->low) chain (base_attacks.py:356-376) for pinned draws."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as TF

        from i2v_tpu.ops.diversity import diversity_gather

        rng = np.random.RandomState(0)
        low, high = 224, 250
        x = rng.rand(2, 3, low, low).astype(np.float32)
        for rnd, pad_top, pad_left in [(224, 10, 25), (236, 0, 13),
                                       (249, 0, 0), (230, 19, 1)]:
            t = torch.from_numpy(x)
            resized = TF.interpolate(t, size=[rnd, rnd], mode="nearest")
            padded = TF.pad(resized, [pad_left, high - rnd - pad_left,
                                      pad_top, high - rnd - pad_top])
            want = TF.interpolate(padded, size=[low, low], mode="nearest").numpy()
            got = np.asarray(diversity_gather(
                jnp.asarray(x), jnp.int32(rnd), jnp.int32(pad_top),
                jnp.int32(pad_left), low, high))
            np.testing.assert_array_equal(got, want, err_msg=f"rnd={rnd}")

    def test_input_diversity_decorrelates_across_calls(self):
        """Attack.__call__ folds a call counter into the default rng, so
        DI draws differ batch to batch (the reference redraws per batch)."""
        import i2v_tpu.attacks as attacks
        from i2v_tpu.models import TinyVideoNet, init_bundle
        from i2v_tpu.ops import pixel

        clip = jnp.zeros((1, 3, 4, 32, 32), jnp.float32)
        vb = init_bundle(TinyVideoNet(), clip, "t", tap_keys=())
        videos = pixel.normalize(
            jnp.asarray(np.random.RandomState(1).rand(1, 3, 4, 32, 32)
                        .astype(np.float32)), channel_axis=1)
        labels = jnp.asarray([1])
        atk = attacks.DIFGSM(vb, steps=3)
        a = np.asarray(atk(videos, labels))
        b = np.asarray(atk(videos, labels))
        assert not np.array_equal(a, b)
        # explicit rng still gives reproducibility
        atk2 = attacks.DIFGSM(vb, steps=3)
        k = jax.random.PRNGKey(7)
        np.testing.assert_array_equal(
            np.asarray(atk2(videos, labels, rng=k)),
            np.asarray(atk2(videos, labels, rng=k)))


class TestSeparableSmooth:
    def test_separable_matches_dense_conv3d(self):
        """The banded-matmul separable smoother must reproduce the dense
        15^3-kernel depthwise conv3d it replaces (TIFGSM3D hot path)."""
        g = jnp.asarray(np.random.RandomState(0).randn(2, 3, 6, 10, 10),
                        jnp.float32)
        k1d = smoothing.gaussian_1d(5, 3.0)
        dense = smoothing.depthwise_conv3d(g, smoothing.ti_kernel_3d(5, 3.0))
        sep = smoothing.depthwise_conv3d_separable(g, k1d)
        np.testing.assert_allclose(np.asarray(sep), np.asarray(dense),
                                   atol=1e-6)

    def test_separable_gradient_matches(self):
        g = jnp.asarray(np.random.RandomState(1).randn(1, 3, 4, 8, 8),
                        jnp.float32)
        k1d = smoothing.gaussian_1d(3, 3.0)
        k3 = smoothing.ti_kernel_3d(3, 3.0)
        f_dense = lambda x: jnp.sum(smoothing.depthwise_conv3d(x, k3) ** 2)
        f_sep = lambda x: jnp.sum(
            smoothing.depthwise_conv3d_separable(x, k1d) ** 2)
        np.testing.assert_allclose(np.asarray(jax.grad(f_sep)(g)),
                                   np.asarray(jax.grad(f_dense)(g)), atol=1e-5)

    def test_ti_smooth_2d_separable_matches_dense(self):
        g = jnp.asarray(np.random.RandomState(2).randn(2, 3, 4, 12, 12),
                        jnp.float32)
        k1d = smoothing.gaussian_1d(5, 3.0)
        dense = smoothing.ti_smooth_2d(g, smoothing.ti_kernel_2d(5, 3.0))
        sep = smoothing.ti_smooth_2d_separable(g, k1d)
        np.testing.assert_allclose(np.asarray(sep), np.asarray(dense),
                                   atol=1e-5)
