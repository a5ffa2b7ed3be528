"""ASR-proxy harness (tools/asr_proxy.py): the quality gate behind the
bf16/multigrid bench rows (VERDICT r2 missing #2). The full 60-step run is
a tool artifact (ASR_PROXY.json); these tests cover the harness pieces at
unit scale so the gate logic itself is CI-checked."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def proxy():
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    try:
        import tools.asr_proxy as mod
        return mod
    finally:
        sys.path.remove(root)


class TestSmoothClips:
    def test_bounds_and_determinism(self, proxy):
        a = proxy.smooth_clips(3, 4, 16, seed=5)
        b = proxy.smooth_clips(3, 4, 16, seed=5)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        arr = np.asarray(a)
        assert arr.shape == (3, 3, 4, 16, 16)
        assert arr.min() >= 0.0 and arr.max() <= 1.0
        # low-frequency structure, not white noise: neighbouring pixels
        # correlate (the proxy's victims are conv nets)
        dx = np.abs(np.diff(arr, axis=-1)).mean()
        assert dx < 0.1

    def test_distinct_seeds_differ(self, proxy):
        a = np.asarray(proxy.smooth_clips(2, 4, 16, seed=0))
        b = np.asarray(proxy.smooth_clips(2, 4, 16, seed=1))
        assert np.abs(a - b).max() > 0.01


class TestFoolingRates:
    def test_flip_counting(self, proxy, monkeypatch):
        # two fake victims: one flips every prediction under adv, one none
        clean = {"v_all": np.array([1, 2, 3, 4]),
                 "v_none": np.array([5, 6, 7, 8])}
        adv_preds = {"v_all": np.array([0, 0, 0, 0]),
                     "v_none": np.array([5, 6, 7, 8])}
        monkeypatch.setattr(proxy, "victim_preds",
                            lambda victims, clips: adv_preds)
        rates = proxy.fooling_rates({"v_all": None, "v_none": None},
                                    clean, adv01=None)
        assert rates["v_all"] == 1.0
        assert rates["v_none"] == 0.0
        assert rates["mean"] == 0.5


class TestPredAgreement:
    def test_identical_and_disjoint(self, proxy):
        a = {"v1": np.array([1, 2, 3, 4]), "v2": np.array([5, 6, 7, 8])}
        assert proxy.pred_agreement(a, a) == 1.0
        b = {"v1": np.array([0, 0, 0, 0]), "v2": np.array([9, 9, 9, 9])}
        assert proxy.pred_agreement(a, b) == 0.0

    def test_partial_mean_over_victims(self, proxy):
        # v1 agrees on 2/4, v2 on 4/4 → mean 0.75
        a = {"v1": np.array([1, 2, 3, 4]), "v2": np.array([5, 6, 7, 8])}
        b = {"v1": np.array([1, 2, 0, 0]), "v2": np.array([5, 6, 7, 8])}
        assert proxy.pred_agreement(a, b) == 0.75


class TestFlipOverlap:
    def test_identical_flip_sets(self, proxy):
        clean = {"v": np.array([0, 0, 0, 0])}
        ref = {"v": np.array([1, 0, 2, 0])}  # flips pairs 0 and 2
        out = proxy.flip_overlap(clean, ref, ref)
        assert out == {"flip_jaccard": 1.0, "lever_hits_ref_flips": 1.0,
                       "same_adv_class_given_both_flip": 1.0}

    def test_disjoint_and_divergent_targets(self, proxy):
        clean = {"v": np.array([0, 0, 0, 0])}
        ref = {"v": np.array([1, 0, 2, 0])}    # flips {0, 2}
        lever = {"v": np.array([0, 3, 2, 0])}  # flips {1, 2}
        out = proxy.flip_overlap(clean, ref, lever)
        # intersection {2}, union {0,1,2}; pair 2 steered to the same class
        assert out["flip_jaccard"] == round(1 / 3, 4)
        assert out["lever_hits_ref_flips"] == 0.5
        assert out["same_adv_class_given_both_flip"] == 1.0

    def test_same_pairs_different_classes(self, proxy):
        clean = {"v": np.array([0, 0])}
        ref = {"v": np.array([1, 2])}
        lever = {"v": np.array([3, 4])}  # same flip set, other classes
        out = proxy.flip_overlap(clean, ref, lever)
        assert out["flip_jaccard"] == 1.0
        assert out["same_adv_class_given_both_flip"] == 0.0

    def test_no_flips_is_vacuously_perfect(self, proxy):
        clean = {"v": np.array([0, 0])}
        out = proxy.flip_overlap(clean, clean, clean)
        assert out == {"flip_jaccard": 1.0, "lever_hits_ref_flips": 1.0,
                       "same_adv_class_given_both_flip": 1.0}


class TestPoweredGate:
    """The round-5 relative-efficacy gate (VERDICT r4 next #1): must PASS a
    lever that retains efficacy, FAIL one that destroys it, FAIL noise and
    identity (the self-test rows), and carry clip-bootstrap CIs."""

    def _mats(self, proxy):
        rng = np.random.RandomState(0)
        f32 = rng.rand(6, 120) < 0.30
        noise = rng.rand(6, 120) < 0.02
        return f32, noise

    def test_retaining_lever_passes_significantly(self, proxy):
        rng = np.random.RandomState(1)
        f32, noise = self._mats(proxy)
        good = f32 & (rng.rand(6, 120) < 0.9)  # ~90% retention
        g = proxy.gate_lever(f32, good, noise, n_boot=400)
        assert g["passes"] and g["passes_significant"]
        assert g["retention_of_f32_efficacy"] > 0.7
        lo, hi = g["margin_ci95"]
        assert lo <= g["margin"] <= hi

    def test_destroyed_attack_fails_significantly(self, proxy):
        rng = np.random.RandomState(2)
        f32, noise = self._mats(proxy)
        bad = rng.rand(6, 120) < 0.04  # ~7% retention
        g = proxy.gate_lever(f32, bad, noise, n_boot=400)
        assert not g["passes"] and g["fails_significant"]

    def test_noise_and_identity_fail(self, proxy):
        f32, noise = self._mats(proxy)
        g_noise = proxy.gate_lever(f32, noise, noise, n_boot=200)
        g_id = proxy.gate_lever(f32, np.zeros_like(f32), noise, n_boot=200)
        assert not g_noise["passes"] and not g_id["passes"]

    def test_flip_matrix_shape_and_values(self, proxy):
        clean = {"a": np.array([0, 1]), "b": np.array([2, 3])}
        adv = {"a": np.array([0, 9]), "b": np.array([2, 3])}
        m = proxy.flip_matrix(clean, adv)
        np.testing.assert_array_equal(
            m, np.array([[False, True], [False, False]]))

    def test_bootstrap_ci_brackets_point_estimate(self, proxy):
        rng = np.random.RandomState(3)
        x = rng.rand(200) < 0.4
        lo, hi = proxy.bootstrap_ci(lambda idx: x[idx].mean(), 200,
                                    n_boot=500)
        assert lo < x.mean() < hi
        assert hi - lo < 0.2  # n=200 binomial CI is tight-ish

    def test_exact_lever_margin_equals_half_efficacy(self, proxy):
        # lever == f32 exactly → margin = (1 − retain)·efficacy
        f32, noise = self._mats(proxy)
        g = proxy.gate_lever(f32, f32, noise, retain=0.5, n_boot=100)
        eff = f32.mean() - noise.mean()
        assert abs(g["margin"] - 0.5 * eff) < 1e-4  # margin rounds to 4dp
        assert g["retention_of_f32_efficacy"] == 1.0


class TestSyntheticTask:
    """The trained-victims mode (VERDICT r3 next #3): the synthetic K-class
    task must be balanced, deterministic, and learnable enough that clean
    accuracy clears chance — the precondition for the fooling-rate gate to
    measure attack efficacy instead of divergence-vs-chaos."""

    def test_labeled_clips_balanced_and_bounded(self, proxy):
        clips, labels = proxy.labeled_clips(20, 4, 16, seed=2)
        arr, lab = np.asarray(clips), np.asarray(labels)
        assert arr.shape == (20, 3, 4, 16, 16)
        assert arr.min() >= 0.0 and arr.max() <= 1.0
        counts = np.bincount(lab, minlength=proxy.N_CLASSES)
        assert counts.min() == counts.max() == 2  # balanced by construction
        c2, l2 = proxy.labeled_clips(20, 4, 16, seed=2)
        np.testing.assert_array_equal(arr, np.asarray(c2))
        np.testing.assert_array_equal(lab, np.asarray(l2))

    def test_class_signal_separable(self, proxy):
        # nearest-pattern classification of the labeled clips must beat
        # chance by a wide margin — the signal the nets are asked to learn
        pats = np.asarray(proxy.class_patterns(t=4, hw=16))
        clips, labels = proxy.labeled_clips(40, 4, 16, seed=3)
        arr = np.asarray(clips)
        d = ((arr[:, None] - pats[None]) ** 2).sum(axis=(2, 3, 4, 5))
        acc = (d.argmin(axis=1) == np.asarray(labels)).mean()
        assert acc > 0.9

    def test_training_beats_chance(self, proxy):
        # a single tiny victim trained briefly on the task must clear
        # chance on held-out clips — the harness's efficacy precondition
        from i2v_tpu.models import get_video_model

        pats = proxy.class_patterns(t=4, hw=16)
        train_x, train_y = proxy.labeled_clips(60, 4, 16, seed=7,
                                               patterns=pats)
        test_x, test_y = proxy.labeled_clips(30, 4, 16, seed=8,
                                             patterns=pats)
        victims = {"v": get_video_model("i3d_resnet50", tiny=True, seed=0,
                                        example_shape=(1, 3, 4, 16, 16))}
        trained = proxy.train_victims(victims, train_x, train_y, steps=120)
        acc = proxy.clean_accuracy(trained, test_x, test_y)
        assert acc["v"] > 2.5 / proxy.N_CLASSES, acc


class TestEndToEndMicro:
    def test_attack_invariants_and_gate_schema(self, proxy):
        """One micro f32 config through run_config: ε-ball + [0,1] asserted
        inside, fooling rates well-formed against real tiny victims."""
        from i2v_tpu.models import get_image_models
        from i2v_tpu.parallel import attack_mesh

        import jax

        mesh = attack_mesh(jax.devices()[:1])
        clips01 = proxy.smooth_clips(2, 4, 32)
        surr = get_image_models(proxy.ENS_NAMES, proxy.ENS_DEPTHS, tiny=True,
                                input_hw=32)
        adv01, final_cost = proxy.run_config(
            "f32", surr, mesh, clips01, steps=2)
        assert np.isfinite(final_cost)
        victims = {"tiny": __import__("i2v_tpu.models", fromlist=["x"]
                                      ).get_video_model(
            "i3d_resnet50", tiny=True, example_shape=(1, 3, 4, 32, 32))}
        clean = proxy.victim_preds(victims, clips01)
        rates = proxy.fooling_rates(victims, clean, adv01)
        assert set(rates) == {"tiny", "mean"}
        assert 0.0 <= rates["mean"] <= 1.0
