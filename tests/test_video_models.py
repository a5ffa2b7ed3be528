"""Video backbone tests: shapes, taps, temporal dims, SGM support, and
attack-engine integration on tiny variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import i2v_tpu.attacks as attacks
from i2v_tpu.models import get_video_model, tap_keys_for
from i2v_tpu.models.api import VideoModel
from i2v_tpu.ops import pixel


@pytest.fixture(scope="module", params=["i3d_resnet50", "slowfast_resnet50",
                                        "tpn_resnet50"])
def tiny_bundle(request):
    return get_video_model(request.param, tiny=True)


def _clip(b=1, t=8, s=32, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.rand(b, 3, t, s, s).astype(np.float32))


class TestTinyVariants:
    def test_forward_and_taps(self, tiny_bundle):
        clip01 = _clip()
        logits, taps = tiny_bundle.apply01_taps(clip01)
        assert logits.shape == (1, 10)
        assert len(taps) == len(tiny_bundle.tap_keys)
        for t in taps:
            assert t.ndim == 5 and np.isfinite(np.asarray(t)).all()

    def test_relu_grad_scale(self, tiny_bundle):
        clip01 = _clip()
        scaled = tiny_bundle.with_relu_grad_scale(0.5)
        np.testing.assert_allclose(
            np.asarray(tiny_bundle.apply01(clip01)),
            np.asarray(scaled.apply01(clip01)), atol=1e-5)
        g1 = jax.grad(lambda x: jnp.sum(tiny_bundle.apply01(x)))(clip01)
        g2 = jax.grad(lambda x: jnp.sum(scaled.apply01(x)))(clip01)
        assert float(jnp.abs(g1 - g2).max()) > 0

    def test_bim_attack_runs(self, tiny_bundle):
        clip01 = _clip()
        videos = pixel.normalize(clip01, channel_axis=1)
        labels = jnp.asarray([3])
        adv = attacks.BIM(tiny_bundle, steps=2)(videos, labels)
        adv01 = pixel.unnormalize(adv, channel_axis=1)
        assert float(jnp.abs(adv01 - clip01).max()) <= 16 / 255 + 1e-5

    def test_tap_attack_runs(self, tiny_bundle):
        videos = pixel.normalize(_clip(), channel_axis=1)
        adv = attacks.TAP(tiny_bundle, steps=2)(videos, jnp.asarray([1]))
        assert np.isfinite(np.asarray(adv)).all()

    def test_ilaf_runs(self, tiny_bundle):
        videos = pixel.normalize(_clip(), channel_axis=1)
        labels = jnp.asarray([2])
        adv = attacks.BIM(tiny_bundle, steps=2)(videos, labels)
        ilaf_bundle = tiny_bundle.with_taps(
            tap_keys_for(tiny_bundle.name, "ilaf"))
        out = attacks.ILAF(ilaf_bundle, tiny_bundle.name, steps=3)(adv, videos, labels)
        assert np.isfinite(np.asarray(out)).all()


class TestTapTables:
    def test_reference_tap_maps(self):
        assert tap_keys_for("i3d_resnet101") == ("res_layer1", "res_layer2")
        assert tap_keys_for("slowfast_resnet50") == (
            "slow_res2", "slow_res3", "fast_res2", "fast_res3")
        assert tap_keys_for("tpn_resnet50") == ("layer1", "layer2")
        assert tap_keys_for("i3d_resnet50", "ilaf") == ("res_layer2",)
        assert tap_keys_for("slowfast_resnet101", "ilaf") == ("slow_res2", "fast_res2")
        assert tap_keys_for("tpn_resnet101", "ilaf") == ("layer2",)

    def test_unknown_model_rejected(self):
        with pytest.raises(ValueError):
            get_video_model("c3d_resnet50")


@pytest.mark.slow
class TestFullSizeShapes:
    """Full-size architectures at reduced T (CPU-minutes; run with -m slow)."""

    def test_i3d_resnet50_shapes(self):
        b = get_video_model("i3d_resnet50", example_shape=(1, 3, 8, 64, 64))
        logits, taps = b.module.apply(b.params, jnp.zeros((1, 3, 8, 64, 64)))
        assert logits.shape == (1, 400)
        # stem t/2 → res_layer1 at T=4; pool2 → T=2 for later stages
        assert taps["res_layer1"].shape == (1, 4, 16, 16, 256)
        assert taps["res_layer2"].shape == (1, 2, 8, 8, 512)

    def test_slowfast_shapes(self):
        b = get_video_model("slowfast_resnet50", example_shape=(1, 3, 32, 64, 64))
        logits, taps = b.module.apply(b.params, jnp.zeros((1, 3, 32, 64, 64)))
        assert logits.shape == (1, 400)
        # gluoncv 8x8 pathway subsampling: 32-frame clip → 16 fast / 4 slow
        assert taps["fast_res2"].shape == (1, 16, 16, 16, 32)
        assert taps["slow_res2"].shape == (1, 4, 16, 16, 256)

    def test_tpn_shapes(self):
        b = get_video_model("tpn_resnet50", example_shape=(1, 3, 8, 64, 64))
        logits, taps = b.module.apply(b.params, jnp.zeros((1, 3, 8, 64, 64)))
        assert logits.shape == (1, 400)
        assert taps["layer1"].shape == (1, 8, 16, 16, 256)
        assert taps["layer2"].shape == (1, 8, 8, 8, 512)


class TestPartialCheckpointLoad:
    def test_overlay_merge(self):
        from i2v_tpu.models.video_zoo import _overlay

        init = {"a": {"kernel": 1, "bias": 2}, "neck": {"kernel": 3}}
        restored = {"a": {"kernel": 10, "bias": 20}}
        merged, missing = _overlay(init, restored)
        assert merged["a"] == {"kernel": 10, "bias": 20}
        assert merged["neck"] == {"kernel": 3}  # stays init
        assert missing == {"neck"}

    def test_partial_checkpoint_loads_with_warning(self, tmp_path, monkeypatch):
        """A backbone-only checkpoint (e.g. TPN before neck naming discovery)
        must load, warn about random-init modules, and run — not crash with
        ScopeParamNotFoundError (production regression)."""
        import warnings as w

        from flax import serialization

        from i2v_tpu.models import video_zoo

        monkeypatch.setenv("I2V_TPU_CKPTS", str(tmp_path))
        # full-size builder swapped for the tiny one so init/apply are cheap
        monkeypatch.setitem(video_zoo.VIDEO_BUILDERS, "tpn_resnet50",
                            video_zoo.TINY_BUILDERS["tpn_resnet50"])
        full = video_zoo.get_video_model("tpn_resnet50", tiny=True).params["params"]
        partial = {k: v for k, v in full.items() if not k.startswith(
            ("sm_", "tm_", "down_", "lf1_", "lf2_", "pyramid", "fc"))}
        with open(tmp_path / "tpn_resnet50.msgpack", "wb") as f:
            f.write(serialization.msgpack_serialize(partial))
        with w.catch_warnings(record=True) as rec:
            w.simplefilter("always")
            bundle = video_zoo.get_video_model(
                "tpn_resnet50", example_shape=(1, 3, 8, 32, 32))
        msgs = [str(r.message) for r in rec]
        # the warning lists the first 8 missing modules alphabetically
        assert any("random init" in m and "down_0" in m and "lf1_op0" in m
                   for m in msgs)
        clip01 = jnp.zeros((1, 3, 8, 32, 32), jnp.float32)
        logits = bundle.apply01(clip01)
        assert np.isfinite(np.asarray(logits)).all()


class TestRemat:
    def test_remat_identical_outputs_and_grads(self):
        """remat=True must change memory behavior only — logits and input
        gradients identical to the plain model."""
        from i2v_tpu.models import i3d

        x = jnp.asarray(np.random.RandomState(0).rand(1, 3, 8, 32, 32),
                        jnp.float32)
        outs = {}
        for remat in (False, True):
            mod = i3d.i3d_tiny(remat=remat)
            params = mod.init(jax.random.PRNGKey(0), x)

            def f(xx):
                return jnp.sum(mod.apply(params, xx)[0])

            outs[remat] = (float(f(x)), np.asarray(jax.grad(f)(x)))
        assert outs[True][0] == outs[False][0]
        np.testing.assert_array_equal(outs[True][1], outs[False][1])
