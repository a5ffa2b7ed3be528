"""Backbone tests: tap shapes match the torchvision layers the reference
hooks (image_attacks.py:260-271), truncation preserves taps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2v_tpu.models import TinyVideoNet, build_image_model, get_image_models, init_bundle
from i2v_tpu.models import registry


def _init_and_taps(name, depths, hw=224):
    module, tap_keys = build_image_model(name, depths, truncate=True)
    x = jnp.zeros((1, hw, hw, 3), dtype=jnp.float32)
    params = module.init(jax.random.PRNGKey(0), x)
    _, taps = module.apply(params, x)
    return {k: taps[k].shape for k in tap_keys}


@pytest.mark.slow
class TestTapShapes:
    """Expected shapes = torchvision activation shapes (NHWC here).
    Full 224² CPU forwards — excluded from the default run (pytest -m slow)."""

    def test_alexnet(self):
        shapes = _init_and_taps("alexnet", [1, 2, 3, 4])
        assert shapes[1] == (1, 55, 55, 64)
        assert shapes[4] == (1, 27, 27, 192)
        assert shapes[7] == (1, 13, 13, 384)
        assert shapes[11] == (1, 13, 13, 256)

    def test_squeezenet(self):
        # list depths (AENS semantics, TPAMI_attack.py:197-200) tap the Fire
        # module concat → 2x the expand width
        shapes = _init_and_taps("squeezenet", [1, 2, 3, 4])
        assert shapes[3] == (1, 55, 55, 128)
        assert shapes[6] == (1, 27, 27, 256)
        assert shapes[9] == (1, 13, 13, 384)
        assert shapes[12] == (1, 13, 13, 512)

    def test_squeezenet_scalar_depth_taps_e3(self):
        # scalar depth (image_attacks.py:268-271) taps expand3x3_activation
        shapes = _init_and_taps("squeezenet", 2)
        assert shapes[6] == (1, 27, 27, 128)

    def test_vgg_shallow(self):
        shapes = _init_and_taps("vgg", [1, 2])
        assert shapes[1] == (1, 224, 224, 64)
        assert shapes[11] == (1, 56, 56, 256)

    def test_vgg_deep(self):
        shapes = _init_and_taps("vgg", [3, 4])
        assert shapes[20] == (1, 28, 28, 512)
        assert shapes[29] == (1, 14, 14, 512)

    def test_resnet101(self):
        shapes = _init_and_taps("resnet", [1, 2])
        assert shapes[1] == (1, 56, 56, 256)
        assert shapes[2] == (1, 28, 28, 512)


class TestTruncation:
    def test_truncated_taps_identical_densenet_vit(self):
        """densenet/vit honor truncate too (previously silently dropped —
        the full network ran past the deepest tap on every attack step)."""
        x = jnp.asarray(np.random.RandomState(5).rand(2, 32, 32, 3).astype(np.float32))
        for name in ("densenet", "vit"):
            m_full, keys = build_image_model(name, [1], truncate=False, tiny=True)
            m_trunc, _ = build_image_model(name, [1], truncate=True, tiny=True)
            params = m_full.init(jax.random.PRNGKey(1), x)
            logits, taps_full = m_full.apply(params, x)
            out, taps_trunc = m_trunc.apply(params, x)
            assert out is None and logits is not None, name
            for k in keys:
                np.testing.assert_allclose(
                    np.asarray(taps_full[k]), np.asarray(taps_trunc[k]),
                    atol=1e-6, err_msg=f"{name} tap {k}")

    def test_vit_resolution_agnostic_apply(self):
        """A ViT initialized at one input size must run at another: the
        learned pos_embed grid is bilinearly resized at apply time (conv
        backbones are naturally resolution-independent; vit was the one
        registry entry that crashed under --tiny models + real 224 data)."""
        m, keys = build_image_model("vit", [1], truncate=True, tiny=True)
        x32 = jnp.zeros((2, 32, 32, 3))
        params = m.init(jax.random.PRNGKey(0), x32)
        _, taps64 = m.apply(params, jnp.zeros((2, 64, 64, 3)))
        assert taps64[keys[0]].shape[1] == (64 // m.patch) ** 2 + 1

    def test_truncated_taps_identical(self):
        x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32))
        for name in ("alexnet", "squeezenet", "vgg"):
            m_full, keys = build_image_model(name, [1, 2], truncate=False, tiny=True)
            m_trunc, _ = build_image_model(name, [1, 2], truncate=True, tiny=True)
            params = m_full.init(jax.random.PRNGKey(1), x)
            logits, taps_full = m_full.apply(params, x)
            out, taps_trunc = m_trunc.apply(params, x)
            assert out is None
            assert logits is not None
            for k in keys:
                np.testing.assert_allclose(
                    np.asarray(taps_full[k]), np.asarray(taps_trunc[k]),
                    atol=1e-6, err_msg=f"{name} tap {k}",
                )

    def test_resnet_tiny_truncation(self):
        x = jnp.asarray(np.random.RandomState(2).rand(2, 64, 64, 3).astype(np.float32))
        m_full, keys = build_image_model("resnet", [2], truncate=False, tiny=True)
        m_trunc, _ = build_image_model("resnet", [2], truncate=True, tiny=True)
        params = m_full.init(jax.random.PRNGKey(1), x)
        _, tf = m_full.apply(params, x)
        _, tt = m_trunc.apply(params, x)
        np.testing.assert_allclose(np.asarray(tf[2]), np.asarray(tt[2]), atol=1e-6)


class TestBundles:
    def test_get_image_models_tiny(self):
        bundles = get_image_models(
            ["resnet", "vgg"], {"resnet": 2, "vgg": 3}, tiny=True, input_hw=64
        )
        x = jnp.zeros((4, 64, 64, 3))
        for b in bundles:
            _, taps = b.apply01_taps(x)
            assert len(taps) == 1

    def test_multi_depth_tap_order(self):
        # AENS-style 2 taps/model, forward order (shallow first)
        bundles = get_image_models(
            ["alexnet"], {"alexnet": [2, 3]}, tiny=True, input_hw=64
        )
        b = bundles[0]
        assert b.tap_keys == (4, 7)
        _, taps = b.apply01_taps(jnp.zeros((2, 64, 64, 3)))
        assert taps[0].shape[1] > taps[1].shape[1]  # shallower tap is larger

    def test_video_bundle_relu_grad_scale(self):
        clip = jnp.asarray(np.random.RandomState(3).rand(1, 3, 4, 16, 16).astype(np.float32))
        bundle = init_bundle(TinyVideoNet(), clip, "tiny", tap_keys=("block1", "block2"))
        logits = bundle.apply01(clip)
        scaled = bundle.with_relu_grad_scale(0.5)
        logits2 = scaled.apply01(clip)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), atol=1e-6)

        def loss(b, x):
            return jnp.sum(b.apply01(x) ** 2)

        g1 = jax.grad(lambda x: loss(bundle, x))(clip)
        g2 = jax.grad(lambda x: loss(scaled, x))(clip)
        # scaled ReLU gradients must differ (two scaled ReLUs in the path)
        assert float(jnp.abs(g1 - g2).max()) > 0

    def test_apply_norm_consistency(self):
        from i2v_tpu.ops import pixel

        clip01 = jnp.asarray(np.random.RandomState(4).rand(1, 3, 4, 16, 16).astype(np.float32))
        bundle = init_bundle(TinyVideoNet(), clip01, "tiny")
        a = bundle.apply01(clip01)
        b = bundle.apply_norm(pixel.normalize(clip01, channel_axis=1))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_depth_to_tap_tables(self):
        assert registry.DEPTH_TO_TAP["vgg"] == {1: 1, 2: 11, 3: 20, 4: 29}
        assert registry.DEPTH_TO_TAP["alexnet"] == {1: 1, 2: 4, 3: 7, 4: 11}
        assert registry.DEPTH_TO_TAP["squeezenet"] == {1: 3, 2: 6, 3: 9, 4: 12}
