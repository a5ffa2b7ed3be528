"""GradCAM + DenseNet/ViT zoo tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from i2v_tpu.eval import gradcam
from i2v_tpu.models import get_image_models


@pytest.fixture(scope="module")
def tiny_resnet():
    return get_image_models(["resnet"], {"resnet": 2}, tiny=True,
                            truncate=False, input_hw=32)[0]


class TestGradCAM:
    def test_cam_shape_and_range(self, tiny_resnet):
        x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32))
        cam = gradcam.grad_cam(tiny_resnet, x)
        assert cam.ndim == 3 and cam.shape[0] == 2
        c = np.asarray(cam)
        assert c.min() >= 0 and c.max() <= 1 + 1e-6
        # GLOBAL min-max scale (reference uses scalar .min()/.max(),
        # image_cam.py:128-129): batch max is 1, batch min is 0
        assert np.isclose(c.max(), 1) and np.isclose(c.min(), 0)

    def test_cam_upsample(self, tiny_resnet):
        x = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32))
        cam = gradcam.grad_cam(tiny_resnet, x, upsample_to=32)
        assert cam.shape == (1, 32, 32)

    def test_cam_update_gradient(self, tiny_resnet):
        x = jnp.asarray(np.random.RandomState(2).rand(1, 32, 32, 3).astype(np.float32))
        ref = jnp.zeros_like(gradcam.grad_cam(tiny_resnet, x))
        g = gradcam.grad_cam_update(tiny_resnet, x, ref)
        assert g.shape == x.shape
        assert np.isfinite(np.asarray(g)).all()

    def test_average_cam(self):
        # 64² input: tiny AlexNet's full forward needs ≥64 spatial
        bundles = get_image_models(
            ["resnet", "alexnet"], {"resnet": 2, "alexnet": 2}, tiny=True,
            truncate=False, input_hw=64)
        x = jnp.asarray(np.random.RandomState(3).rand(1, 64, 64, 3).astype(np.float32))
        cam = gradcam.average_grad_cam(bundles, x, upsample_to=64)
        assert cam.shape == (1, 64, 64)

    def test_visualize(self, tiny_resnet):
        x = np.random.RandomState(4).rand(1, 32, 32, 3).astype(np.float32)
        cam = gradcam.grad_cam(tiny_resnet, jnp.asarray(x), upsample_to=32)
        img = gradcam.visualize_cam(np.asarray(cam)[0], x[0])
        assert img.shape == (32, 32, 3) and img.dtype == np.uint8

    def test_tap_offset_is_exact(self, tiny_resnet):
        # offset=0 must not change the forward
        x = jnp.asarray(np.random.RandomState(5).rand(1, 32, 32, 3).astype(np.float32))
        logits, taps = tiny_resnet.module.apply(tiny_resnet.params, x)
        off = {2: jnp.zeros_like(taps[2])}
        logits2, _ = tiny_resnet.module.apply(tiny_resnet.params, x, tap_offset=off)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), atol=1e-6)

    def test_truncated_bundle_raises_clear_error(self):
        # a default (attack-build, truncate=True) bundle has no logits;
        # GradCAM and apply01 must point at truncate=False, not TypeError
        b = get_image_models(["densenet"], {"densenet": 2}, tiny=True,
                             input_hw=32)[0]
        x = jnp.zeros((1, 32, 32, 3))
        with pytest.raises(ValueError, match="truncate=False"):
            gradcam.grad_cam(b, x)
        with pytest.raises(ValueError, match="truncate=False"):
            b.apply01(x)


class TestExtraZoo:
    def test_densenet_tiny(self):
        # default (attack) build truncates at the deepest tap: no logits
        b = get_image_models(["densenet"], {"densenet": 2}, tiny=True,
                             input_hw=32)[0]
        logits, taps = b.apply01_taps(jnp.zeros((1, 32, 32, 3)))
        assert logits is None and len(taps) == 1
        # full build (GradCAM/eval) keeps the classifier head
        bf = get_image_models(["densenet"], {"densenet": 2}, tiny=True,
                              input_hw=32, truncate=False)[0]
        logits, taps = bf.apply01_taps(jnp.zeros((1, 32, 32, 3)))
        assert logits.shape == (1, 10)
        assert len(taps) == 1

    def test_vit_tiny(self):
        b = get_image_models(["vit"], {"vit": 1}, tiny=True, input_hw=32,
                             truncate=False)[0]
        logits, taps = b.apply01_taps(jnp.zeros((2, 32, 32, 3)))
        assert logits.shape == (2, 10)
        assert taps[0].ndim == 3  # (B, tokens, dim)
        # default attack build truncates past the deepest tapped block
        bt = get_image_models(["vit"], {"vit": 1}, tiny=True, input_hw=32)[0]
        logits_t, taps_t = bt.apply01_taps(jnp.zeros((2, 32, 32, 3)))
        assert logits_t is None
        np.testing.assert_allclose(np.asarray(taps_t[0]),
                                   np.asarray(taps[0]), atol=1e-6)

    def test_densenet_converter_parity(self):
        torch = pytest.importorskip("torch")
        import torch.nn as tnn

        from i2v_tpu.models import convert as cv
        from i2v_tpu.models.densenet import DenseNet

        class TorchDenseLayer(tnn.Module):
            def __init__(self, cin, growth, bn_size=4):
                super().__init__()
                self.norm1 = tnn.BatchNorm2d(cin)
                self.conv1 = tnn.Conv2d(cin, bn_size * growth, 1, bias=False)
                self.norm2 = tnn.BatchNorm2d(bn_size * growth)
                self.conv2 = tnn.Conv2d(bn_size * growth, growth, 3, padding=1,
                                        bias=False)

            def forward(self, x):
                y = self.conv1(torch.relu(self.norm1(x)))
                y = self.conv2(torch.relu(self.norm2(y)))
                return torch.cat([x, y], 1)

        growth, init_f = 8, 16
        blocks = (2, 2)
        tm = tnn.Module()
        feats = tnn.Module()
        feats.conv0 = tnn.Conv2d(3, init_f, 7, 2, 3, bias=False)
        feats.norm0 = tnn.BatchNorm2d(init_f)
        c = init_f
        for i, n in enumerate(blocks):
            blk = tnn.Module()
            for j in range(1, n + 1):
                setattr(blk, f"denselayer{j}", TorchDenseLayer(c, growth))
                c += growth
            setattr(feats, f"denseblock{i + 1}", blk)
            if i + 1 < len(blocks):
                tr = tnn.Module()
                tr.norm = tnn.BatchNorm2d(c)
                tr.conv = tnn.Conv2d(c, c // 2, 1, bias=False)
                setattr(feats, f"transition{i + 1}", tr)
                c //= 2
        feats.norm5 = tnn.BatchNorm2d(c)
        tm.features = feats
        tm.classifier = tnn.Linear(c, 10)
        tm.eval()

        def torch_fwd(x01):
            mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
            std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
            x = (torch.from_numpy(x01).permute(0, 3, 1, 2) - mean) / std
            x = feats.conv0(x)
            x = torch.relu(feats.norm0(x))
            x = tnn.functional.max_pool2d(x, 3, 2, 1)
            for i in range(len(blocks)):
                blk = getattr(feats, f"denseblock{i + 1}")
                for j in range(1, blocks[i] + 1):
                    x = getattr(blk, f"denselayer{j}")(x)
                if i + 1 < len(blocks):
                    tr = getattr(feats, f"transition{i + 1}")
                    x = tnn.functional.avg_pool2d(tr.conv(torch.relu(tr.norm(x))), 2)
            x = torch.relu(feats.norm5(x))
            return tm.classifier(x.mean((2, 3)))

        x01 = np.random.RandomState(6).rand(1, 32, 32, 3).astype(np.float32)
        with torch.no_grad():
            want = torch_fwd(x01).numpy()
        params = cv.convert_densenet161(tm.state_dict(), block_config=blocks)
        module = DenseNet(block_config=blocks, growth=growth,
                          init_features=init_f, num_classes=10)
        got, _ = module.apply({"params": params}, jnp.asarray(x01))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_grad_cam_on_fire_concat_taps():
    """List-depth (AENS) squeezenet taps the Fire concat; the GradCAM
    tap_offset must land on that same tensor (regression: offset was added
    to e3 while the tap was the 2x-channel concat — shape mismatch)."""
    bundle = get_image_models(
        ["squeezenet"], {"squeezenet": [2, 3]}, tiny=True, truncate=False,
        input_hw=32)[0]
    x = jnp.asarray(np.random.RandomState(2).rand(2, 32, 32, 3).astype(np.float32))
    cam = gradcam.grad_cam(bundle, x)
    assert cam.shape[0] == 2
    assert np.isfinite(np.asarray(cam)).all()


class TestGradCAMCLI:
    """cli/gradcam.py: the artifact-dir entry point for C21."""

    def test_cli_over_artifacts(self, tmp_path):
        import os

        from i2v_tpu.cli import gradcam as cli
        from i2v_tpu.ops import pixel

        rng = np.random.RandomState(0)
        run = tmp_path / "run"
        run.mkdir()
        for label in (3, 7):
            clip01 = rng.rand(3, 4, 64, 64).astype(np.float32)
            clip_norm = np.asarray(pixel.normalize(jnp.asarray(clip01),
                                                   channel_axis=0))
            np.save(run / f"{label}-adv.npy", clip_norm)
        out = cli.main([
            "--used_adv", str(run), "--tiny", "--models", "resnet", "alexnet",
            "--batch_size", "2", "--save_png", "2",
            "--out", str(tmp_path / "cam")])
        for label in (3, 7):
            cam = np.load(os.path.join(out, f"{label}-cam.npy"))
            assert cam.shape == (4, 64, 64) and cam.dtype == np.float16
            assert float(cam.min()) >= 0 and float(cam.max()) <= 1 + 1e-3
            # per-clip normalization: every clip's mask spans [0, 1]
            assert np.isclose(float(cam.max()), 1, atol=1e-3)
            for k in range(2):
                assert os.path.exists(os.path.join(out, f"{label}-f{k}.png"))
        assert not os.path.exists(os.path.join(out, "3-f2.png"))

    def test_cli_masks_independent_of_batch_composition(self, tmp_path):
        """A clip's saliency must not depend on its batch-mates: per-model
        min-max is taken per clip (reference scalar min/max is over ONE
        clip's stacked frames, image_cam.py:128-129), so --batch_size 1 and
        --batch_size 2 runs produce identical {label}-cam.npy files."""
        import os

        from i2v_tpu.cli import gradcam as cli
        from i2v_tpu.ops import pixel

        rng = np.random.RandomState(1)
        run = tmp_path / "run"
        run.mkdir()
        # second clip has a dominant peak — under whole-batch normalization
        # it would rescale the first clip's per-model contributions
        for label, scale in ((1, 1.0), (2, 0.2)):
            clip01 = (rng.rand(3, 4, 64, 64) * scale).astype(np.float32)
            np.save(run / f"{label}-adv.npy",
                    np.asarray(pixel.normalize(jnp.asarray(clip01),
                                               channel_axis=0)))
        outs = {}
        for bs in (1, 2):
            outs[bs] = cli.main([
                "--used_adv", str(run), "--tiny",
                "--models", "resnet", "alexnet", "--batch_size", str(bs),
                "--out", str(tmp_path / f"cam{bs}")])
        for label in (1, 2):
            a = np.load(os.path.join(outs[1], f"{label}-cam.npy"))
            b = np.load(os.path.join(outs[2], f"{label}-cam.npy"))
            np.testing.assert_array_equal(a, b)

    def test_cli_default_models_include_densenet_and_run(self, tmp_path):
        """The ADVERTISED default invocation (all five reference CAM models,
        densenet included) must run: densenet/vit now accept tap_offset and
        tiny tap keys clamp to the reduced block count."""
        import os

        from i2v_tpu.cli import gradcam as cli
        from i2v_tpu.ops import pixel

        run = tmp_path / "run"
        run.mkdir()
        clip01 = np.random.RandomState(2).rand(3, 2, 64, 64).astype(np.float32)
        np.save(run / "9-adv.npy",
                np.asarray(pixel.normalize(jnp.asarray(clip01),
                                           channel_axis=0)))
        out = cli.main(["--used_adv", str(run), "--tiny",
                        "--batch_size", "1", "--out", str(tmp_path / "cam")])
        cam = np.load(os.path.join(out, "9-cam.npy"))
        assert cam.shape == (2, 64, 64) and np.isfinite(cam).all()


class TestTinyTapClamps:
    def test_tiny_vit_multi_depth_taps_deduped(self):
        from i2v_tpu.models.registry import build_image_model

        module, tap_keys = build_image_model("vit", [2, 3], tiny=True)
        assert len(tap_keys) == len(set(tap_keys))

    def test_tiny_densenet_deep_taps_clamped(self):
        from i2v_tpu.models.registry import build_image_model

        module, tap_keys = build_image_model("densenet", [3, 4], tiny=True)
        n_blocks = len(module.block_config)
        assert all(1 <= t <= n_blocks for t in tap_keys)
        assert len(tap_keys) == len(set(tap_keys))

    def test_library_average_cam_per_clip_mode(self):
        """average_grad_cam(frames_per_clip=T) gives batch-composition-
        independent masks through the shared library function (not just the
        CLI's path)."""
        from i2v_tpu.eval import gradcam as g
        from i2v_tpu.models import get_image_models

        bundles = get_image_models(["resnet"], {"resnet": 2}, tiny=True,
                                   truncate=False, input_hw=32)
        rng = np.random.RandomState(3)
        a = rng.rand(2, 32, 32, 3).astype(np.float32)         # clip A frames
        b = (rng.rand(2, 32, 32, 3) * 0.2).astype(np.float32)  # clip B frames
        both = np.concatenate([a, b])
        cam_both = np.asarray(g.average_grad_cam(bundles, both,
                                                 upsample_to=32,
                                                 frames_per_clip=2))
        cam_a = np.asarray(g.average_grad_cam(bundles, a, upsample_to=32,
                                              frames_per_clip=2))
        np.testing.assert_allclose(cam_both[:2], cam_a, atol=1e-6)
