"""Converter parity tests: torch models with torchvision naming (defined
here in pure torch — torchvision isn't in the image) vs the converted Flax
params, end-to-end output equality incl. BN folding and flatten permutation."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from i2v_tpu.models import convert as cv  # noqa: E402
from i2v_tpu.models.resnet import ResNet  # noqa: E402
from i2v_tpu.models.vgg import VGG16, AlexNet, SqueezeNet11  # noqa: E402


def _flax_apply(module, params, x01):
    return module.apply({"params": params}, jnp.asarray(x01))


def _x01(shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def _norm_torch(x01):
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    return (torch.from_numpy(x01).permute(0, 3, 1, 2) - mean) / std


class TorchAlexNet(tnn.Module):
    """Exact torchvision AlexNet topology + parameter names."""

    def __init__(self, num_classes=1000):
        super().__init__()
        self.features = tnn.Sequential(
            tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(True), tnn.MaxPool2d(3, 2),
            tnn.Conv2d(64, 192, 5, 1, 2), tnn.ReLU(True), tnn.MaxPool2d(3, 2),
            tnn.Conv2d(192, 384, 3, 1, 1), tnn.ReLU(True),
            tnn.Conv2d(384, 256, 3, 1, 1), tnn.ReLU(True),
            tnn.Conv2d(256, 256, 3, 1, 1), tnn.ReLU(True), tnn.MaxPool2d(3, 2),
        )
        self.classifier = tnn.Sequential(
            tnn.Dropout(), tnn.Linear(256 * 6 * 6, 4096), tnn.ReLU(True),
            tnn.Dropout(), tnn.Linear(4096, 4096), tnn.ReLU(True),
            tnn.Linear(4096, num_classes),
        )

    def forward(self, x):
        x = self.features(x)
        return self.classifier(torch.flatten(x, 1))


class TorchFire(tnn.Module):
    def __init__(self, cin, s, e):
        super().__init__()
        self.squeeze = tnn.Conv2d(cin, s, 1)
        self.squeeze_activation = tnn.ReLU(True)
        self.expand1x1 = tnn.Conv2d(s, e, 1)
        self.expand1x1_activation = tnn.ReLU(True)
        self.expand3x3 = tnn.Conv2d(s, e, 3, padding=1)
        self.expand3x3_activation = tnn.ReLU(True)

    def forward(self, x):
        x = self.squeeze_activation(self.squeeze(x))
        return torch.cat([
            self.expand1x1_activation(self.expand1x1(x)),
            self.expand3x3_activation(self.expand3x3(x)),
        ], 1)


class TorchSqueezeNet11(tnn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        self.features = tnn.Sequential(
            tnn.Conv2d(3, 64, 3, 2), tnn.ReLU(True),
            tnn.MaxPool2d(3, 2, ceil_mode=True),
            TorchFire(64, 16, 64), TorchFire(128, 16, 64),
            tnn.MaxPool2d(3, 2, ceil_mode=True),
            TorchFire(128, 32, 128), TorchFire(256, 32, 128),
            tnn.MaxPool2d(3, 2, ceil_mode=True),
            TorchFire(256, 48, 192), TorchFire(384, 48, 192),
            TorchFire(384, 64, 256), TorchFire(512, 64, 256),
        )
        self.classifier = tnn.Sequential(
            tnn.Dropout(), tnn.Conv2d(512, num_classes, 1), tnn.ReLU(True),
            tnn.AdaptiveAvgPool2d((1, 1)),
        )

    def forward(self, x):
        return torch.flatten(self.classifier(self.features(x)), 1)


class TorchBottleneck(tnn.Module):
    def __init__(self, cin, feats, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, feats, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(feats)
        self.conv2 = tnn.Conv2d(feats, feats, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(feats)
        self.conv3 = tnn.Conv2d(feats, feats * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(feats * 4)
        self.relu = tnn.ReLU(True)
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, feats * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(feats * 4),
            )

    def forward(self, x):
        r = self.downsample(x) if self.downsample is not None else x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        return self.relu(self.bn3(self.conv3(y)) + r)


class TorchMiniResNet(tnn.Module):
    """(1,1,1,1)-stage ResNet with exact torchvision naming."""

    def __init__(self, num_classes=1000):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(TorchBottleneck(64, 64, 1, True))
        self.layer2 = tnn.Sequential(TorchBottleneck(256, 128, 2, True))
        self.layer3 = tnn.Sequential(TorchBottleneck(512, 256, 2, True))
        self.layer4 = tnn.Sequential(TorchBottleneck(1024, 512, 2, True))
        self.fc = tnn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(x.mean((2, 3)))


def _randomize_bn(model, seed=0):
    """Non-trivial BN stats so folding is actually exercised."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
            m.weight.data.copy_(torch.rand(m.num_features, generator=g) + 0.5)
            m.bias.data.copy_(torch.randn(m.num_features, generator=g) * 0.2)


class TestConverters:
    def test_alexnet_parity(self):
        tm = TorchAlexNet().eval()
        x01 = _x01((2, 224, 224, 3))
        with torch.no_grad():
            want = tm(_norm_torch(x01)).numpy()
        params = cv.convert_alexnet(tm.state_dict())
        got, _ = _flax_apply(AlexNet(), params, x01)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

    def test_squeezenet_parity(self):
        tm = TorchSqueezeNet11().eval()
        x01 = _x01((1, 224, 224, 3), seed=1)
        with torch.no_grad():
            want = tm(_norm_torch(x01)).numpy()
        params = cv.convert_squeezenet11(tm.state_dict())
        got, taps = _flax_apply(SqueezeNet11(taps=(12,)), params, x01)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)
        # tap = expand3x3 ReLU of features[12]
        with torch.no_grad():
            feat = tm.features[:12](_norm_torch(x01))
            fire12 = tm.features[12]
            e3 = fire12.expand3x3_activation(
                fire12.expand3x3(fire12.squeeze_activation(fire12.squeeze(feat))))
        np.testing.assert_allclose(
            np.asarray(taps[12]), e3.permute(0, 2, 3, 1).numpy(), atol=2e-4)

    def test_mini_resnet_parity_with_bn_folding(self):
        tm = TorchMiniResNet().eval()
        _randomize_bn(tm)
        x01 = _x01((2, 64, 64, 3), seed=2)
        with torch.no_grad():
            want = tm(_norm_torch(x01)).numpy()
        params = cv.convert_resnet(tm.state_dict(), stage_sizes=(1, 1, 1, 1))
        got, _ = _flax_apply(ResNet(stage_sizes=(1, 1, 1, 1)), params, x01)
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)

    def test_save_and_registry_load(self, tmp_path, monkeypatch):
        monkeypatch.setenv("I2V_TPU_CKPTS", str(tmp_path))
        tm = TorchAlexNet().eval()
        path = cv.convert_torchvision("alexnet", tm.state_dict(), str(tmp_path))
        assert path.endswith("alexnet.msgpack")
        from i2v_tpu.models import get_image_models

        bundles = get_image_models(["alexnet"], {"alexnet": 2}, input_hw=224)
        x01 = _x01((1, 224, 224, 3), seed=3)
        _, taps = bundles[0].apply01_taps(jnp.asarray(x01))
        with torch.no_grad():
            want = tm.features[:5](_norm_torch(x01))
        np.testing.assert_allclose(
            np.asarray(taps[0]), want.permute(0, 2, 3, 1).numpy(), atol=2e-4)


@pytest.mark.slow
class TestVGGParity:
    def test_vgg16_parity(self):
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers, cin = [], 3
        for v in cfg:
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers += [tnn.Conv2d(cin, v, 3, padding=1), tnn.ReLU(True)]
                cin = v
        tm = tnn.Module()
        tm.features = tnn.Sequential(*layers)
        tm.classifier = tnn.Sequential(
            tnn.Linear(512 * 7 * 7, 4096), tnn.ReLU(True), tnn.Dropout(),
            tnn.Linear(4096, 4096), tnn.ReLU(True), tnn.Dropout(),
            tnn.Linear(4096, 1000),
        )
        # torchvision classifier indices are 0,3,6 — match via renamed dict
        sd = tm.state_dict()
        x01 = _x01((1, 224, 224, 3), seed=4)
        tm.eval()
        with torch.no_grad():
            feats = tm.features(_norm_torch(x01))
            want = tm.classifier(torch.flatten(feats, 1)).numpy()
        params = cv.convert_vgg16(sd)
        got, _ = _flax_apply(VGG16(), params, x01)
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)


class TorchTimmAttention(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = (self.qkv(x).reshape(B, N, 3, self.heads, C // self.heads)
               .permute(2, 0, 3, 1, 4))
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = ((q @ k.transpose(-2, -1)) * (C // self.heads) ** -0.5).softmax(-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class TorchTimmBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = TorchTimmAttention(dim, heads)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = tnn.Sequential()
        self.mlp.fc1 = tnn.Linear(dim, dim * 4)
        self.mlp.act = tnn.GELU()
        self.mlp.fc2 = tnn.Linear(dim * 4, dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        y = self.mlp.fc2(self.mlp.act(self.mlp.fc1(self.norm2(x))))
        return x + y


class TorchMiniViT(tnn.Module):
    """timm `vit_base_patch16_224` naming at toy size: patch_embed.proj,
    cls_token/pos_embed, blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,
    mlp.fc1,mlp.fc2}, norm, head."""

    def __init__(self, patch=8, dim=32, depth=2, heads=4, num_classes=10,
                 img=16):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, patch, patch)
        n = (img // patch) ** 2
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = tnn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
        self.blocks = tnn.ModuleList(
            [TorchTimmBlock(dim, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.head = tnn.Linear(dim, num_classes)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.head(self.norm(x)[:, 0])


class TestViTParity:
    def test_vit_converter_parity(self):
        """convert_vit_b16 vs a torch oracle with timm naming/semantics
        (q·k scaling, qkv row layout, eps=1e-6 LayerNorms, exact-erf GELU).
        The reference's get_vits (TPAMI_attack.py:88-98) loads this zoo
        entry; normalize=False isolates conversion from the mean/std choice
        (timm ViTs use 0.5/0.5 stats, not ImageNet's)."""
        from i2v_tpu.models.vit import ViT

        torch.manual_seed(0)
        tm = TorchMiniViT().eval()
        with torch.no_grad():
            tm.cls_token.add_(torch.randn_like(tm.cls_token) * 0.1)
        x = np.random.RandomState(0).rand(2, 3, 16, 16).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()

        params = cv.convert_vit_b16(tm.state_dict())
        module = ViT(patch=8, img_size=16, dim=32, depth=2, heads=4,
                     num_classes=10, normalize=False)
        got, taps = module.apply({"params": params},
                                 jnp.asarray(x.transpose(0, 2, 3, 1)))
        assert len(taps) == 2  # per-block taps, ENS-ready
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)
