"""gluoncv video-checkpoint converter parity: a torch mini-I3D with
gluoncv-style parameter names (first_stage.0 / res_layers.{i}.{j}.conv{k} /
bn{k} / downsample.0/1 / fc) converted and compared against the Flax
I3DResNet forward — validates 3-D kernel transposes, BN folding, and the
name maps of tools/convert_gluoncv.py end-to-end."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from i2v_tpu.models.i3d import I3DResNet  # noqa: E402


class TorchBottleneck3D(tnn.Module):
    def __init__(self, cin, feats, spatial_stride=1, inflate=True,
                 downsample=False):
        super().__init__()
        k1 = (3, 1, 1) if inflate else (1, 1, 1)
        p1 = tuple((k - 1) // 2 for k in k1)
        st = (1, spatial_stride, spatial_stride)
        self.conv1 = tnn.Conv3d(cin, feats, k1, padding=p1, bias=False)
        self.bn1 = tnn.BatchNorm3d(feats)
        self.conv2 = tnn.Conv3d(feats, feats, (1, 3, 3), st, (0, 1, 1), bias=False)
        self.bn2 = tnn.BatchNorm3d(feats)
        self.conv3 = tnn.Conv3d(feats, feats * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm3d(feats * 4)
        self.relu = tnn.ReLU(True)
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv3d(cin, feats * 4, 1, st, bias=False),
                tnn.BatchNorm3d(feats * 4),
            )

    def forward(self, x):
        r = self.downsample(x) if self.downsample is not None else x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        return self.relu(self.bn3(self.conv3(y)) + r)


class TorchMiniI3D(tnn.Module):
    """Gluoncv-style naming: first_stage, res_layers.{i}.{j}, fc."""

    def __init__(self, width=8, num_classes=10):
        super().__init__()
        self.first_stage = tnn.Sequential(
            tnn.Conv3d(3, width, (5, 7, 7), (2, 2, 2), (2, 3, 3), bias=False),
            tnn.BatchNorm3d(width),
            tnn.ReLU(True),
            tnn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)),
        )
        inflate = [(True,), (True,), (True,), (False,)]
        layers = []
        cin = width
        for stage in range(4):
            feats = width * 2**stage
            blocks = [TorchBottleneck3D(cin, feats,
                                        spatial_stride=2 if stage > 0 else 1,
                                        inflate=inflate[stage][0],
                                        downsample=True)]
            cin = feats * 4
            layers.append(tnn.Sequential(*blocks))
        self.res_layers = tnn.ModuleList(layers)
        self.pool2 = tnn.MaxPool3d((2, 1, 1), (2, 1, 1))
        self.fc = tnn.Linear(cin, num_classes)

    def forward(self, x):
        x = self.first_stage(x)
        for i, layer in enumerate(self.res_layers):
            x = layer(x)
            if i == 0:
                x = self.pool2(x)
        return self.fc(x.mean((2, 3, 4)))


def _randomize_bn(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm3d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.2)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
            m.weight.data.copy_(torch.rand(m.num_features, generator=g) + 0.5)
            m.bias.data.copy_(torch.randn(m.num_features, generator=g) * 0.1)


def test_gluoncv_i3d_converter_parity():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "convert_gluoncv",
        os.path.join(os.path.dirname(__file__), "..", "tools", "convert_gluoncv.py"))
    cg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cg)

    tm = TorchMiniI3D().eval()
    _randomize_bn(tm)
    x01 = np.random.RandomState(0).rand(1, 3, 8, 32, 32).astype(np.float32)

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1, 1)
    with torch.no_grad():
        want = tm((torch.from_numpy(x01) - mean) / std).numpy()

    params = cg.convert_i3d(tm.state_dict(), stage_sizes=(1, 1, 1, 1))
    module = I3DResNet(stage_sizes=(1, 1, 1, 1),
                       inflate_freq=((1,), (1,), (1,), (0,)),
                       nonlocal_pos=((), (), (), ()),
                       width=8, num_classes=10)
    got, _ = module.apply({"params": params}, jnp.asarray(x01))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)
