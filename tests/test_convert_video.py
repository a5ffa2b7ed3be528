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


class TorchNonLocal(tnn.Module):
    """mmaction-lineage non-local block: θ/φ/g 1×1×1 convs (with bias),
    optional (1,2,2) max-pool sub-sampling AFTER the φ/g convs, embedded-
    gaussian softmax attention, out = Sequential(conv bias-free, BN)."""

    def __init__(self, c, sub_sample=True):
        super().__init__()
        inter = c // 2
        self.theta = tnn.Conv3d(c, inter, 1)
        self.phi = tnn.Conv3d(c, inter, 1)
        self.g = tnn.Conv3d(c, inter, 1)
        self.max_pool = tnn.MaxPool3d((1, 2, 2)) if sub_sample else None
        self.W = tnn.Sequential(tnn.Conv3d(inter, c, 1, bias=False),
                                tnn.BatchNorm3d(c))

    def forward(self, x):
        b, _, t, h, w = x.shape
        theta, phi, g = self.theta(x), self.phi(x), self.g(x)
        if self.max_pool is not None:
            phi, g = self.max_pool(phi), self.max_pool(g)
        theta = theta.flatten(2)  # (b, c', n) in T,H,W order
        phi, g = phi.flatten(2), g.flatten(2)
        attn = torch.softmax(theta.transpose(1, 2) @ phi, dim=-1)
        y = (attn @ g.transpose(1, 2)).transpose(1, 2).reshape(b, -1, t, h, w)
        return x + self.W(y)


class TorchNLBottleneck3D(TorchBottleneck3D):
    """Bottleneck with a trailing `nonlocal_block` attribute, as in the
    mmaction/gluoncv block layout the converter's name map expects."""

    def __init__(self, *a, sub_sample=True, **kw):
        super().__init__(*a, **kw)
        self.nonlocal_block = TorchNonLocal(self.conv3.out_channels, sub_sample)

    def forward(self, x):
        return self.nonlocal_block(super().forward(x))


@pytest.mark.parametrize("sub_sample", [True, False])
def test_gluoncv_i3d_nonlocal_converter_parity(sub_sample):
    """NL-block parity (i3d_nl5 family): attention math, φ/g sub-sampling,
    W-conv BN folding, and the W.{0,1} naming candidates of convert_i3d."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "convert_gluoncv",
        os.path.join(os.path.dirname(__file__), "..", "tools", "convert_gluoncv.py"))
    cg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cg)

    tm = TorchMiniI3D().eval()
    # graft an NL block onto stage-2 block 0 (i3d_tiny's nonlocal_pos)
    old = tm.res_layers[1][0]
    nlb = TorchNLBottleneck3D(old.conv1.in_channels,
                              old.conv1.out_channels,
                              spatial_stride=2, inflate=True,
                              downsample=True, sub_sample=sub_sample)
    nlb.load_state_dict(old.state_dict(), strict=False)
    tm.res_layers[1][0] = nlb
    tm.eval()  # the graft arrives in training mode (BNs would use batch stats)
    _randomize_bn(tm, seed=3)
    x01 = np.random.RandomState(4).rand(1, 3, 8, 32, 32).astype(np.float32)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1, 1)
    with torch.no_grad():
        want = tm((torch.from_numpy(x01) - mean) / std).numpy()

    params = cg.convert_i3d(tm.state_dict(), stage_sizes=(1, 1, 1, 1))
    module = I3DResNet(stage_sizes=(1, 1, 1, 1),
                       inflate_freq=((1,), (1,), (1,), (0,)),
                       nonlocal_pos=((), (0,), (), ()),
                       nl_sub_sample=sub_sample,
                       width=8, num_classes=10)
    got, _ = module.apply({"params": params}, jnp.asarray(x01))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)


class TorchSFBottleneck(tnn.Module):
    def __init__(self, cin, feats, out_feats, spatial_stride=1, tk=1,
                 downsample=False):
        super().__init__()
        st = (1, spatial_stride, spatial_stride)
        self.conv1 = tnn.Conv3d(cin, feats, (tk, 1, 1),
                                padding=((tk - 1) // 2, 0, 0), bias=False)
        self.bn1 = tnn.BatchNorm3d(feats)
        self.conv2 = tnn.Conv3d(feats, feats, (1, 3, 3), st, (0, 1, 1), bias=False)
        self.bn2 = tnn.BatchNorm3d(feats)
        self.conv3 = tnn.Conv3d(feats, out_feats, 1, bias=False)
        self.bn3 = tnn.BatchNorm3d(out_feats)
        self.relu = tnn.ReLU(True)
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv3d(cin, out_feats, 1, st, bias=False),
                tnn.BatchNorm3d(out_feats))

    def forward(self, x):
        r = self.downsample(x) if self.downsample is not None else x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        return self.relu(self.bn3(self.conv3(y)) + r)


class TorchMiniSlowFast(tnn.Module):
    """Gluoncv-style naming: slow_conv1/slow_bn1/slow_res{2..5},
    fast_*, lateral_p1/lateral_res{2..4}, fc."""

    def __init__(self, width=8, beta_inv=4, fast_stride=2, slow_stride=8,
                 num_classes=10):
        super().__init__()
        self.fast_stride, self.slow_stride = fast_stride, slow_stride
        alpha = slow_stride // fast_stride
        fw = width // beta_inv
        self.fast_conv1 = tnn.Conv3d(3, fw, (5, 7, 7), (1, 2, 2), (2, 3, 3))
        self.fast_bn1 = tnn.BatchNorm3d(fw)
        self.slow_conv1 = tnn.Conv3d(3, width, (1, 7, 7), (1, 2, 2), (0, 3, 3))
        self.slow_bn1 = tnn.BatchNorm3d(width)
        self.relu = tnn.ReLU(True)
        self.pool = tnn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1))
        self.lateral_p1 = tnn.Conv3d(fw, 2 * fw, (5, 1, 1), (alpha, 1, 1),
                                     (2, 0, 0))
        fast_in, slow_in = fw, width + 2 * fw
        fast_stages, slow_stages, laterals = [], [], []
        for stage in range(4):
            f_feats = (width * 2**stage) // beta_inv
            s_feats = width * 2**stage
            ss = 2 if stage > 0 else 1
            fast_stages.append(tnn.Sequential(TorchSFBottleneck(
                fast_in, f_feats, f_feats * 4, ss, 3, True)))
            slow_stages.append(tnn.Sequential(TorchSFBottleneck(
                slow_in, s_feats, s_feats * 4, ss, 3 if stage in (2, 3) else 1,
                True)))
            fast_in = f_feats * 4
            slow_in = s_feats * 4
            if stage < 3:
                laterals.append(tnn.Conv3d(fast_in, 2 * fast_in, (5, 1, 1),
                                           (alpha, 1, 1), (2, 0, 0)))
                slow_in += 2 * fast_in
        for i in range(4):
            setattr(self, f"fast_res{i+2}", fast_stages[i])
            setattr(self, f"slow_res{i+2}", slow_stages[i])
        for i in range(3):
            setattr(self, f"lateral_res{i+2}", laterals[i])
        self.fc = tnn.Linear(slow_in + fast_in, num_classes)

    def forward(self, x):
        # gluoncv 8x8 forward subsamples its own input per pathway
        fast = self.pool(self.relu(
            self.fast_bn1(self.fast_conv1(x[:, :, ::self.fast_stride]))))
        slow = self.pool(self.relu(
            self.slow_bn1(self.slow_conv1(x[:, :, ::self.slow_stride]))))
        slow = torch.cat([slow, self.relu(self.lateral_p1(fast))], 1)
        for stage in range(4):
            fast = getattr(self, f"fast_res{stage+2}")(fast)
            slow = getattr(self, f"slow_res{stage+2}")(slow)
            if stage < 3:
                lat = self.relu(getattr(self, f"lateral_res{stage+2}")(fast))
                slow = torch.cat([slow, lat], 1)
        pooled = torch.cat([slow.mean((2, 3, 4)), fast.mean((2, 3, 4))], 1)
        return self.fc(pooled)


def test_gluoncv_slowfast_converter_parity():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "convert_gluoncv",
        os.path.join(os.path.dirname(__file__), "..", "tools", "convert_gluoncv.py"))
    cg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cg)

    from i2v_tpu.models.slowfast import SlowFast

    tm = TorchMiniSlowFast().eval()
    _randomize_bn(tm)
    # (conv1s carry biases and Identity bn placeholders here — the
    # converter's _maybe() tolerates missing BN stats)
    sd = tm.state_dict()
    x01 = np.random.RandomState(1).rand(1, 3, 16, 32, 32).astype(np.float32)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1, 1)
    with torch.no_grad():
        want = tm((torch.from_numpy(x01) - mean) / std).numpy()

    params = cg.convert_slowfast(sd, stage_sizes=(1, 1, 1, 1))
    module = SlowFast(stage_sizes=(1, 1, 1, 1), width=8, beta_inv=4,
                      num_classes=10)
    got, _ = module.apply({"params": params}, jnp.asarray(x01))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)


class TorchMiniTPNBackbone(tnn.Module):
    """Gluoncv-style slow-only backbone naming: conv1/bn1, layer{1..4}, fc."""

    def __init__(self, width=8, num_classes=10):
        super().__init__()
        self.conv1 = tnn.Conv3d(3, width, (1, 7, 7), (1, 2, 2), (0, 3, 3),
                                bias=False)
        self.bn1 = tnn.BatchNorm3d(width)
        self.relu = tnn.ReLU(True)
        self.pool = tnn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1))
        cin = width
        for stage in range(4):
            feats = width * 2**stage
            tk = 3 if stage in (2, 3) else 1
            setattr(self, f"layer{stage + 1}", tnn.Sequential(
                TorchSFBottleneck(cin, feats, feats * 4,
                                  2 if stage > 0 else 1, tk, True)))
            cin = feats * 4

    def forward(self, x):
        x = self.pool(self.relu(self.bn1(self.conv1(x))))
        taps = []
        for stage in range(4):
            x = getattr(self, f"layer{stage + 1}")(x)
            taps.append(x)
        return taps


class TorchConvModule(tnn.Module):
    """TPN-repo ConvModule: conv → BN → ReLU."""

    def __init__(self, cin, cout, k, s, p, bias=False, groups=1):
        super().__init__()
        self.conv = tnn.Conv3d(cin, cout, k, s, p, bias=bias, groups=groups)
        self.bn = tnn.BatchNorm3d(cout)
        self.relu = tnn.ReLU(True)

    def forward(self, x):
        return self.relu(self.bn(self.conv(x)))


class TorchTemporalModulation(tnn.Module):
    def __init__(self, cin, cout, scale):
        super().__init__()
        self.conv = tnn.Conv3d(cin, cout, (3, 1, 1), (1, 1, 1), (1, 0, 0),
                               bias=False, groups=32)
        self.pool = tnn.MaxPool3d((scale, 1, 1), (scale, 1, 1), (0, 0, 0),
                                  ceil_mode=True)

    def forward(self, x):
        return self.pool(self.conv(x))


class TorchDownampling(tnn.Module):
    """TPN-repo 'Downampling' (sic): optional-norm/act conv + maxpool."""

    def __init__(self, cin, cout, k=(3, 1, 1), s=(1, 1, 1), p=(1, 0, 0),
                 groups=1, norm=False, activation=False,
                 position="after", scale=(1, 1, 1)):
        super().__init__()
        self.conv = tnn.Conv3d(cin, cout, k, s, p, bias=False, groups=groups)
        self.norm = tnn.BatchNorm3d(cout) if norm else None
        self.relu = tnn.ReLU(True) if activation else None
        self.position = position
        self.pool = tnn.MaxPool3d(scale, scale, (0, 0, 0), ceil_mode=True)

    def forward(self, x):
        if self.position == "before":
            x = self.pool(x)
        x = self.conv(x)
        if self.norm is not None:
            x = self.norm(x)
        if self.relu is not None:
            x = self.relu(x)
        if self.position == "after":
            x = self.pool(x)
        return x


class TorchLevelFusion(tnn.Module):
    def __init__(self, cin, mid, cout):
        super().__init__()
        self.ops = tnn.ModuleList([
            TorchDownampling(c, m, (1, 1, 1), (1, 1, 1), (0, 0, 0), groups=32,
                             norm=True, activation=True, position="before")
            for c, m in zip(cin, mid)])
        self.fusion_conv = tnn.Sequential(
            tnn.Conv3d(sum(mid), cout, 1, 1, 0, bias=False),
            tnn.BatchNorm3d(cout), tnn.ReLU(True))

    def forward(self, inputs):
        out = [op(f) for op, f in zip(self.ops, inputs)]
        return self.fusion_conv(torch.cat(out, 1))


class TorchSpatialModulation(tnn.Module):
    def __init__(self, inplanes, planes):
        super().__init__()
        mods = tnn.ModuleList()
        for dim in inplanes:
            import math

            ds_num = int(math.log2(planes // dim)) if planes > dim else 0
            if ds_num < 1:
                mods.append(tnn.Identity())
            else:
                mods.append(tnn.ModuleList([
                    TorchConvModule(dim * 2**i, dim * 2**(i + 1),
                                    (1, 3, 3), (1, 2, 2), (0, 1, 1))
                    for i in range(ds_num)]))
        self.spatial_modulation = mods

    def forward(self, inputs):
        out = []
        for i, feature in enumerate(inputs):
            if isinstance(self.spatial_modulation[i], tnn.ModuleList):
                y = feature
                for op in self.spatial_modulation[i]:
                    y = op(y)
                out.append(y)
            else:
                out.append(self.spatial_modulation[i](feature))
        return out


class TorchTPNNeck(tnn.Module):
    """The TPN-repo neck verbatim, INCLUDING the forward's list-aliasing:
    `temporal_modulation_outs = outs` shares the list the top-down loop
    mutates, so the bottom-up flow consumes top-down-updated features."""

    def __init__(self, in_channels, out_channels, planes, scales):
        super().__init__()
        self.spatial_modulation = TorchSpatialModulation(in_channels, planes)
        self.temporal_modulation_ops = tnn.ModuleList([
            TorchTemporalModulation(planes, out_channels, s) for s in scales])
        self.downsampling_ops = tnn.ModuleList([
            TorchDownampling(out_channels, out_channels)])
        self.level_fusion_op = TorchLevelFusion(
            [out_channels] * 2, [out_channels] * 2, planes)
        self.level_fusion_op2 = TorchLevelFusion(
            [out_channels] * 2, [out_channels] * 2, planes)
        self.pyramid_fusion_op = tnn.Sequential(
            tnn.Conv3d(planes * 2, planes, 1, 1, 0, bias=False),
            tnn.BatchNorm3d(planes), tnn.ReLU(True))

    def forward(self, inputs):
        outs = self.spatial_modulation(inputs)
        outs = [op(outs[i]) for i, op in enumerate(self.temporal_modulation_ops)]
        temporal_modulation_outs = outs  # aliasing, as in the source
        for i in range(len(outs) - 1, 0, -1):
            outs[i - 1] = outs[i - 1] + outs[i]  # upsample scale (1,1,1)
        topdownouts = self.level_fusion_op2(outs)
        outs = temporal_modulation_outs
        for i in range(len(outs) - 1):
            outs[i + 1] = outs[i + 1] + self.downsampling_ops[i](outs[i])
        outs = self.level_fusion_op(outs)
        return self.pyramid_fusion_op(torch.cat([topdownouts, outs], 1))


class TorchMiniTPNFull(tnn.Module):
    """Backbone + TPN-repo neck + head under gluoncv-style names
    (layer1..4, necks.*, fc)."""

    def __init__(self, width=8, num_classes=10, scales=(2, 2)):
        super().__init__()
        self.backbone = None  # flat attrs below, matching convert_tpn naming
        bb = TorchMiniTPNBackbone(width, num_classes)
        for attr in ("conv1", "bn1", "relu", "pool",
                     "layer1", "layer2", "layer3", "layer4"):
            setattr(self, attr, getattr(bb, attr))
        self.necks = TorchTPNNeck([width * 16, width * 32], width * 16,
                                  width * 32, scales)
        self.fc = tnn.Linear(width * 32, num_classes)

    def forward(self, x):
        x = self.pool(self.relu(self.bn1(self.conv1(x))))
        taps = []
        for stage in range(4):
            x = getattr(self, f"layer{stage + 1}")(x)
            taps.append(x)
        y = self.necks([taps[2], taps[3]])
        return self.fc(y.mean((2, 3, 4))), taps


def test_gluoncv_tpn_converter_parity():
    """Full TPN parity (backbone taps + neck + head logits) vs the torch
    oracle replicating the TPN-repo module graph — validates the neck's
    grouped convs, ceil-mode temporal pooling, dual level fusion, pyramid
    fusion, the forward's list-aliasing, and convert_tpn's neck name map."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "convert_gluoncv",
        os.path.join(os.path.dirname(__file__), "..", "tools", "convert_gluoncv.py"))
    cg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cg)

    from i2v_tpu.models.tpn import TPN

    tm = TorchMiniTPNFull().eval()
    _randomize_bn(tm)
    x01 = np.random.RandomState(2).rand(1, 3, 4, 32, 32).astype(np.float32)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1, 1)
    with torch.no_grad():
        want_logits, want_taps = tm((torch.from_numpy(x01) - mean) / std)

    params = cg.convert_tpn(tm.state_dict(), stage_sizes=(1, 1, 1, 1))
    module = TPN(stage_sizes=(1, 1, 1, 1), width=8, temporal_scales=(2, 2),
                 num_classes=10)
    got_logits, taps = module.apply({"params": params}, jnp.asarray(x01))
    for i in range(4):
        got = np.asarray(taps[f"layer{i + 1}"])  # (B,T,H,W,C)
        want = want_taps[i].permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(got, want, atol=5e-4, err_msg=f"layer{i+1}")
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(),
                               atol=5e-4)
