"""Pretrained torch-checkpoint import (SURVEY.md C9; VERDICT r1 item 7).

torchvision is not installed, so the oracle is a faithful torch.nn
re-implementation of the documented torchvision VideoResNet R(2+1)D layout
(stem 1x7x7->45->3x1x1->64; BasicBlock stages; midplanes formula) built HERE
in the test. We run the torch model forward in eval mode, convert its
state_dict with models.torch_import, and require our flax model to reproduce
the torch logits — end-to-end numerics parity, not just key mapping.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

from fastvideotagging_tpu.models import get_model  # noqa: E402
from fastvideotagging_tpu.models.torch_import import (  # noqa: E402
    convert_r2plus1d_state_dict,
)


def _midplanes(cin, cout):
    return (cin * cout * 3 * 3 * 3) // (cin * 3 * 3 + 3 * cout)


class TorchConv2Plus1D(nn.Sequential):
    def __init__(self, cin, cout, mid, stride=1):
        super().__init__(
            nn.Conv3d(cin, mid, (1, 3, 3), stride=(1, stride, stride),
                      padding=(0, 1, 1), bias=False),
            nn.BatchNorm3d(mid),
            nn.ReLU(inplace=True),
            nn.Conv3d(mid, cout, (3, 1, 1), stride=(stride, 1, 1),
                      padding=(1, 0, 0), bias=False),
        )


class TorchBasicBlock(nn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Sequential(
            TorchConv2Plus1D(cin, planes, _midplanes(cin, planes), stride),
            nn.BatchNorm3d(planes), nn.ReLU(inplace=True))
        self.conv2 = nn.Sequential(
            TorchConv2Plus1D(planes, planes, _midplanes(planes, planes)),
            nn.BatchNorm3d(planes))
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = nn.Sequential(
                nn.Conv3d(cin, planes, 1, stride=(stride, stride, stride),
                          bias=False),
                nn.BatchNorm3d(planes))
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        residual = self.downsample(x) if self.downsample is not None else x
        return self.relu(self.conv2(self.conv1(x)) + residual)


class TorchR2Plus1D(nn.Module):
    """The documented torchvision VideoResNet R(2+1)D-18 layout."""

    def __init__(self, stage_blocks=(2, 2, 2, 2), num_classes=7):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv3d(3, 45, (1, 7, 7), stride=(1, 2, 2), padding=(0, 3, 3),
                      bias=False),
            nn.BatchNorm3d(45), nn.ReLU(inplace=True),
            nn.Conv3d(45, 64, (3, 1, 1), padding=(1, 0, 0), bias=False),
            nn.BatchNorm3d(64), nn.ReLU(inplace=True))
        cin = 64
        for stage, blocks in enumerate(stage_blocks):
            planes = 64 * 2 ** stage
            layer = []
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                layer.append(TorchBasicBlock(cin, planes, stride))
                cin = planes
            setattr(self, f"layer{stage + 1}", nn.Sequential(*layer))
        self.avgpool = nn.AdaptiveAvgPool3d(1)
        self.fc = nn.Linear(cin, num_classes)

    def forward(self, x):
        x = self.stem(x)
        for stage in range(1, 5):
            x = getattr(self, f"layer{stage}")(x)
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


def _randomize_bn_stats(model, gen):
    """Non-trivial running stats so a stats-mapping bug cannot hide."""
    for m in model.modules():
        if isinstance(m, nn.BatchNorm3d):
            m.running_mean.copy_(
                torch.randn(m.running_mean.shape, generator=gen) * 0.1)
            m.running_var.copy_(
                1.0 + torch.rand(m.running_var.shape, generator=gen))


@pytest.fixture(scope="module")
def torch_model_and_input():
    gen = torch.Generator().manual_seed(0)
    with torch.no_grad():
        tm = TorchR2Plus1D(num_classes=7)
        _randomize_bn_stats(tm, gen)
        tm.eval()
        x = torch.randn((2, 3, 4, 32, 32), generator=gen)
        logits = tm(x)
    return tm, x, logits


def test_converted_weights_reproduce_torch_logits(torch_model_and_input):
    tm, xt, torch_logits = torch_model_and_input
    variables = convert_r2plus1d_state_dict(tm.state_dict())
    variables = jax.tree.map(jnp.asarray, variables)

    model = get_model("r2plus1d_18", num_classes=7, dtype=jnp.float32,
                      dropout=0.0)
    x = jnp.asarray(xt.permute(0, 2, 3, 4, 1).numpy())  # NCTHW -> NTHWC
    ours = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables, x))
    np.testing.assert_allclose(ours, torch_logits.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_strict_on_missing_and_extra_keys(torch_model_and_input):
    tm, _, _ = torch_model_and_input
    sd = dict(tm.state_dict())
    sd.pop("stem.0.weight")
    with pytest.raises(KeyError, match="stem.0"):
        convert_r2plus1d_state_dict(sd)

    sd = dict(tm.state_dict())
    sd["layer9.0.conv1.0.0.weight"] = sd["stem.0.weight"]
    with pytest.raises(ValueError, match="unconsumed"):
        convert_r2plus1d_state_dict(sd)


def test_load_pretrained_from_pth(torch_model_and_input, tmp_path):
    from fastvideotagging_tpu.models.zoo import load_pretrained

    tm, xt, torch_logits = torch_model_and_input
    path = tmp_path / "r2plus1d_18.pth"
    torch.save(tm.state_dict(), str(path))

    model, variables = load_pretrained("r2plus1d_18", str(path),
                                       num_classes=7, dtype=jnp.float32,
                                       dropout=0.0)
    variables = jax.tree.map(jnp.asarray, variables)
    x = jnp.asarray(xt.permute(0, 2, 3, 4, 1).numpy())
    ours = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables, x))
    np.testing.assert_allclose(ours, torch_logits.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_load_pretrained_cross_class_finetune(torch_model_and_input,
                                              tmp_path):
    """The canonical pretrained= use: an N-class checkpoint onto an
    M-class dataset. The head is reinitialized, the backbone is kept."""
    from fastvideotagging_tpu.models.zoo import load_pretrained

    tm, _, _ = torch_model_and_input
    path = tmp_path / "r2plus1d_18.pth"
    torch.save(tm.state_dict(), str(path))
    # 7-class checkpoint -> 101-class model head, default reinit_head
    model, variables = load_pretrained("r2plus1d_18", str(path),
                                       num_classes=101, dtype=jnp.float32)
    assert variables["params"]["fc"]["kernel"].shape == (512, 101)
    # backbone weights are the checkpoint's, not a fresh init
    want = np.asarray(tm.stem[0].weight.detach()
                      .permute(2, 3, 4, 1, 0).numpy())
    got = np.asarray(variables["params"]["stem_spatial"]["kernel"])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_load_pretrained_shape_mismatch_raises(torch_model_and_input,
                                               tmp_path):
    from fastvideotagging_tpu.models.zoo import load_pretrained

    tm, _, _ = torch_model_and_input
    path = tmp_path / "r2plus1d_18.pth"
    torch.save(tm.state_dict(), str(path))
    # 7-class checkpoint vs 101-class model head, strict mode
    with pytest.raises(ValueError, match="shape mismatch"):
        load_pretrained("r2plus1d_18", str(path), num_classes=101,
                        reinit_head=False, dtype=jnp.float32)


# ---------------------------------------------------------------------------
# C3D (classic Sports-1M-conversion layout: biased convs, fc6/7/8)
# ---------------------------------------------------------------------------


class TorchC3D(nn.Module):
    """The classic public C3D torch layout (DavideA/c3d-pytorch schema)."""

    def __init__(self, num_classes=7):
        super().__init__()
        c = lambda cin, cout: nn.Conv3d(cin, cout, 3, padding=1)  # noqa: E731
        self.conv1 = c(3, 64)
        self.conv2 = c(64, 128)
        self.conv3a = c(128, 256)
        self.conv3b = c(256, 256)
        self.conv4a = c(256, 512)
        self.conv4b = c(512, 512)
        self.conv5a = c(512, 512)
        self.conv5b = c(512, 512)
        self.pool1 = nn.MaxPool3d((1, 2, 2), (1, 2, 2))
        self.pool = nn.MaxPool3d((2, 2, 2), (2, 2, 2))
        self.pool5 = nn.MaxPool3d((2, 2, 2), (2, 2, 2), padding=(0, 1, 1))
        self.fc6 = nn.Linear(8192, 4096)
        self.fc7 = nn.Linear(4096, 4096)
        self.fc8 = nn.Linear(4096, num_classes)

    def forward(self, x):
        r = torch.relu
        x = self.pool1(r(self.conv1(x)))
        x = self.pool(r(self.conv2(x)))
        x = self.pool(r(self.conv3b(r(self.conv3a(x)))))
        x = self.pool(r(self.conv4b(r(self.conv4a(x)))))
        x = self.pool5(r(self.conv5b(r(self.conv5a(x)))))
        x = x.flatten(1)  # (B, C*T*H*W) — channel-first flatten order
        return self.fc8(r(self.fc7(r(self.fc6(x)))))


def test_c3d_converted_weights_reproduce_torch_logits():
    from fastvideotagging_tpu.models.torch_import import (
        convert_c3d_state_dict,
    )

    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        tm = TorchC3D(num_classes=7)
        tm.eval()
        x = torch.randn((1, 3, 16, 112, 112), generator=gen)
        torch_logits = tm(x)
    variables = jax.tree.map(jnp.asarray,
                             convert_c3d_state_dict(tm.state_dict()))
    model = get_model("c3d", num_classes=7, dtype=jnp.float32, dropout=0.0)
    xj = jnp.asarray(x.permute(0, 2, 3, 4, 1).numpy())
    ours = np.asarray(jax.jit(
        lambda v, xx: model.apply(v, xx, train=False))(variables, xj))
    np.testing.assert_allclose(ours, torch_logits.numpy(),
                               rtol=2e-4, atol=2e-3)


def test_c3d_strict_key_accounting():
    from fastvideotagging_tpu.models.torch_import import (
        convert_c3d_state_dict,
    )

    tm = TorchC3D()
    sd = dict(tm.state_dict())
    sd.pop("conv3a.weight")
    with pytest.raises(KeyError, match="conv3a"):
        convert_c3d_state_dict(sd)
    sd = dict(tm.state_dict())
    sd["extra.weight"] = sd["conv1.weight"]
    with pytest.raises(ValueError, match="unconsumed"):
        convert_c3d_state_dict(sd)


# ---------------------------------------------------------------------------
# P3D (canonical public bottleneck schema: conv1..conv4/bn1..bn4 + downsample)
# ---------------------------------------------------------------------------


class TorchP3DBottleneck(nn.Module):
    def __init__(self, cin, planes, stride, btype):
        super().__init__()
        self.btype = btype
        self.conv1 = nn.Conv3d(cin, planes, 1, stride=(1, stride, stride),
                               bias=False)
        self.bn1 = nn.BatchNorm3d(planes)
        self.conv2 = nn.Conv3d(planes, planes, (1, 3, 3), padding=(0, 1, 1),
                               bias=False)
        self.bn2 = nn.BatchNorm3d(planes)
        self.conv3 = nn.Conv3d(planes, planes, (3, 1, 1), padding=(1, 0, 0),
                               bias=False)
        self.bn3 = nn.BatchNorm3d(planes)
        self.conv4 = nn.Conv3d(planes, planes * 4, 1, bias=False)
        self.bn4 = nn.BatchNorm3d(planes * 4)
        self.downsample = None
        if stride != 1 or cin != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv3d(cin, planes * 4, 1, stride=(1, stride, stride),
                          bias=False),
                nn.BatchNorm3d(planes * 4))

    def forward(self, x):
        r = torch.relu
        residual = x if self.downsample is None else self.downsample(x)
        y = r(self.bn1(self.conv1(x)))
        S = lambda t: r(self.bn2(self.conv2(t)))  # noqa: E731
        T = lambda t: r(self.bn3(self.conv3(t)))  # noqa: E731
        if self.btype == "A":
            y = T(S(y))
        elif self.btype == "B":
            y = S(y) + T(y)
        else:
            ys = S(y)
            y = ys + T(ys)
        y = self.bn4(self.conv4(y))
        return r(y + residual)


class TorchP3D(nn.Module):
    """Canonical public P3D layout, pooling aligned to models/p3d.py."""

    def __init__(self, stage_blocks=(3, 4, 6, 3), num_classes=7):
        super().__init__()
        self.conv1_custom = nn.Conv3d(3, 64, (1, 7, 7), stride=(1, 2, 2),
                                      padding=(0, 3, 3), bias=False)
        self.bn1 = nn.BatchNorm3d(64)
        self.maxpool = nn.MaxPool3d((2, 3, 3), (2, 2, 2), padding=(0, 1, 1))
        cin, idx = 64, 0
        for stage, blocks in enumerate(stage_blocks):
            planes = 64 * 2 ** stage
            layer = []
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                layer.append(
                    TorchP3DBottleneck(cin, planes, stride, "ABC"[idx % 3]))
                idx += 1
                cin = planes * 4
            setattr(self, f"layer{stage + 1}", nn.Sequential(*layer))
        self.fc = nn.Linear(cin, num_classes)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1_custom(x))))
        for stage in range(1, 5):
            x = getattr(self, f"layer{stage}")(x)
        x = x.mean(dim=(2, 3, 4))
        return self.fc(x)


def test_p3d_converted_weights_reproduce_torch_logits():
    from fastvideotagging_tpu.models.torch_import import (
        convert_p3d_state_dict,
    )

    gen = torch.Generator().manual_seed(2)
    with torch.no_grad():
        tm = TorchP3D(num_classes=7)
        _randomize_bn_stats(tm, gen)
        tm.eval()
        x = torch.randn((2, 3, 8, 32, 32), generator=gen)
        torch_logits = tm(x)
    variables = jax.tree.map(jnp.asarray,
                             convert_p3d_state_dict(tm.state_dict()))
    model = get_model("p3d_63", num_classes=7, dtype=jnp.float32,
                      dropout=0.0)
    xj = jnp.asarray(x.permute(0, 2, 3, 4, 1).numpy())
    ours = np.asarray(jax.jit(
        lambda v, xx: model.apply(v, xx, train=False))(variables, xj))
    np.testing.assert_allclose(ours, torch_logits.numpy(),
                               rtol=1e-3, atol=2e-3)


def test_p3d_load_pretrained_from_pth(tmp_path):
    from fastvideotagging_tpu.models.zoo import load_pretrained

    with torch.no_grad():
        tm = TorchP3D(num_classes=9)
        tm.eval()
    path = tmp_path / "p3d_63.pth"
    torch.save(tm.state_dict(), str(path))
    model, variables = load_pretrained("p3d_63", str(path), num_classes=9,
                                       dtype=jnp.float32, dropout=0.0)
    want = np.asarray(tm.conv1_custom.weight.detach()
                      .permute(2, 3, 4, 1, 0).numpy())
    got = np.asarray(variables["params"]["stem_conv"]["kernel"])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# VideoResNet r3d_18 / mc3_18 (the Tran'18 ablation siblings; torchvision
# layout: plain Conv3d blocks, convN.0 conv + convN.1 BN).


class TorchConv3DSimple(nn.Conv3d):
    def __init__(self, cin, cout, stride=1):
        super().__init__(cin, cout, (3, 3, 3), stride=(stride,) * 3,
                         padding=1, bias=False)


class TorchConv3DNoTemporal(nn.Conv3d):
    def __init__(self, cin, cout, stride=1):
        super().__init__(cin, cout, (1, 3, 3), stride=(1, stride, stride),
                         padding=(0, 1, 1), bias=False)


class TorchBlock3D(nn.Module):
    def __init__(self, cin, planes, conv_cls, stride=1):
        super().__init__()
        self.conv1 = nn.Sequential(conv_cls(cin, planes, stride),
                                   nn.BatchNorm3d(planes),
                                   nn.ReLU(inplace=True))
        self.conv2 = nn.Sequential(conv_cls(planes, planes),
                                   nn.BatchNorm3d(planes))
        self.downsample = None
        if stride != 1 or cin != planes:
            ds = ((stride,) * 3 if conv_cls is TorchConv3DSimple
                  else (1, stride, stride))
            self.downsample = nn.Sequential(
                nn.Conv3d(cin, planes, 1, stride=ds, bias=False),
                nn.BatchNorm3d(planes))
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        residual = self.downsample(x) if self.downsample is not None else x
        return self.relu(self.conv2(self.conv1(x)) + residual)


class TorchVideoResNet3D(nn.Module):
    """The documented torchvision r3d_18 / mc3_18 layout."""

    def __init__(self, conv_classes, stage_blocks=(2, 2, 2, 2),
                 num_classes=7):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv3d(3, 64, (3, 7, 7), stride=(1, 2, 2), padding=(1, 3, 3),
                      bias=False),
            nn.BatchNorm3d(64), nn.ReLU(inplace=True))
        cin = 64
        for stage, (blocks, conv_cls) in enumerate(
                zip(stage_blocks, conv_classes)):
            planes = 64 * 2 ** stage
            layer = []
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                layer.append(TorchBlock3D(cin, planes, conv_cls, stride))
                cin = planes
            setattr(self, f"layer{stage + 1}", nn.Sequential(*layer))
        self.avgpool = nn.AdaptiveAvgPool3d(1)
        self.fc = nn.Linear(cin, num_classes)

    def forward(self, x):
        x = self.stem(x)
        for stage in range(1, 5):
            x = getattr(self, f"layer{stage}")(x)
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


_VIDEORESNET_CONVS = {
    "r3d_18": (TorchConv3DSimple,) * 4,
    "mc3_18": (TorchConv3DSimple,) + (TorchConv3DNoTemporal,) * 3,
}


@pytest.mark.parametrize("name", ["r3d_18", "mc3_18"])
def test_videoresnet_import_reproduces_torch_logits(name):
    from fastvideotagging_tpu.models.torch_import import (
        convert_videoresnet_state_dict,
    )

    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        tm = TorchVideoResNet3D(_VIDEORESNET_CONVS[name], num_classes=7)
        _randomize_bn_stats(tm, gen)
        tm.eval()
        xt = torch.randn((2, 3, 4, 32, 32), generator=gen)
        torch_logits = tm(xt)

    variables = convert_videoresnet_state_dict(tm.state_dict())
    variables = jax.tree.map(jnp.asarray, variables)
    model = get_model(name, num_classes=7, dtype=jnp.float32, dropout=0.0)
    # converted tree must match our init structure AND param count exactly
    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4, 32, 32, 3), jnp.float32),
                           train=False))
    assert (jax.tree_util.tree_structure(variables["params"])
            == jax.tree_util.tree_structure(jax.tree.map(
                lambda x: 0, init["params"])))
    n_ours = sum(np.size(p) for p in jax.tree.leaves(variables["params"]))
    n_torch = sum(p.numel() for p in tm.parameters())
    assert n_ours == n_torch

    x = jnp.asarray(xt.permute(0, 2, 3, 4, 1).numpy())  # NCTHW -> NTHWC
    ours = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables, x))
    np.testing.assert_allclose(ours, torch_logits.numpy(),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# S3D (torchvision models.video.s3d layout)
# ---------------------------------------------------------------------------


class TorchCNA(nn.Sequential):
    """Conv3dNormActivation: conv (bias=False) + BatchNorm3d(eps=1e-3) + ReLU."""

    def __init__(self, cin, cout, k=(1, 1, 1), stride=(1, 1, 1),
                 pad=(0, 0, 0)):
        super().__init__(
            nn.Conv3d(cin, cout, k, stride=stride, padding=pad, bias=False),
            nn.BatchNorm3d(cout, eps=1e-3),
            nn.ReLU(inplace=True))


class TorchSepConv(nn.Sequential):
    """TemporalSeparableConv: spatial CNA then temporal CNA."""

    def __init__(self, cin, cout, k, stride, pad):
        super().__init__(
            TorchCNA(cin, cout, (1, k, k), (1, stride, stride), (0, pad, pad)),
            TorchCNA(cout, cout, (k, 1, 1), (stride, 1, 1), (pad, 0, 0)))


class TorchSepInception(nn.Module):
    def __init__(self, cin, c0, c1a, c1b, c2a, c2b, c3):
        super().__init__()
        self.branch0 = TorchCNA(cin, c0)
        self.branch1 = nn.Sequential(
            TorchCNA(cin, c1a), TorchSepConv(c1a, c1b, 3, 1, 1))
        self.branch2 = nn.Sequential(
            TorchCNA(cin, c2a), TorchSepConv(c2a, c2b, 3, 1, 1))
        self.branch3 = nn.Sequential(
            nn.MaxPool3d(3, 1, 1), TorchCNA(cin, c3))

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x),
                          self.branch2(x), self.branch3(x)], dim=1)


class TorchS3D(nn.Module):
    """The documented torchvision S3D layout. The head AvgPool3d window is
    clipped to the feature extent (torchvision's fixed (2, 7, 7) equals
    this at the canonical 224px geometry; fixed would not run at test
    sizes)."""

    def __init__(self, num_classes=7):
        super().__init__()
        self.features = nn.Sequential(
            TorchSepConv(3, 64, 7, 2, 3),
            nn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)),
            TorchCNA(64, 64),
            TorchSepConv(64, 192, 3, 1, 1),
            nn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)),
            TorchSepInception(192, 64, 96, 128, 16, 32, 32),
            TorchSepInception(256, 128, 128, 192, 32, 96, 64),
            nn.MaxPool3d((3, 3, 3), (2, 2, 2), (1, 1, 1)),
            TorchSepInception(480, 192, 96, 208, 16, 48, 64),
            TorchSepInception(512, 160, 112, 224, 24, 64, 64),
            TorchSepInception(512, 128, 128, 256, 24, 64, 64),
            TorchSepInception(512, 112, 144, 288, 32, 64, 64),
            TorchSepInception(528, 256, 160, 320, 32, 128, 128),
            nn.MaxPool3d((2, 2, 2), (2, 2, 2), (0, 0, 0)),
            TorchSepInception(832, 256, 160, 320, 32, 128, 128),
            TorchSepInception(832, 384, 192, 384, 48, 128, 128),
        )
        self.classifier = nn.Sequential(
            nn.Dropout(p=0.0),
            nn.Conv3d(1024, num_classes, 1, bias=True))

    def forward(self, x):
        x = self.features(x)
        window = (min(2, x.shape[2]), x.shape[3], x.shape[4])
        x = torch.nn.functional.avg_pool3d(x, window, stride=1)
        x = self.classifier(x)
        return torch.mean(x, dim=(2, 3, 4))


@pytest.fixture(scope="module")
def s3d_model_and_input():
    gen = torch.Generator().manual_seed(3)
    with torch.no_grad():
        tm = TorchS3D(num_classes=7)
        _randomize_bn_stats(tm, gen)
        tm.eval()
        # T=16 -> T'=2 after the three temporal /2 stages, so the head's
        # temporal window-2 average is exercised (not just skipped).
        xt = torch.randn((1, 3, 16, 64, 64), generator=gen)
        torch_logits = tm(xt)
    return tm, xt, torch_logits


def test_s3d_import_reproduces_torch_logits(s3d_model_and_input):
    from fastvideotagging_tpu.models.torch_import import (
        convert_s3d_state_dict,
    )

    tm, xt, torch_logits = s3d_model_and_input
    variables = convert_s3d_state_dict(tm.state_dict())
    variables = jax.tree.map(jnp.asarray, variables)
    model = get_model("s3d", num_classes=7, dtype=jnp.float32, dropout=0.0)
    x = jnp.asarray(xt.permute(0, 2, 3, 4, 1).numpy())
    ours = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables, x))
    np.testing.assert_allclose(ours, torch_logits.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_s3d_strict_key_accounting(s3d_model_and_input):
    from fastvideotagging_tpu.models.torch_import import (
        convert_s3d_state_dict,
    )

    tm, _, _ = s3d_model_and_input
    sd = dict(tm.state_dict())
    sd.pop("features.5.branch1.1.0.0.weight")
    with pytest.raises(KeyError, match="branch1"):
        convert_s3d_state_dict(sd)

    sd = dict(tm.state_dict())
    sd["features.99.weight"] = sd["features.2.0.weight"]
    with pytest.raises(ValueError, match="unconsumed"):
        convert_s3d_state_dict(sd)


def test_s3d_load_pretrained_cross_class(s3d_model_and_input, tmp_path):
    """Kinetics-checkpoint-onto-N-classes: head reinit, backbone kept."""
    from fastvideotagging_tpu.models.zoo import load_pretrained

    tm, _, _ = s3d_model_and_input
    path = tmp_path / "s3d.pth"
    torch.save(tm.state_dict(), str(path))
    model, variables = load_pretrained("s3d", str(path), num_classes=11,
                                       dtype=jnp.float32, dropout=0.0)
    assert variables["params"]["fc"]["kernel"].shape == (1024, 11)
    # backbone weights are the checkpoint's, not a reinit
    np.testing.assert_allclose(
        np.asarray(variables["params"]["stem"]["spatial"]["kernel"]),
        tm.state_dict()["features.0.0.0.weight"]
        .permute(2, 3, 4, 1, 0).numpy(), rtol=0, atol=0)


# ---------------------------------------------------------------------------
# I3D (pytorch-i3d Unit3D/InceptionModule layout, TF-SAME padding)
# ---------------------------------------------------------------------------


def _tf_same_pad(size, k, s):
    out = -(-size // s)
    pad = max((out - 1) * s + k - size, 0)
    return (pad // 2, pad - pad // 2)


def _same_pad_3d(x, k, s):
    # F.pad order: (Wl, Wr, Hl, Hr, Tl, Tr)
    pt = _tf_same_pad(x.shape[2], k[0], s[0])
    ph = _tf_same_pad(x.shape[3], k[1], s[1])
    pw = _tf_same_pad(x.shape[4], k[2], s[2])
    return (pw[0], pw[1], ph[0], ph[1], pt[0], pt[1])


class TorchUnit3D(nn.Module):
    """pytorch-i3d Unit3D: TF-SAME-padded conv (no bias) + BN(1e-3) + ReLU."""

    def __init__(self, cin, cout, k=(1, 1, 1), stride=(1, 1, 1)):
        super().__init__()
        self._k, self._s = k, stride
        self.conv3d = nn.Conv3d(cin, cout, k, stride=stride, padding=0,
                                bias=False)
        self.bn = nn.BatchNorm3d(cout, eps=1e-3)

    def forward(self, x):
        x = torch.nn.functional.pad(x, _same_pad_3d(x, self._k, self._s))
        return torch.relu(self.bn(self.conv3d(x)))


def _maxpool_same(x, k, s):
    # pytorch-i3d pads with 0; inputs are post-ReLU (>= 0) so this equals
    # -inf padding
    x = torch.nn.functional.pad(x, _same_pad_3d(x, k, s))
    return torch.nn.functional.max_pool3d(x, k, s, padding=0)


class TorchI3DInception(nn.Module):
    def __init__(self, cin, c0, c1a, c1b, c2a, c2b, c3):
        super().__init__()
        self.b0 = TorchUnit3D(cin, c0)
        self.b1a = TorchUnit3D(cin, c1a)
        self.b1b = TorchUnit3D(c1a, c1b, (3, 3, 3))
        self.b2a = TorchUnit3D(cin, c2a)
        self.b2b = TorchUnit3D(c2a, c2b, (3, 3, 3))
        self.b3b = TorchUnit3D(cin, c3)

    def forward(self, x):
        b1 = self.b1b(self.b1a(x))
        b2 = self.b2b(self.b2a(x))
        b3 = self.b3b(_maxpool_same(x, (3, 3, 3), (1, 1, 1)))
        return torch.cat([self.b0(x), b1, b2, b3], dim=1)


class TorchI3D(nn.Module):
    """The pytorch-i3d layout (module/state-dict names match that repo).
    The head AvgPool3d window is clipped to the feature extent like the
    TorchS3D oracle (the repo's fixed (2, 7, 7) equals this at 224px)."""

    def __init__(self, num_classes=7):
        super().__init__()
        self.Conv3d_1a_7x7 = TorchUnit3D(3, 64, (7, 7, 7), (2, 2, 2))
        self.Conv3d_2b_1x1 = TorchUnit3D(64, 64)
        self.Conv3d_2c_3x3 = TorchUnit3D(64, 192, (3, 3, 3))
        self.Mixed_3b = TorchI3DInception(192, 64, 96, 128, 16, 32, 32)
        self.Mixed_3c = TorchI3DInception(256, 128, 128, 192, 32, 96, 64)
        self.Mixed_4b = TorchI3DInception(480, 192, 96, 208, 16, 48, 64)
        self.Mixed_4c = TorchI3DInception(512, 160, 112, 224, 24, 64, 64)
        self.Mixed_4d = TorchI3DInception(512, 128, 128, 256, 24, 64, 64)
        self.Mixed_4e = TorchI3DInception(512, 112, 144, 288, 32, 64, 64)
        self.Mixed_4f = TorchI3DInception(528, 256, 160, 320, 32, 128, 128)
        self.Mixed_5b = TorchI3DInception(832, 256, 160, 320, 32, 128, 128)
        self.Mixed_5c = TorchI3DInception(832, 384, 192, 384, 48, 128, 128)
        self.logits = nn.Module()
        self.logits.conv3d = nn.Conv3d(1024, num_classes, 1, bias=True)

    def forward(self, x):
        x = self.Conv3d_1a_7x7(x)
        x = _maxpool_same(x, (1, 3, 3), (1, 2, 2))
        x = self.Conv3d_2c_3x3(self.Conv3d_2b_1x1(x))
        x = _maxpool_same(x, (1, 3, 3), (1, 2, 2))
        x = self.Mixed_3c(self.Mixed_3b(x))
        x = _maxpool_same(x, (3, 3, 3), (2, 2, 2))
        for name in ("4b", "4c", "4d", "4e", "4f"):
            x = getattr(self, f"Mixed_{name}")(x)
        x = _maxpool_same(x, (2, 2, 2), (2, 2, 2))
        x = self.Mixed_5c(self.Mixed_5b(x))
        window = (min(2, x.shape[2]), x.shape[3], x.shape[4])
        x = torch.nn.functional.avg_pool3d(x, window, stride=1)
        x = self.logits.conv3d(x)
        return torch.mean(x, dim=(2, 3, 4))


@pytest.fixture(scope="module")
def i3d_model_and_input():
    gen = torch.Generator().manual_seed(5)
    with torch.no_grad():
        tm = TorchI3D(num_classes=7)
        _randomize_bn_stats(tm, gen)
        tm.eval()
        # T=16 -> T'=2 (stem /2, two pool /2), exercising the head's
        # temporal window-2 average; 64px input exercises the asymmetric
        # TF-SAME stride-2 pads ((2,3) on even dims for k=7).
        xt = torch.randn((1, 3, 16, 64, 64), generator=gen)
        torch_logits = tm(xt)
    return tm, xt, torch_logits


def test_i3d_import_reproduces_torch_logits(i3d_model_and_input):
    from fastvideotagging_tpu.models.torch_import import (
        convert_i3d_state_dict,
    )

    tm, xt, torch_logits = i3d_model_and_input
    variables = convert_i3d_state_dict(tm.state_dict())
    variables = jax.tree.map(jnp.asarray, variables)
    model = get_model("i3d", num_classes=7, dtype=jnp.float32, dropout=0.0)
    x = jnp.asarray(np.transpose(xt.numpy(), (0, 2, 3, 4, 1)))
    logits = jax.jit(
        lambda v, xx: model.apply(v, xx, train=False))(variables, x)
    np.testing.assert_allclose(np.asarray(logits), torch_logits.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_i3d_strict_key_accounting(i3d_model_and_input):
    from fastvideotagging_tpu.models.torch_import import (
        convert_i3d_state_dict,
    )

    tm, _, _ = i3d_model_and_input
    sd = dict(tm.state_dict())
    missing = dict(sd)
    del missing["Mixed_4d.b2b.conv3d.weight"]
    with pytest.raises(KeyError, match="Mixed_4d.b2b"):
        convert_i3d_state_dict(missing)
    sd["extra.weight"] = sd["Conv3d_1a_7x7.conv3d.weight"]
    with pytest.raises(ValueError, match="unconsumed"):
        convert_i3d_state_dict(sd)
