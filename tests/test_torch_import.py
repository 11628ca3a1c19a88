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
