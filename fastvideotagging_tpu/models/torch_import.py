"""Pretrained-weight import from public torch checkpoints (SURVEY.md C9
"optional pretrained weight load").

Covered layouts (round 3 — VERDICT r2 item 7):

* R(2+1)D-18/34 — torchvision ``VideoResNet`` state_dicts (stem
  1x7x7->45->3x1x1->64, BasicBlock stages; the layout documented in
  torchvision.models.video.resnet);
* VideoResNet r3d_18 / mc3_18 — same torchvision family, plain-Conv3d
  blocks (``convN.0`` conv + ``convN.1`` BN) -> models/videoresnet.py.
* C3D — the classic Sports-1M-conversion layout (biased conv1..conv5b +
  fc6/fc7/fc8), incl. the channel-first->channels-last fc6 permutation;
* P3D-63/131/199 — the canonical public P3D PyTorch bottleneck schema
  (conv1..conv4/bn1..bn4 per block + downsample, stem conv1_custom/bn1).
* S3D — torchvision ``models.video.s3d`` (features Sequential of
  TemporalSeparableConv / Conv3dNormActivation / SepInceptionBlock3D;
  1x1x1-conv classifier, which commutes with the head pooling and maps
  onto our Dense head exactly) -> models/s3d.py.
* I3D — the canonical pytorch-i3d port of the DeepMind "Quo Vadis"
  checkpoint (Unit3D/InceptionModule layout, TF-SAME padding) ->
  models/i3d.py.

Each converts the torch layout to this package's flax variables:

  torch (cout, cin, kt, kh, kw) conv weights -> (kt, kh, kw, cin, cout)
  BatchNorm weight/bias/running_mean/running_var -> scale/bias + mean/var
  fc.weight (K, 512) -> kernel (512, K)

Numerics are exact (pure transposes): the models in this package use
symmetric (k//2, k//2) conv padding — the same semantics torch checkpoints
were trained with — so a converted model reproduces the torch forward pass
bit-faithfully up to dtype.

The converter is strict: unknown or missing keys raise, so a layout drift
fails loudly instead of silently producing a half-initialized model.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor without importing torch here
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _set(tree: dict, path: Sequence[str], value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


class _StateDict:
    """Strict accessor: every key must be consumed exactly once."""

    def __init__(self, sd: Mapping[str, object]):
        self.sd = {k: v for k, v in sd.items()
                   if not k.endswith("num_batches_tracked")}
        self.used: set[str] = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(
                f"torch state_dict is missing {key!r} — wrong layout for "
                f"this converter? ({len(self.sd)} keys present)")
        self.used.add(key)
        return _np(self.sd[key])

    def finish(self) -> None:
        unused = sorted(set(self.sd) - self.used)
        if unused:
            raise ValueError(
                f"{len(unused)} unconsumed torch keys (wrong depth/layout?): "
                f"{unused[:8]}{'...' if len(unused) > 8 else ''}")


def _conv(sd: _StateDict, key: str) -> np.ndarray:
    # torch (cout, cin, kt, kh, kw) -> flax (kt, kh, kw, cin, cout)
    return np.transpose(sd.take(key + ".weight"), (2, 3, 4, 1, 0))


def _bn(sd: _StateDict, key: str, params: dict, stats: dict,
        path: Sequence[str]) -> None:
    bn_path = tuple(path) + ("BatchNorm_0",)
    _set(params, bn_path + ("scale",), sd.take(key + ".weight"))
    _set(params, bn_path + ("bias",), sd.take(key + ".bias"))
    _set(stats, bn_path + ("mean",), sd.take(key + ".running_mean"))
    _set(stats, bn_path + ("var",), sd.take(key + ".running_var"))


def convert_r2plus1d_state_dict(
    state_dict: Mapping[str, object],
    stage_blocks: Sequence[int] = (2, 2, 2, 2),
) -> dict:
    """torchvision VideoResNet-R(2+1)D state_dict -> flax variables.

    Returns {'params': ..., 'batch_stats': ...} matching
    models.r2plus1d.R2Plus1D(stage_blocks) exactly (shape-checked by the
    caller via zoo.load_pretrained / tests).
    """
    sd = _StateDict(state_dict)
    params: dict = {}
    stats: dict = {}

    _set(params, ("stem_spatial", "kernel"), _conv(sd, "stem.0"))
    _bn(sd, "stem.1", params, stats, ("stem_bn1",))
    _set(params, ("stem_temporal", "kernel"), _conv(sd, "stem.3"))
    _bn(sd, "stem.4", params, stats, ("stem_bn2",))

    for stage, num_blocks in enumerate(stage_blocks):
        for block in range(num_blocks):
            t = f"layer{stage + 1}.{block}"       # torch prefix
            f = f"stage{stage + 1}_block{block}"  # flax prefix
            for conv in ("conv1", "conv2"):
                _set(params, (f, conv, "spatial", "kernel"),
                     _conv(sd, f"{t}.{conv}.0.0"))
                _bn(sd, f"{t}.{conv}.0.1", params, stats, (f, conv, "bn_mid"))
                _set(params, (f, conv, "temporal", "kernel"),
                     _conv(sd, f"{t}.{conv}.0.3"))
            _bn(sd, f"{t}.conv1.1", params, stats, (f, "bn1"))
            _bn(sd, f"{t}.conv2.1", params, stats, (f, "bn2"))
            if f"{t}.downsample.0.weight" in sd.sd:
                _set(params, (f, "downsample", "kernel"),
                     _conv(sd, f"{t}.downsample.0"))
                _bn(sd, f"{t}.downsample.1", params, stats, (f, "bn_down"))

    _set(params, ("fc", "kernel"), sd.take("fc.weight").T)
    _set(params, ("fc", "bias"), sd.take("fc.bias"))
    sd.finish()
    return {"params": params, "batch_stats": stats}


def convert_c3d_state_dict(state_dict: Mapping[str, object]) -> dict:
    """Classic C3D torch layout -> flax variables (models/c3d.py).

    The public C3D checkpoints (Sports-1M conversions circulated as
    ``c3d-pretrained.pth``; DavideA/c3d-pytorch schema) use biased Conv3d
    modules named conv1/conv2/conv3a..conv5b and Linear fc6/fc7/fc8 — the
    exact module names this package's C3D uses, so the mapping is 1:1.

    One layout subtlety: torch flattens pool5 channel-first (C, T, H, W)
    while the NTHWC model flattens (T, H, W, C); fc6's input dimension is
    permuted accordingly (canonical pool5 geometry 512x1x4x4 at the paper's
    16x112x112 input), making the converted forward numerically exact.
    """
    sd = _StateDict(state_dict)
    params: dict = {}
    for name in ("conv1", "conv2", "conv3a", "conv3b", "conv4a", "conv4b",
                 "conv5a", "conv5b"):
        _set(params, (name, "kernel"), _conv(sd, name))
        _set(params, (name, "bias"), sd.take(name + ".bias"))

    w6 = sd.take("fc6.weight")  # (4096, C*T*H*W), torch flatten order
    if w6.shape[1] % 512:
        raise ValueError(
            f"fc6 input dim {w6.shape[1]} is not a multiple of C3D's 512 "
            f"pool5 channels — not the classic C3D layout")
    # canonical pool5 output is (512, 1, 4, 4); tolerate other spatial
    # extents as long as they factor as (1, s, s)
    s = int(round((w6.shape[1] // 512) ** 0.5))
    if 512 * s * s != w6.shape[1]:
        raise ValueError(f"cannot factor fc6 input dim {w6.shape[1]} as "
                         f"512*s*s")
    w6 = (w6.reshape(-1, 512, 1, s, s)           # (4096, C, T, H, W)
          .transpose(0, 2, 3, 4, 1)              # (4096, T, H, W, C)
          .reshape(w6.shape[0], -1))
    _set(params, ("fc6", "kernel"), w6.T)
    _set(params, ("fc6", "bias"), sd.take("fc6.bias"))
    _set(params, ("fc7", "kernel"), sd.take("fc7.weight").T)
    _set(params, ("fc7", "bias"), sd.take("fc7.bias"))
    _set(params, ("fc8", "kernel"), sd.take("fc8.weight").T)
    _set(params, ("fc8", "bias"), sd.take("fc8.bias"))
    sd.finish()
    return {"params": params}


def convert_p3d_state_dict(
    state_dict: Mapping[str, object],
    stage_blocks: Sequence[int] = (3, 4, 6, 3),
) -> dict:
    """P3D torch layout -> flax variables (models/p3d.py).

    Key schema of the canonical public P3D PyTorch implementation
    (qijiezhao/pseudo-3d-pytorch): stem ``conv1_custom``/``bn1``; stages
    ``layer{1..4}.{i}`` with bottleneck members ``conv1``/``bn1`` (1x1x1
    reduce), ``conv2``/``bn2`` (1x3x3 spatial S), ``conv3``/``bn3``
    (3x1x1 temporal T), ``conv4``/``bn4`` (1x1x1 expand),
    ``downsample.0``/``downsample.1``; head ``fc``. The A->B->C block
    cycle is control flow, not weights, so one mapping covers all three
    block types.
    """
    sd = _StateDict(state_dict)
    params: dict = {}
    stats: dict = {}

    _set(params, ("stem_conv", "kernel"), _conv(sd, "conv1_custom"))
    _bn(sd, "bn1", params, stats, ("stem_bn",))

    members = (("conv1", "bn1", "reduce", "bn_reduce"),
               ("conv2", "bn2", "spatial", "bn_s"),
               ("conv3", "bn3", "temporal", "bn_t"),
               ("conv4", "bn4", "expand", "bn_expand"))
    for stage, num_blocks in enumerate(stage_blocks):
        for block in range(num_blocks):
            t = f"layer{stage + 1}.{block}"
            f = f"stage{stage + 1}_block{block}"
            for t_conv, t_bn, f_conv, f_bn in members:
                _set(params, (f, f_conv, "kernel"),
                     _conv(sd, f"{t}.{t_conv}"))
                _bn(sd, f"{t}.{t_bn}", params, stats, (f, f_bn))
            if f"{t}.downsample.0.weight" in sd.sd:
                _set(params, (f, "downsample", "kernel"),
                     _conv(sd, f"{t}.downsample.0"))
                _bn(sd, f"{t}.downsample.1", params, stats, (f, "bn_down"))

    _set(params, ("fc", "kernel"), sd.take("fc.weight").T)
    _set(params, ("fc", "bias"), sd.take("fc.bias"))
    sd.finish()
    return {"params": params, "batch_stats": stats}


def convert_videoresnet_state_dict(
    state_dict: Mapping[str, object],
    stage_blocks: Sequence[int] = (2, 2, 2, 2),
) -> dict:
    """torchvision VideoResNet r3d_18/mc3_18 state_dict -> flax variables
    (models/videoresnet.py). Unlike the R(2+1)D variant, conv1/conv2 are
    plain Conv3d modules (``convN.0`` conv + ``convN.1`` BN) — the same
    mapping covers both r3d (3x3x3) and mc3 (1x3x3 in stages 2-4): the
    conv type only changes kernel SHAPES, which the caller's structure
    check pins."""
    sd = _StateDict(state_dict)
    params: dict = {}
    stats: dict = {}

    _set(params, ("stem_conv", "kernel"), _conv(sd, "stem.0"))
    _bn(sd, "stem.1", params, stats, ("stem_bn",))

    for stage, num_blocks in enumerate(stage_blocks):
        for block in range(num_blocks):
            t = f"layer{stage + 1}.{block}"
            f = f"stage{stage + 1}_block{block}"
            for conv, bn in (("conv1", "bn1"), ("conv2", "bn2")):
                _set(params, (f, conv, "kernel"), _conv(sd, f"{t}.{conv}.0"))
                _bn(sd, f"{t}.{conv}.1", params, stats, (f, bn))
            if f"{t}.downsample.0.weight" in sd.sd:
                _set(params, (f, "downsample", "kernel"),
                     _conv(sd, f"{t}.downsample.0"))
                _bn(sd, f"{t}.downsample.1", params, stats, (f, "bn_down"))

    _set(params, ("fc", "kernel"), sd.take("fc.weight").T)
    _set(params, ("fc", "bias"), sd.take("fc.bias"))
    sd.finish()
    return {"params": params, "batch_stats": stats}


def convert_s3d_state_dict(state_dict: Mapping[str, object]) -> dict:
    """torchvision ``models.video.s3d`` state_dict -> flax variables
    (models/s3d.py, ``gating=False``).

    Layout (documented in the torchvision source): ``features`` is a
    Sequential of TemporalSeparableConv / Conv3dNormActivation /
    SepInceptionBlock3D modules at fixed indices; every conv+BN pair
    appears as ``<prefix>.0.weight`` + ``<prefix>.1.{weight,bias,
    running_mean,running_var}``. The classifier is a biased 1x1x1 Conv3d
    (``classifier.1``) which, being linear and position-independent,
    commutes with the head pooling — it maps exactly onto our Dense ``fc``
    (see models/s3d.py head note).
    """
    sd = _StateDict(state_dict)
    params: dict = {}
    stats: dict = {}

    def cna(t_prefix: str, f_conv, f_bn) -> None:
        # Conv3dNormActivation: <t>.0 conv + <t>.1 BN
        _set(params, tuple(f_conv) + ("kernel",), _conv(sd, t_prefix + ".0"))
        _bn(sd, t_prefix + ".1", params, stats, f_bn)

    def sep(t_prefix: str, f_prefix: tuple) -> None:
        # TemporalSeparableConv: <t>.0 spatial CNA + <t>.1 temporal CNA
        cna(t_prefix + ".0", f_prefix + ("spatial",), f_prefix + ("bn_s",))
        cna(t_prefix + ".1", f_prefix + ("temporal",), f_prefix + ("bn_t",))

    sep("features.0", ("stem",))
    cna("features.2", ("conv2",), ("conv2_bn",))
    sep("features.3", ("conv3",))

    blocks = {"mixed3b": 5, "mixed3c": 6, "mixed4b": 8, "mixed4c": 9,
              "mixed4d": 10, "mixed4e": 11, "mixed4f": 12, "mixed5b": 14,
              "mixed5c": 15}
    for name, idx in blocks.items():
        t = f"features.{idx}"
        cna(f"{t}.branch0", (name, "b0"), (name, "b0_bn"))
        cna(f"{t}.branch1.0", (name, "b1_reduce"), (name, "b1_bn"))
        sep(f"{t}.branch1.1", (name, "b1_sep"))
        cna(f"{t}.branch2.0", (name, "b2_reduce"), (name, "b2_bn"))
        sep(f"{t}.branch2.1", (name, "b2_sep"))
        cna(f"{t}.branch3.1", (name, "b3_conv"), (name, "b3_bn"))

    w = sd.take("classifier.1.weight")  # (K, 1024, 1, 1, 1)
    _set(params, ("fc", "kernel"), w.reshape(w.shape[0], w.shape[1]).T)
    _set(params, ("fc", "bias"), sd.take("classifier.1.bias"))
    sd.finish()
    return {"params": params, "batch_stats": stats}


def convert_i3d_state_dict(state_dict: Mapping[str, object]) -> dict:
    """pytorch-i3d (the canonical DeepMind-checkpoint port) state_dict ->
    flax variables (models/i3d.py).

    Layout (documented in that repo): Unit3D modules named
    ``Conv3d_1a_7x7`` / ``Conv3d_2b_1x1`` / ``Conv3d_2c_3x3``, nine
    ``Mixed_Xx`` InceptionModules with branch units b0/b1a/b1b/b2a/b2b/b3b,
    each holding ``<name>.conv3d.weight`` + ``<name>.bn.{weight,bias,
    running_mean,running_var}``; the classifier is a biased 1x1x1
    ``logits.conv3d`` which (linear, position-independent) commutes with
    the head pooling onto our Dense ``fc`` (models/i3d.py head note).
    """
    sd = _StateDict(state_dict)
    params: dict = {}
    stats: dict = {}

    def unit(t_prefix: str, f_path: tuple) -> None:
        _set(params, f_path + ("conv", "kernel"),
             np.transpose(sd.take(t_prefix + ".conv3d.weight"),
                          (2, 3, 4, 1, 0)))
        _bn(sd, t_prefix + ".bn", params, stats, f_path + ("bn",))

    unit("Conv3d_1a_7x7", ("conv1",))
    unit("Conv3d_2b_1x1", ("conv2",))
    unit("Conv3d_2c_3x3", ("conv3",))
    branches = {"b0": "b0", "b1a": "b1_reduce", "b1b": "b1_conv",
                "b2a": "b2_reduce", "b2b": "b2_conv", "b3b": "b3_conv"}
    for name in ("3b", "3c", "4b", "4c", "4d", "4e", "4f", "5b", "5c"):
        for t_branch, f_branch in branches.items():
            unit(f"Mixed_{name}.{t_branch}", (f"mixed{name}", f_branch))

    w = sd.take("logits.conv3d.weight")  # (K, 1024, 1, 1, 1)
    _set(params, ("fc", "kernel"), w.reshape(w.shape[0], w.shape[1]).T)
    _set(params, ("fc", "bias"), sd.take("logits.conv3d.bias"))
    sd.finish()
    return {"params": params, "batch_stats": stats}


_CONVERTERS = {
    "r2plus1d_18": lambda sd: convert_r2plus1d_state_dict(sd, (2, 2, 2, 2)),
    "r2plus1d_34": lambda sd: convert_r2plus1d_state_dict(sd, (3, 4, 6, 3)),
    "c3d": convert_c3d_state_dict,
    "p3d_63": lambda sd: convert_p3d_state_dict(sd, (3, 4, 6, 3)),
    "p3d_131": lambda sd: convert_p3d_state_dict(sd, (3, 4, 23, 3)),
    "p3d_199": lambda sd: convert_p3d_state_dict(sd, (3, 8, 36, 3)),
    "r3d_18": lambda sd: convert_videoresnet_state_dict(sd, (2, 2, 2, 2)),
    "mc3_18": lambda sd: convert_videoresnet_state_dict(sd, (2, 2, 2, 2)),
    "s3d": convert_s3d_state_dict,
    "i3d": convert_i3d_state_dict,
}


def _unwrap_checkpoint(obj) -> Mapping[str, object]:
    """Accept raw state_dicts and the common {'state_dict': ...} wrappers."""
    if not isinstance(obj, Mapping):
        raise TypeError(f"expected a state_dict mapping, got {type(obj)}")
    for key in ("state_dict", "model", "model_state"):
        inner = obj.get(key)
        if isinstance(inner, Mapping) and any(
                k.endswith(".weight") for k in inner):
            return inner
    return obj


def load_torch_variables(name: str, weights_path: str) -> dict:
    """Load a .pth/.pt checkpoint from disk and convert it for model `name`."""
    if name not in _CONVERTERS:
        raise ValueError(
            f"no torch-weight converter for {name!r}; available: "
            f"{sorted(_CONVERTERS)}")
    import torch

    obj = torch.load(weights_path, map_location="cpu", weights_only=True)
    return _CONVERTERS[name](_unwrap_checkpoint(obj))
