"""Pretrained-weight import from public torch checkpoints (SURVEY.md C9
"optional pretrained weight load").

The reference ecosystem's R(2+1)D weights ship as torchvision
``VideoResNet`` state_dicts (r2plus1d_18: stem 1x7x7->45->3x1x1->64, four
stages of BasicBlocks with factorized convs — the layout documented in
torchvision.models.video.resnet). This module converts that layout to this
package's flax variables:

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
                f"torch state_dict is missing {key!r} — not a torchvision "
                f"R(2+1)D layout? ({len(self.sd)} keys present)")
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


_CONVERTERS = {
    "r2plus1d_18": lambda sd: convert_r2plus1d_state_dict(sd, (2, 2, 2, 2)),
    "r2plus1d_34": lambda sd: convert_r2plus1d_state_dict(sd, (3, 4, 6, 3)),
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
