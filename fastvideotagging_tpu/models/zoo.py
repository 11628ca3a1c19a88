"""Model zoo: constructor-by-name registry (SURVEY.md C9; [B:5] "model-zoo
constructors by name").

    net = get_model("r2plus1d_18", num_classes=101)
    params = net.init(rng, jnp.zeros((1, 16, 112, 112, 3)), train=False)

Every constructor accepts ``num_classes``, ``backend`` ('xla' | 'pallas' conv
kernels), ``dtype``, and model-specific kwargs.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn

from fastvideotagging_tpu.models.c3d import C3D
from fastvideotagging_tpu.models.p3d import P3D
from fastvideotagging_tpu.models.r2plus1d import R2Plus1D

_REGISTRY: dict[str, Callable[..., nn.Module]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def list_models() -> list[str]:
    return sorted(_REGISTRY)


def get_model(name: str, num_classes: int = 101, **kwargs) -> nn.Module:
    if name not in _REGISTRY:
        raise ValueError(f"unknown model {name!r}; available: {list_models()}")
    return _REGISTRY[name](num_classes=num_classes, **kwargs)


def model_from_config(m_cfg, **overrides) -> nn.Module:
    """Build the model exactly as a ``ModelConfig`` specifies.

    The single place where config fields become constructor kwargs — in
    particular ``compute_dtype``, which every production call site (fit, eval,
    tagger, serving, CLI) must honor rather than silently running the models'
    default bf16. ``overrides`` win over config fields (e.g. serving pins
    ``backend='xla'`` for export portability).
    """
    import jax.numpy as jnp

    kw = dict(
        num_classes=m_cfg.num_classes,
        backend=m_cfg.kernels,
        dropout=m_cfg.dropout,
        dtype=jnp.dtype(m_cfg.compute_dtype),
        norm=m_cfg.norm,
    )
    # Only forwarded when requested so models without the knob fail loudly
    # (TypeError naming the kwarg) instead of silently ignoring the config.
    if getattr(m_cfg, "remat", "none") != "none":
        kw["remat"] = m_cfg.remat
    kw.update(overrides)
    return get_model(m_cfg.name, **kw)


def load_pretrained(name: str, weights_path: str, num_classes: int = 101,
                    reinit_head: bool = True,
                    **kwargs) -> tuple[nn.Module, dict]:
    """Constructor-with-weights (the reference's ``pretrained=`` path, C9):
    builds the module and loads weights. Accepts both this package's
    weights-only exports (train.checkpoint.export_weights) and public torch
    checkpoints (.pth/.pt — torchvision R(2+1)D state_dict layout, converted
    by models.torch_import). Returns (module, variables).

    ``reinit_head``: when the checkpoint's classifier size differs from
    ``num_classes`` (the canonical fine-tune case — e.g. a Kinetics-400
    checkpoint onto an N-class dataset), replace the ``fc`` head with a
    fresh deterministic init instead of failing; ``False`` restores the
    strict shape check."""
    model = get_model(name, num_classes=num_classes, **kwargs)
    if weights_path.endswith((".pth", ".pt")):
        from fastvideotagging_tpu.models.torch_import import load_torch_variables

        variables = load_torch_variables(name, weights_path)
    else:
        from fastvideotagging_tpu.train.checkpoint import load_weights

        variables = load_weights(weights_path)
    if reinit_head:
        variables = _maybe_reinit_head(model, variables, name)
    _check_variable_shapes(model, variables, name)
    return model, variables


def _maybe_reinit_head(model: nn.Module, variables: dict, name: str,
                       clip_shape=(1, 16, 112, 112, 3)) -> dict:
    """Replace a class-count-mismatched classifier head with a fresh init.

    The head layer is ``fc`` for the resnet-style zoo and ``fc8`` for C3D
    (its fc6/fc7 are class-count-independent hidden layers)."""
    import jax
    import jax.numpy as jnp

    params = variables.get("params", {})
    head_key = next((k for k in ("fc", "fc8") if k in params), None)
    if head_key is None:
        return variables
    head = params[head_key]

    def init_fn():
        return model.init(jax.random.PRNGKey(0),
                          jnp.zeros(clip_shape, jnp.float32), train=False)

    # Shape-only compare first (free); the real init — per-op eager compiles
    # cost seconds on this 1-core box — runs jitted and only on mismatch.
    want = jax.tree.map(lambda a: tuple(a.shape),
                        jax.eval_shape(init_fn)["params"][head_key])
    got = jax.tree.map(lambda a: tuple(a.shape), head)
    if want != got:
        import logging

        logging.getLogger("fvt").info(
            "%s: checkpoint head %s != model head %s — reinitializing %s "
            "for fine-tune", name, got, want, head_key)
        fresh = jax.jit(init_fn)()
        variables = dict(variables)
        variables["params"] = dict(variables["params"])
        variables["params"][head_key] = fresh["params"][head_key]
    return variables


def _check_variable_shapes(model: nn.Module, variables: dict, name: str,
                           clip_shape=(1, 16, 112, 112, 3)) -> None:
    """Converted trees must match the module's own init structure exactly."""
    import jax
    import jax.numpy as jnp

    expected = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros(clip_shape, jnp.float32), train=False))
    exp_flat = dict(jax.tree_util.tree_flatten_with_path(expected)[0])
    got_flat = dict(jax.tree_util.tree_flatten_with_path(variables)[0])
    missing = sorted(set(map(str, exp_flat)) - set(map(str, got_flat)))
    extra = sorted(set(map(str, got_flat)) - set(map(str, exp_flat)))
    if missing or extra:
        raise ValueError(
            f"converted weights do not match {name}: missing={missing[:5]} "
            f"extra={extra[:5]}")
    for path, leaf in exp_flat.items():
        got = got_flat[path]
        if tuple(got.shape) != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch at {jax.tree_util.keystr(path)}: "
                f"checkpoint {tuple(got.shape)} vs model {tuple(leaf.shape)}")


def _require_batch_norm(kw: dict, name: str) -> None:
    """Models without norm-variant support must not silently ignore the
    config — requesting norm='frozen'/'group' on them is an error."""
    norm = kw.pop("norm", "batch")
    if norm != "batch":
        raise ValueError(
            f"{name} supports only norm='batch' (got {norm!r}); norm "
            f"variants are implemented for the r2plus1d family and tiny3d")


@register("tiny3d")
def _tiny3d(num_classes: int, **kw) -> nn.Module:
    """Small debug backbone for integration tests and pipeline smoke runs."""
    from fastvideotagging_tpu.models.tiny3d import Tiny3D

    kw.pop("backend", None)
    kw.pop("dropout", None)
    return Tiny3D(num_classes=num_classes, **kw)


@register("c3d")
def _c3d(num_classes: int, dropout: float = 0.5, **kw) -> nn.Module:
    kw.pop("backend", None)  # C3D uses full 3D convs; no factorized kernels
    _require_batch_norm(kw, "c3d")  # C3D has no norm layers at all (paper)
    return C3D(num_classes=num_classes, dropout=dropout, **kw)


@register("r2plus1d_18")
def _r2plus1d_18(num_classes: int, **kw) -> nn.Module:
    return R2Plus1D(stage_blocks=(2, 2, 2, 2), num_classes=num_classes, **kw)


@register("r2plus1d_34")
def _r2plus1d_34(num_classes: int, **kw) -> nn.Module:
    return R2Plus1D(stage_blocks=(3, 4, 6, 3), num_classes=num_classes, **kw)


@register("r2plus1d_18_tpu")
def _r2plus1d_18_tpu(num_classes: int, **kw) -> nn.Module:
    """MXU-aligned variant: mid-channels rounded to the 128-lane width.

    Same macro-architecture and ~param count as r2plus1d_18, but every
    factorized conv's M (and the stem width) is a multiple of 128, removing
    the MXU lane padding that caps the paper architecture at ~56% lane
    utilization on TPU. Not weight-compatible with r2plus1d_18.
    """
    from fastvideotagging_tpu.models.layers import mxu_aligned_mid_channels

    return R2Plus1D(stage_blocks=(2, 2, 2, 2), num_classes=num_classes,
                    mid_channels_fn=mxu_aligned_mid_channels, stem_mid=128,
                    **kw)


@register("r2plus1d_34_tpu")
def _r2plus1d_34_tpu(num_classes: int, **kw) -> nn.Module:
    from fastvideotagging_tpu.models.layers import mxu_aligned_mid_channels

    return R2Plus1D(stage_blocks=(3, 4, 6, 3), num_classes=num_classes,
                    mid_channels_fn=mxu_aligned_mid_channels, stem_mid=128,
                    **kw)


@register("p3d_63")
def _p3d_63(num_classes: int, **kw) -> nn.Module:
    _require_batch_norm(kw, "p3d_63")
    return P3D(stage_blocks=(3, 4, 6, 3), num_classes=num_classes, **kw)


@register("p3d_131")
def _p3d_131(num_classes: int, **kw) -> nn.Module:
    _require_batch_norm(kw, "p3d_131")
    return P3D(stage_blocks=(3, 4, 23, 3), num_classes=num_classes, **kw)


@register("p3d_199")
def _p3d_199(num_classes: int, **kw) -> nn.Module:
    _require_batch_norm(kw, "p3d_199")
    return P3D(stage_blocks=(3, 8, 36, 3), num_classes=num_classes, **kw)


@register("r3d_18")
def _r3d_18(num_classes: int, **kw) -> nn.Module:
    """Full-3D VideoResNet (Tran'18 ablation sibling of R(2+1)D)."""
    from fastvideotagging_tpu.models.videoresnet import VideoResNet3D

    kw.pop("backend", None)  # full 3x3x3 convs; no factorized kernels
    return VideoResNet3D(stage_blocks=(2, 2, 2, 2),
                         stage_conv_types=("3d",) * 4,
                         num_classes=num_classes, **kw)


@register("mc3_18")
def _mc3_18(num_classes: int, **kw) -> nn.Module:
    """Mixed-conv VideoResNet: 3D stage 1, 1x3x3 stages 2-4 (Tran'18 MC3)."""
    from fastvideotagging_tpu.models.videoresnet import VideoResNet3D

    kw.pop("backend", None)
    return VideoResNet3D(stage_blocks=(2, 2, 2, 2),
                         stage_conv_types=("3d", "no_t", "no_t", "no_t"),
                         num_classes=num_classes, **kw)


@register("s3d")
def _s3d(num_classes: int, **kw) -> nn.Module:
    """Separable-3D Inception (Xie'18; PAPERS.md:7), torchvision layout."""
    from fastvideotagging_tpu.models.s3d import S3D

    return S3D(num_classes=num_classes, **kw)


@register("s3d_g")
def _s3d_g(num_classes: int, **kw) -> nn.Module:
    """S3D-G: S3D with per-channel self-gating on every separable conv."""
    from fastvideotagging_tpu.models.s3d import S3D

    return S3D(num_classes=num_classes, gating=True, **kw)


@register("i3d")
def _i3d(num_classes: int, **kw) -> nn.Module:
    """Inflated 3D Inception, RGB stream (Carreira'17; pytorch-i3d layout)."""
    from fastvideotagging_tpu.models.i3d import I3D

    kw.pop("backend", None)  # full 3x3x3 convs; no factorized kernels
    return I3D(num_classes=num_classes, **kw)


@register("slowfast_r2plus1d")
def _slowfast(num_classes: int, **kw) -> nn.Module:
    """Dual-pathway stretch config [B:11]; kwargs: alpha, beta, shard_axis."""
    from fastvideotagging_tpu.models.slowfast import SlowFastR2Plus1D

    kw.pop("backend", None)  # uses full-3D convs for the sharded GEMMs
    _require_batch_norm(kw, "slowfast_r2plus1d")
    return SlowFastR2Plus1D(num_classes=num_classes, **kw)


@register("slowfast_r2plus1d_tpu")
def _slowfast_tpu(num_classes: int, **kw) -> nn.Module:
    """MXU-aligned SlowFast: time-to-channel packed fast pathway.

    The faithful fast pathway's C=8..64 convs leave 50-94% of the MXU's
    128 result lanes idle (worst perf row in BENCH_r03, 0.29 of conv
    roofline); packing alpha frames into channels runs the same pathway
    at 4x the lane occupancy and makes the laterals stride-free. Same
    macro-topology; not weight-compatible (the r2plus1d `_tpu`
    precedent). See models/slowfast.py docstring + PERF.md round 4."""
    from fastvideotagging_tpu.models.slowfast import SlowFastR2Plus1D

    kw.pop("backend", None)
    _require_batch_norm(kw, "slowfast_r2plus1d_tpu")
    return SlowFastR2Plus1D(num_classes=num_classes, pack_fast=True, **kw)
