"""Shared conv/norm building blocks for the video backbones.

All tensors are NTHWC (channels-last — C rides the TPU lane dimension).
Conv3D lowers to ``lax.conv_general_dilated`` with NDHWC/DHWIO dimension
numbers, which XLA maps onto the MXU. The factorized (2+1)D spatial and
temporal convs additionally support a first-party Pallas backend
(ops/conv2plus1d.py) selected via the ``kernels`` attribute — 'xla' is the
always-correct fallback and the parity oracle (SURVEY.md N1, §8.3).

Compute dtype policy: params live in float32; activations/compute run in the
module's ``dtype`` (bfloat16 by default). The MXU accumulates bf16 products
in f32 internally; conv in/out dtypes stay uniform so autodiff transposes
type-check (mixing preferred_element_type with a post-cast breaks the vjp).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

Dtype = Any


def r2plus1d_mid_channels(cin: int, cout: int, kt: int = 3, kd: int = 3) -> int:
    """Mid-channel count M matching the full-3D conv parameter budget.

    M = floor( kt*kd^2*cin*cout / (kd^2*cin + kt*cout) )  [Tran'18 CVPR eq. in
    SURVEY.md C7 — makes param-count a strong architecture checksum].
    """
    return (kt * kd * kd * cin * cout) // (kd * kd * cin + kt * cout)


def mxu_aligned_mid_channels(cin: int, cout: int, kt: int = 3, kd: int = 3) -> int:
    """TPU variant of the mid-channel rule: nearest multiple of 128 (>=128).

    The paper's M values (144, 230, 288, 460, ...) waste up to half of the
    128-wide MXU lane dimension; rounding M to the lane width recovers it at
    roughly neutral parameter count. Used by the `*_tpu` zoo variants.
    """
    m = r2plus1d_mid_channels(cin, cout, kt, kd)
    return max(128, int(round(m / 128)) * 128)


def scaled_ws(kernel: jax.Array, gain: float = 1.7139) -> jax.Array:
    """Scaled weight standardization over the fan-in axes (NF-ResNets,
    Brock et al. 2021): W' = gain * (W - mu) / sqrt(N * var + eps) per output
    channel, N = fan-in, gain = sqrt(2/(1-1/pi)) for ReLU signal propagation.

    The companion of norm='scaleonly': it restores the from-scratch
    trainability that removing the normalization statistics costs (frozen-BN
    from-scratch stalls — tests/test_norm_variants.py), at the price of a
    per-step standardization of the KERNEL only — a tiny params-sized tensor,
    invisible next to the activation passes the scaleonly mode deletes."""
    axes = tuple(range(kernel.ndim - 1))
    fan_in = 1
    for d in kernel.shape[:-1]:
        fan_in *= d
    mu = jnp.mean(kernel, axis=axes, keepdims=True)
    var = jnp.var(kernel, axis=axes, keepdims=True)
    return gain * (kernel - mu) * lax.rsqrt(var * fan_in + 1e-8)


def _triple(v) -> tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    t = tuple(v)
    assert len(t) == 3
    return t


def symmetric_padding(kernel: tuple[int, int, int]):
    """[(k//2, k//2)] per dim — torch/MXNet 'pad=k//2' conv semantics.

    This is the reference-faithful padding (the reference's MXNet substrate
    pads symmetrically), and what public torch checkpoints were trained
    with. Identical to XLA 'SAME' for stride 1 and odd k; for strided convs
    'SAME' pads asymmetrically (lo=total//2), which shifts the sampling grid
    by one pixel/frame relative to torch/MXNet. Output shapes match 'SAME'
    exactly for odd k (floor((in-1)/s)+1 == ceil(in/s)).
    """
    return tuple((k // 2, k // 2) for k in kernel)


class Conv3D(nn.Module):
    """3D convolution on NTHWC input, kernel layout (kt, kh, kw, cin, cout).

    shard_axis: mesh axis name to shard the OUTPUT channel dim over
    (channel/tensor parallelism for the dual-pathway config [B:11]); the
    kernel param carries flax partitioning metadata which
    parallel.mesh.variables_shardings turns into NamedShardings.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1, 1)
    # 'SYM' (default) -> torch/MXNet-faithful symmetric (k//2, k//2) padding;
    # also accepts 'SAME' | 'VALID' | explicit [(lo,hi)]*3.
    padding: Any = "SYM"
    use_bias: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    kernel_init: Any = nn.initializers.he_normal()
    shard_axis: str | None = None
    ws: bool = False  # scaled weight standardization (norm='scaleonly' mode)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kt, kh, kw = _triple(self.kernel_size)
        cin = x.shape[-1]
        init = self.kernel_init
        if self.shard_axis is not None:
            init = nn.with_partitioning(
                init, (None, None, None, None, self.shard_axis)
            )
        kernel = self.param(
            "kernel", init, (kt, kh, kw, cin, self.features),
            self.param_dtype,
        )
        kernel = nn.meta.unbox(kernel)
        if self.ws:
            kernel = scaled_ws(kernel)
        padding = (symmetric_padding((kt, kh, kw))
                   if self.padding == "SYM" else self.padding)
        y = lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=_triple(self.strides),
            padding=padding,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + bias
        return y.astype(self.dtype)


class SpatialConv(nn.Module):
    """1 x k x k conv — the spatial factor of a (2+1)D conv.

    backend='pallas' routes through the first-party Pallas tap-matmul kernel
    (ops/conv2plus1d.py); 'xla' through lax.conv_general_dilated.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = False
    backend: str = "xla"
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    kernel_init: Any = nn.initializers.he_normal()
    ws: bool = False  # scaled weight standardization (norm='scaleonly' mode)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (1, k, k, cin, self.features),
            self.param_dtype,
        )
        if self.ws:
            kernel = scaled_ws(kernel)
        if self.backend == "pallas":
            from fastvideotagging_tpu.ops import conv2plus1d

            y = conv2plus1d.spatial_conv(
                x.astype(self.dtype),
                kernel[0].astype(self.dtype),  # (k, k, cin, cout)
                stride=self.stride,
            )
        else:
            # NOTE: a conv2d-on-(B*T)-reshape form is ~8-10% faster per-op in
            # isolation, but ~2x SLOWER inside the full jitted train step (the
            # reshape disrupts XLA's layout/fusion choices) — keep conv3d.
            y = lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(1, self.stride, self.stride),
                padding=symmetric_padding((1, k, k)),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + bias
        return y.astype(self.dtype)


class TemporalConv(nn.Module):
    """k x 1 x 1 conv — the temporal factor of a (2+1)D conv.

    time_axis: when set (inside shard_map with the clip's T dim sharded over
    that mesh axis), the conv runs as a halo-exchange conv over ICI
    (parallel.temporal.halo_temporal_conv) — the long-clip sequence-parallel
    path (SURVEY.md §6.7). Exactly equal to the unsharded conv.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = False
    backend: str = "xla"
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    kernel_init: Any = nn.initializers.he_normal()
    time_axis: str | None = None
    ws: bool = False  # scaled weight standardization (norm='scaleonly' mode)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (k, 1, 1, cin, self.features),
            self.param_dtype,
        )
        if self.ws:
            kernel = scaled_ws(kernel)
        if self.time_axis is not None:
            from fastvideotagging_tpu.parallel.temporal import (
                halo_temporal_conv,
            )

            y = halo_temporal_conv(
                x.astype(self.dtype),
                kernel[:, 0, 0].astype(self.dtype),
                axis_name=self.time_axis, stride=self.stride,
            )
        elif self.backend == "pallas":
            from fastvideotagging_tpu.ops import conv2plus1d

            y = conv2plus1d.temporal_conv(
                x.astype(self.dtype),
                kernel[:, 0, 0].astype(self.dtype),  # (k, cin, cout)
                stride=self.stride,
            )
        else:
            y = lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(self.stride, 1, 1),
                padding=symmetric_padding((k, 1, 1)),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + bias
        return y.astype(self.dtype)


def _num_groups(channels: int, max_groups: int = 32) -> int:
    """Largest group count <= max_groups dividing `channels` (GroupNorm needs
    an exact division; the paper mid-channels 45/144/230/... are not all
    multiples of 32)."""
    for g in range(min(max_groups, channels), 0, -1):
        if channels % g == 0:
            return g
    return 1


class Norm(nn.Module):
    """Normalization layer selected by ``kind`` (ModelConfig.norm):

    - 'batch'  — BatchNorm over (B, T, H, W), batch stats in train mode,
      f32 stats; with ``axis_name`` set the statistics psum-sync over ICI
      (SyncBN — SURVEY.md N2). Reference-faithful default.
    - 'frozen' — BatchNorm that ALWAYS uses the running averages (learned
      scale/bias still train). Removes the two batch-stats passes per layer
      from the train step (+15% measured on v5e, CLAUDE.md); standard
      frozen-BN fine-tuning semantics. Identical params/batch_stats tree to
      'batch', so checkpoints interchange.
    - 'group'  — GroupNorm (<=32 groups, channel-divisible), batch-size
      independent, no running statistics; train == eval.
    - 'scaleonly' — learned per-channel affine y = x*scale + bias with NO
      normalization statistics anywhere (no fwd mean/var reductions, no
      running buffers, no bwd dmean/dvar passes). Trains from scratch at
      parity via scaled weight standardization + SkipInit (0.975 top-1 on
      the hard benchmark, ACCURACY_HARD_SCALEONLY.json) where 'frozen'
      stalls; train == eval, batch-size independent, no SyncBN traffic.
      Step-time NEUTRAL (SCALEONLY_STEP.json; PERF.md ROUND-4b — the
      affine's dscale/dbias still cost full-size bwd reductions, and the
      deleted stat math was already fused ~free).
    """

    kind: str = "batch"
    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None
    # scaleonly only: initializer for the learned scale. Zero for the final
    # affine of a residual branch ("SkipInit" — the block starts as identity,
    # which is what makes the stats-free net trainable at depth).
    scale_init: Any = nn.initializers.ones

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.kind == "scaleonly":
            c = x.shape[-1]
            scale = self.param("scale", self.scale_init, (c,),
                               jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c,),
                              jnp.float32)
            y = (x.astype(self.dtype) * scale.astype(self.dtype)
                 + bias.astype(self.dtype))
            return y
        if self.kind == "group":
            return nn.GroupNorm(
                num_groups=_num_groups(x.shape[-1]),
                epsilon=self.epsilon,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        if self.kind not in ("batch", "frozen"):
            raise ValueError(f"unknown norm kind {self.kind!r}")
        return nn.BatchNorm(
            use_running_average=(True if self.kind == "frozen"
                                 else self.use_running_average),
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            axis_name=self.axis_name,
        )(x)


# The pre-norm-variant name; kind='batch' is the original behavior.
BatchNorm = Norm


def max_pool_3d(x, window, strides=None, padding="VALID", train=False):
    """Max-pool over (T, H, W) of an NTHWC tensor.

    Routed through ops.maxpool_grad: identical values to nn.max_pool, but
    train-mode pools lower SEPARABLY (chained 1D reduce_windows) so the
    backward runs as 1D select_and_scatters instead of the 3D scan that
    measured 33x its byte floor in the s3d step (s3d +29%, i3d +24.5%
    train clips/s — MAXPOOL_GRAD_AB.json). Eval keeps the single fused 3D
    window (sep measured -32% fwd-only). FVT_MAXPOOL_GRAD/_EVAL override.
    """
    from fastvideotagging_tpu.ops.maxpool_grad import max_pool_nthwc
    strides = strides or window
    return max_pool_nthwc(x, _triple(window), _triple(strides), padding,
                          train=train)


def global_avg_pool_3d(x):
    """Mean over (T, H, W): NTHWC -> NC, accumulated in f32."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3)).astype(x.dtype)
