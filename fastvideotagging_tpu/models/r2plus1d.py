"""R(2+1)D backbone (Tran et al. CVPR'18 "A Closer Look at Spatiotemporal
Convolutions"; SURVEY.md C7).

ResNet-{18,34} layout where every 3x3x3 conv is factorized into a spatial
1x3x3 conv (with M mid-channels) + BN + ReLU + temporal 3x1x1 conv, with
M = floor(t*d^2*Nin*Nout / (d^2*Nin + t*Nout)) chosen to match the full-3D
parameter count. Stem: 1x7x7 s(1,2,2) -> 45 mid-channels -> 3x1x1 -> 64
(the paper's fixed stem width). Stages 64/128/256/512; both temporal and
spatial stride 2 at stage entry, applied inside the respective factor.
Head: global average pool + FC.

This is the flagship model of the rebuild ([B:8] config, the bench target).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from fastvideotagging_tpu.models.layers import (
    BatchNorm,
    Conv3D,
    SpatialConv,
    TemporalConv,
    global_avg_pool_3d,
    mxu_aligned_mid_channels,
    r2plus1d_mid_channels,
)


def remat_policy(name: str):
    """Activation-rematerialization policies for the residual blocks
    (ModelConfig.remat; measured head-to-head in benchmarks/remat_step.py,
    REMAT_STEP.json — the train step is byte-bound ~2:1 on v5e, so trading
    recompute FLOPs on the idle MXU for activation HBM round-trips is the
    one program-level lever left after the per-fusion closure of round 4c).

    - 'full': save only block inputs; backward recomputes each block's whole
      forward (jax.checkpoint's default nothing-saveable policy).
    - 'dots': save dot_general/conv outputs, recompute elementwise/norm math
      (jax.checkpoint_policies.dots_saveable).
    - 'mid':  save everything EXCEPT the (2+1)D mid activation (the relu'd
      spatial-conv output, named 'c2p1d_mid' below) — backward re-runs just
      the spatial conv, the exact trade XLA itself makes in eval programs
      (EVAL_BARRIER_AB.json: recompute beat materializing the mid).
      CAVEAT (measured): save_anything_except_these_names FORCE-saves every
      other intermediate — including the pred relu masks XLA normally
      rematerializes (392 MB each at stage 1) — and OOMs the faithful model
      at B=32 on a 16 GB v5e. Kept for small-batch use; prefer 'conv'.
    - 'conv': save ONLY the temporal conv outputs (named 'c2p1d_out') plus
      the block boundaries jax.checkpoint always keeps; the mid activation
      and all norm/relu elementwise are recomputed in backward from those.
      The surgical "don't round-trip the mid through HBM" policy.
    """
    cp = jax.checkpoint_policies
    if name == "full":
        return None
    if name == "dots":
        return cp.dots_saveable
    if name == "mid":
        return cp.save_anything_except_these_names("c2p1d_mid")
    if name == "conv":
        return cp.save_only_these_names("c2p1d_out")
    raise ValueError(
        f"unknown remat policy {name!r}; expected none|full|dots|mid|conv")


class Conv2Plus1D(nn.Module):
    """Factorized spatiotemporal conv: spatial(1xkxk) -> BN -> ReLU -> temporal(kx1x1)."""

    features: int
    mid_features: int
    spatial_stride: int = 1
    temporal_stride: int = 1
    backend: str = "xla"
    dtype: jnp.dtype = jnp.bfloat16
    bn_axis_name: str | None = None
    norm: str = "batch"
    time_axis: str | None = None  # long-clip sequence parallelism (eval)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ws = self.norm == "scaleonly"  # stats-free mode standardizes kernels
        x = SpatialConv(self.mid_features, 3, stride=self.spatial_stride,
                        backend=self.backend, dtype=self.dtype, ws=ws,
                        name="spatial")(x)
        x = BatchNorm(kind=self.norm, use_running_average=not train,
                      dtype=self.dtype, axis_name=self.bn_axis_name,
                      name="bn_mid")(x)
        x = nn.relu(x)
        # Names the mid activation for the 'mid' remat policy (remat_policy
        # above): under nn.remat(..., save_anything_except_these_names(
        # 'c2p1d_mid')) the backward recomputes the spatial conv instead of
        # round-tripping this tensor through HBM. Identity everywhere else.
        x = checkpoint_name(x, "c2p1d_mid")
        # Eval-only programs (no bwd consumers of the mid activation) let XLA
        # fuse the whole spatial conv + affine + relu INTO the temporal conv
        # as an input fusion, recomputing the mid tensor per temporal tile.
        # An optimization_barrier here splits that fusion — measured a step-
        # level NEGATIVE both ways (faithful +1.06 ms, _tpu -0.3 ms noise;
        # benchmarks/EVAL_BARRIER_AB.json, PERF.md ROUND-4e): the recompute
        # trades cheap MXU flops for an HBM round-trip of the mid tensor,
        # the right call on a byte-bound serving program. Do not re-add.
        x = TemporalConv(self.features, 3, stride=self.temporal_stride,
                         backend=self.backend, dtype=self.dtype, ws=ws,
                         time_axis=self.time_axis, name="temporal")(x)
        # Names the temporal conv output for the 'conv' remat policy (save
        # only these; recompute mid + elementwise in backward). Identity
        # everywhere else.
        return checkpoint_name(x, "c2p1d_out")


class BasicBlock(nn.Module):
    features: int
    stride: int = 1  # applied to (t, h, w) jointly at stage entry
    backend: str = "xla"
    dtype: jnp.dtype = jnp.bfloat16
    bn_axis_name: str | None = None
    norm: str = "batch"
    time_axis: str | None = None
    # paper-exact per-conv M by default; mxu_aligned_mid_channels for the
    # `*_tpu` variants (M rounded to the 128-wide MXU lane width)
    mid_channels_fn: object = r2plus1d_mid_channels

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cin = x.shape[-1]
        bn = lambda name, **kw: BatchNorm(  # noqa: E731
            kind=self.norm, use_running_average=not train, dtype=self.dtype,
            axis_name=self.bn_axis_name, name=name, **kw,
        )
        ws = self.norm == "scaleonly"
        residual = x
        # bn_axis_name MUST reach the factorized conv's mid BN too: under
        # explicit shard_map (DP or time sharding) a non-psync'd mid BN
        # silently normalizes with LOCAL statistics — caught by the
        # time-sharded train-step equality test (the GSPMD path never
        # exercises axis_name, and tiny3d has no mid BNs).
        y = Conv2Plus1D(
            self.features, self.mid_channels_fn(cin, self.features),
            spatial_stride=self.stride, temporal_stride=self.stride,
            backend=self.backend, dtype=self.dtype, norm=self.norm,
            bn_axis_name=self.bn_axis_name,
            time_axis=self.time_axis, name="conv1",
        )(x, train)
        y = nn.relu(bn("bn1")(y))
        y = Conv2Plus1D(
            self.features, self.mid_channels_fn(self.features, self.features),
            backend=self.backend, dtype=self.dtype, norm=self.norm,
            bn_axis_name=self.bn_axis_name,
            time_axis=self.time_axis, name="conv2",
        )(y, train)
        # scaleonly: zero-init the branch's final scale (SkipInit) — the
        # block is an identity at init, which replaces BN's depth-stabilizing
        # role for from-scratch training.
        y = bn("bn2", **({"scale_init": nn.initializers.zeros}
                         if ws else {}))(y)
        if self.stride != 1 or cin != self.features:
            residual = Conv3D(self.features, (1, 1, 1),
                              strides=(self.stride, self.stride, self.stride),
                              dtype=self.dtype, ws=ws, name="downsample")(x)
            residual = bn("bn_down")(residual)
        return nn.relu(y + residual)


class R2Plus1D(nn.Module):
    stage_blocks: Sequence[int] = (2, 2, 2, 2)  # 18: (2,2,2,2); 34: (3,4,6,3)
    num_classes: int = 101
    backend: str = "xla"
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    bn_axis_name: str | None = None
    # 'batch' (reference-faithful) | 'frozen' (BN-lite, +15% train step) |
    # 'group' (GroupNorm) | 'scaleonly' (stats-free affine + scaled weight
    # standardization + SkipInit — the TPU training mode) — models.layers.Norm
    norm: str = "batch"
    # When set, the model runs inside shard_map with the clip's T dim
    # sharded over this mesh axis: temporal convs halo-exchange over ICI
    # (evaluation/long_clip.py drives this; eval mode only).
    time_axis: str | None = None
    mid_channels_fn: object = r2plus1d_mid_channels
    stem_mid: int = 45  # paper stem width; 128 in the `*_tpu` variants
    # Activation rematerialization on the residual blocks ('none' | 'full' |
    # 'dots' | 'mid' — see remat_policy). Numerics-identical to 'none' (same
    # math, recomputed); a training-throughput knob only.
    remat: str = "none"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 features_only: bool = False) -> jax.Array:
        bn = lambda name: BatchNorm(  # noqa: E731
            kind=self.norm, use_running_average=not train, dtype=self.dtype,
            axis_name=self.bn_axis_name, name=name,
        )
        ws = self.norm == "scaleonly"
        x = x.astype(self.dtype)
        # Stem: fixed 45 mid-channels (paper), spatial stride 2.
        x = SpatialConv(self.stem_mid, 7, stride=2, backend=self.backend,
                        dtype=self.dtype, ws=ws, name="stem_spatial")(x)
        x = nn.relu(bn("stem_bn1")(x))
        x = TemporalConv(64, 3, backend=self.backend, dtype=self.dtype, ws=ws,
                         time_axis=self.time_axis, name="stem_temporal")(x)
        x = nn.relu(bn("stem_bn2")(x))

        # Block-granular remat: wrap the block CLASS once (argnum 2 = the
        # static `train` flag; argnum 0 is the module itself). prevent_cse
        # stays on (the default) so XLA cannot CSE the recompute back into
        # the forward and silently undo the policy.
        block_cls = (BasicBlock if self.remat == "none" else
                     nn.remat(BasicBlock, policy=remat_policy(self.remat),
                              static_argnums=(2,)))
        for stage, num_blocks in enumerate(self.stage_blocks):
            features = 64 * (2 ** stage)
            for block in range(num_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = block_cls(features, stride=stride, backend=self.backend,
                               dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                               norm=self.norm, time_axis=self.time_axis,
                               mid_channels_fn=self.mid_channels_fn,
                               name=f"stage{stage + 1}_block{block}")(x, train)

        if features_only:
            # pre-pool feature map (B, T', H', W', 512) — the long-clip
            # sequence-parallel wrapper pools/classifies outside shard_map
            return x
        x = global_avg_pool_3d(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="fc")(x)
        return logits.astype(jnp.float32)
