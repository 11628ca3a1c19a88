"""I3D — Two-Stream Inflated 3D ConvNet, RGB stream (Carreira & Zisserman
CVPR'17 "Quo Vadis"; PAPERS.md anchors; the full-3D parent of models/s3d.py:
S3D is exactly this network with every 3x3x3 conv factorized).

Geometry mirrors the canonical public PyTorch port of the DeepMind
checkpoint (the "pytorch-i3d" Unit3D/InceptionModule layout) so those
checkpoints import numerics-exactly (models/torch_import.py
convert_i3d_state_dict):

* stem 7x7x7 stride-2 conv; (1,3,3) s(1,2,2) maxpool; 1x1x1 conv; 3x3x3
  conv; maxpool; nine Inception blocks (BN-Inception branch widths, the
  same `_INCEPTION_BLOCKS` table as S3D) with (3,3,3) s2 and (2,2,2) s2
  maxpools between stages; BN eps 1e-3.
* padding is TF-SAME (asymmetric (pad//2, pad-pad//2) when the total pad
  is odd), NOT the torch/MXNet symmetric k//2 used elsewhere in this
  package — the DeepMind port replicates TensorFlow's semantics and a
  symmetric pad shifts stride-2 outputs by one pixel. Computed per call
  from the static traced shape (`_same_pads`).
* head: AvgPool3d((2,7,7), stride 1) -> dropout -> biased 1x1x1 conv
  logits -> mean over remaining positions. The classifier is linear and
  position-independent, so it commutes with the pooling; at the canonical
  224px eval geometry the (7,7) window IS the spatial extent — the exact
  equivalent here is f32 spatial global mean -> temporal window-2
  stride-1 mean -> temporal mean -> Dense (the identical head note as
  models/s3d.py; at other geometries the spatial pool is the global mean).

TPU notes: NTHWC, bf16 compute / f32 params. The FLOP carriers are full
3x3x3 convs (MXU-friendly dense convs); the stem's 7x7x7 s2 is the single
most expensive layer. For the efficiency-oriented sibling use `s3d`.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from fastvideotagging_tpu.models.layers import BatchNorm, Conv3D
from fastvideotagging_tpu.models.s3d import _INCEPTION_BLOCKS
from fastvideotagging_tpu.ops.arch_spec import tf_same_pads as _same_pads


def same_padding(x: jax.Array, window, strides) -> tuple:
    """Per-dim TF-SAME pads for the (T, H, W) dims of an NTHWC tensor."""
    return tuple(_same_pads(x.shape[1 + i], window[i], strides[i])
                 for i in range(3))


def max_pool_same(x: jax.Array, window, strides,
                  train: bool = False) -> jax.Array:
    """TF-SAME max-pool over (T, H, W) (phase-dependent lowering,
    ops.maxpool_grad: separable in train, fused 3D window in eval)."""
    from fastvideotagging_tpu.ops.maxpool_grad import max_pool_nthwc
    return max_pool_nthwc(x, tuple(window), tuple(strides),
                          same_padding(x, window, strides), train=train)


class Unit3D(nn.Module):
    """conv (TF-SAME, no bias) + BN(eps 1e-3) + ReLU — pytorch-i3d's
    Unit3D with its defaults."""

    features: int
    kernel: tuple = (1, 1, 1)
    stride: tuple = (1, 1, 1)
    dtype: jnp.dtype = jnp.bfloat16
    bn_axis_name: str | None = None
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = Conv3D(self.features, self.kernel, strides=self.stride,
                   padding=same_padding(x, self.kernel, self.stride),
                   dtype=self.dtype, name="conv")(x)
        y = BatchNorm(kind=self.norm, use_running_average=not train,
                      dtype=self.dtype, axis_name=self.bn_axis_name,
                      epsilon=1e-3, name="bn")(y)
        return nn.relu(y)


class Inception3D(nn.Module):
    """Inception block with full-3D 3x3x3 branches (the unfactorized
    sibling of models/s3d.SepInception; same widths, same concat order)."""

    c0: int
    c1a: int
    c1b: int
    c2a: int
    c2b: int
    c3: int
    dtype: jnp.dtype = jnp.bfloat16
    bn_axis_name: str | None = None
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  norm=self.norm)
        b0 = Unit3D(self.c0, name="b0", **kw)(x, train)
        b1 = Unit3D(self.c1a, name="b1_reduce", **kw)(x, train)
        b1 = Unit3D(self.c1b, kernel=(3, 3, 3), name="b1_conv", **kw)(
            b1, train)
        b2 = Unit3D(self.c2a, name="b2_reduce", **kw)(x, train)
        b2 = Unit3D(self.c2b, kernel=(3, 3, 3), name="b2_conv", **kw)(
            b2, train)
        b3 = max_pool_same(x, (3, 3, 3), (1, 1, 1), train=train)
        b3 = Unit3D(self.c3, name="b3_conv", **kw)(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class I3D(nn.Module):
    """I3D RGB stream on NTHWC input."""

    num_classes: int = 400
    dropout: float = 0.5  # the pytorch-i3d default (dropout_keep_prob 0.5)
    dtype: jnp.dtype = jnp.bfloat16
    bn_axis_name: str | None = None
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  norm=self.norm)
        x = x.astype(self.dtype)
        x = Unit3D(64, kernel=(7, 7, 7), stride=(2, 2, 2),
                   name="conv1", **kw)(x, train)
        x = max_pool_same(x, (1, 3, 3), (1, 2, 2), train=train)
        x = Unit3D(64, name="conv2", **kw)(x, train)
        x = Unit3D(192, kernel=(3, 3, 3), name="conv3", **kw)(x, train)
        x = max_pool_same(x, (1, 3, 3), (1, 2, 2), train=train)
        for name, widths in _INCEPTION_BLOCKS:
            if widths is None:
                window = (3, 3, 3) if name == "pool3" else (2, 2, 2)
                x = max_pool_same(x, window, (2, 2, 2), train=train)
            else:
                x = Inception3D(*widths, name=name, **kw)(x, train)

        # Head (module docstring): exact pytorch-i3d numerics at the
        # canonical 224px geometry, global spatial mean elsewhere.
        m = jnp.mean(x.astype(jnp.float32), axis=(2, 3))  # (N, T', C)
        if m.shape[1] > 1:
            m = (m[:, :-1] + m[:, 1:]) * 0.5
        m = jnp.mean(m, axis=1)
        if self.dropout > 0:
            m = nn.Dropout(self.dropout, deterministic=not train)(m)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="fc")(m)
        return logits.astype(jnp.float32)
