"""Time-sharded (sequence-parallel) TRAINING step — SURVEY.md §6.7's last
asymmetry closed (VERDICT r4 item 7: SP existed as inference only).

The clip's T axis is sharded over a mesh axis; temporal convolutions run as
halo-exchange convs over ICI (parallel.temporal.halo_temporal_conv — the
conv analog of ring attention), BatchNorm statistics psync over the time
axis (flax ``axis_name`` — so normalization uses the GLOBAL (B,T,H,W)
statistics exactly like the unsharded step), and gradients are exact:

The head is restructured so that EVERY parameter sits UPSTREAM of one
``psum`` over the time axis — then a single gradient psum is the exact
total gradient for the whole tree:

    local_sum  = sum over (T'_local, H', W') of the f32 features
    partial    = (local_sum / global_count) @ W_fc  +  b_fc / n_shards
    logits     = psum(partial, time)           # == unsharded logits
    loss       = CE(logits, labels)            # replicated
    grads      = psum(jax.grad(local_loss), time)   # exact for every param

(The naive spelling — psum the pooled features, then a replicated fc —
gives each shard the FULL fc gradient, which a blanket grad-psum would
over-count n times; dividing the bias by n and keeping the matmul on the
partial sums makes every shard's contribution a true partial.)

Numerics vs the unsharded step: exact to float tolerance
(tests/test_temporal_sharding.py asserts grads/loss/batch_stats at 1e-5 on
the 8-device CPU mesh). The one deliberate deviation in bf16 mode: the
pooled feature vector is never rounded through the model's compute dtype
between pooling and fc (partial sums stay f32 end-to-end) — strictly more
precise than layers.global_avg_pool_3d's bf16 round-trip.

Use case: training on clips too long for one chip's HBM — per-chip
activation memory is O(T / n_shards); the per-conv communication is two
(k-1)/2-frame halos with ring neighbors. Dense-clip training ([B:8]-style
16-frame clips) should keep using train/loop.py: at T=16 there is nothing
to shard.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from fastvideotagging_tpu.config import ExperimentConfig
from fastvideotagging_tpu.models import heads
from fastvideotagging_tpu.ops.preprocess_kernel import preprocess_batch
from fastvideotagging_tpu.train.state import TrainState

TIME_AXIS = "time"


def time_shardable(model) -> bool:
    """The r2plus1d family carries the ``time_axis``/``features_only``
    machinery; other backbones would need their own halo plumbing."""
    return hasattr(model, "time_axis") and hasattr(model, "stem_mid")


def make_time_sharded_train_step(model_factory, cfg: ExperimentConfig,
                                 mesh: Mesh, time_axis: str = TIME_AXIS):
    """Build the jitted time-sharded train step.

    model_factory(time_axis=..., bn_axis_name=...) must construct the
    backbone (e.g. ``functools.partial(get_model, "r2plus1d_18",
    num_classes=K)``); the returned step is
    ``(state, batch, dropout_rng) -> (state, metrics)`` with the same batch
    contract as train/loop.make_train_step, except ``frames`` must have its
    T axis divisible by the mesh's time-axis size (and T/n by the backbone's
    total temporal stride — 8 for the 4-stage r2plus1d layout).

    dropout_rng is accepted for signature parity but the head's dropout is
    bypassed (the pooled head is computed manually for grad exactness);
    backbone dropout does not exist in this family.
    """
    d = cfg.data
    multilabel = cfg.model.multilabel
    mean = jnp.asarray(d.mean, jnp.float32)
    std = jnp.asarray(d.std, jnp.float32)
    resize_hw = d.crop_hw if getattr(d, "host_crop", False) else d.resize_hw
    n_shards = mesh.shape[time_axis]

    # halo convs + BN stat psync both ride the time axis
    model = model_factory(time_axis=time_axis, bn_axis_name=time_axis)

    def local_step(state: TrainState, batch: dict, dropout_rng: jax.Array):
        del dropout_rng  # head dropout bypassed (see docstring)

        def loss_fn(params, batch_stats):
            # preprocess is frame-pointwise (resize/crop/flip/normalize), so
            # it runs directly on the local T slice; crops are per-sample
            # spatial parameters, identical across shards.
            clips = preprocess_batch(
                batch["frames"], batch["crop_tops"], batch["crop_lefts"],
                batch["flips"], mean, std,
                resize_hw=resize_hw, crop_hw=d.crop_hw,
                out_dtype_name=cfg.model.compute_dtype,
            )
            feats, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats}, clips,
                train=True, features_only=True, mutable=["batch_stats"],
            )
            # partial pooled head: everything upstream of the psum (module
            # docstring) so one grad-psum is exact for the whole tree
            local_sum = jnp.sum(feats.astype(jnp.float32), axis=(1, 2, 3))
            count = feats.shape[1] * n_shards * feats.shape[2] * feats.shape[3]
            fc = params["fc"]
            partial = ((local_sum / count) @ fc["kernel"].astype(jnp.float32)
                       + fc["bias"].astype(jnp.float32) / n_shards)
            logits = lax.psum(partial, time_axis)
            if multilabel:
                loss = heads.sigmoid_bce(logits, batch["multihot"],
                                         batch["weights"])
            else:
                loss = heads.softmax_cross_entropy(
                    logits, batch["labels"], batch["weights"])
            return loss, (logits,
                          mutated.get("batch_stats", batch_stats))

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats)
        # pmean, not psum: under shard_map's collective-AD convention the
        # logits psum transposes to a psum, so each shard's raw grad is
        # n * its true partial contribution (measured: fc grads exactly n x
        # under a final psum) — pmean folds that factor away and is the same
        # reduction the DP shard_map path uses (train/shardmap_step.py).
        grads = lax.pmean(grads, time_axis)
        # loss/logits/new_stats are already replicated (computed from psum'd
        # quantities); BN running stats were updated from psync'd statistics.
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        metrics = {"loss": loss}
        if not multilabel:
            top1 = (jnp.argmax(logits, axis=-1) == batch["labels"]).astype(
                jnp.float32)
            w = batch["weights"]
            metrics["top1"] = (top1 * w).sum() / jnp.maximum(w.sum(), 1.0)
        return state, metrics

    batch_keys = ["frames", "labels", "crop_tops", "crop_lefts", "flips",
                  "weights"] + (["multihot"] if multilabel else [])
    batch_specs = {k: (P(None, time_axis) if k == "frames" else P())
                   for k in batch_keys}
    mapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), batch_specs, P()),
        out_specs=(P(), P()),
        check_vma=False,  # flax BN axis_name psyncs are not vma-tracked
    )
    return jax.jit(mapped), model
