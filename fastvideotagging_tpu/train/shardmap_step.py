"""Explicit shard_map data-parallel train step (SURVEY.md N4's literal form).

The default step (train/loop.py) is declarative: GSPMD partitions one global
program and inserts the collectives. This variant is the explicit SPMD
spelling of the same math — each shard computes its micro-batch gradients
and BatchNorm batch statistics locally, then:

  * gradients:  lax.pmean over the `data` axis (the NCCL-allreduce analog),
  * BN stats:   flax BatchNorm's ``axis_name`` psyncs mean/var over `data`,
    so normalization uses GLOBAL batch statistics — numerically equivalent
    to the GSPMD step (tested to fp tolerance on the 8-device mesh).

Useful when hand-placing collectives matters (e.g. overlapping psum with
backward on multi-chip), and as a correctness cross-check of the GSPMD path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from fastvideotagging_tpu.config import ExperimentConfig
from fastvideotagging_tpu.models import heads
from fastvideotagging_tpu.ops.preprocess_kernel import preprocess_batch
from fastvideotagging_tpu.train.state import TrainState


def make_train_step_shardmap(model, cfg: ExperimentConfig, mesh: Mesh,
                             data_axis: str = "data"):
    """Build the explicit-SPMD step. The `model` must be constructed with
    ``bn_axis_name=data_axis`` so BatchNorm psyncs its statistics."""
    d = cfg.data
    multilabel = cfg.model.multilabel
    mean = jnp.asarray(d.mean, jnp.float32)
    std = jnp.asarray(d.std, jnp.float32)
    resize_hw = d.crop_hw if getattr(d, "host_crop", False) else d.resize_hw

    def local_step(state: TrainState, batch: dict, dropout_rng: jax.Array):
        def loss_fn(params, batch_stats):
            clips = preprocess_batch(
                batch["frames"], batch["crop_tops"], batch["crop_lefts"],
                batch["flips"], mean, std,
                resize_hw=resize_hw, crop_hw=d.crop_hw,
                out_dtype_name=cfg.model.compute_dtype,
            )
            logits, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats}, clips,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            if multilabel:
                loss = heads.sigmoid_bce(logits, batch["multihot"],
                                         batch["weights"])
            else:
                loss = heads.softmax_cross_entropy(
                    logits, batch["labels"], batch["weights"])
            # norm='group' models have no batch_stats collection at all
            return loss, (logits, mutated.get("batch_stats", batch_stats))

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats)
        # THE collective: gradient allreduce over the data axis (ICI).
        grads = lax.pmean(grads, data_axis)
        loss = lax.pmean(loss, data_axis)
        # BN running stats were updated from psync'd batch statistics inside
        # apply (axis_name), so shards agree; no further sync needed.
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        metrics = {"loss": loss}
        if not multilabel:
            top1 = (jnp.argmax(logits, axis=-1) == batch["labels"]).astype(
                jnp.float32)
            w = batch["weights"]
            metrics["top1"] = lax.pmean(
                (top1 * w).sum() / jnp.maximum(w.sum(), 1.0), data_axis)
        return state, metrics

    batch_spec = P(data_axis)
    mapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), batch_spec, P()),
        out_specs=(P(), P()),
        check_vma=False,  # flax BN axis_name psyncs are not vma-tracked
    )
    return jax.jit(mapped)
