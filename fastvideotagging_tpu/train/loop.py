"""The jitted train step and fit loop (SURVEY.md C12, C14, §4.1).

TPU-first structure, one compiled program per step containing:

  uint8 frames (sharded over `data`) -> fused device preprocess ->
  model fwd (bf16, MXU) -> loss (f32) -> bwd -> grad allreduce over ICI ->
  SGD update -> new state

Parallelism is declarative (pjit/GSPMD): the batch carries a NamedSharding
over the mesh's `data` axis, params are replicated; XLA inserts the psum for
gradients and for BatchNorm batch statistics (i.e. BN is cross-replica
"SyncBN" — the global-batch semantics of the reference's single-GPU math,
unlike its per-GPU BN). The same compiled step runs on 1 chip or N chips.

The reference's equivalents — split_and_load, autograd.record()/backward(),
Trainer.step with NCCL kvstore — have no direct counterparts here; they are
all subsumed by this one jitted function.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from fastvideotagging_tpu.config import ExperimentConfig
from fastvideotagging_tpu.models import heads
from fastvideotagging_tpu.ops.preprocess_kernel import preprocess_batch
from fastvideotagging_tpu.train.state import TrainState


def make_train_step(
    model,
    cfg: ExperimentConfig,
    donate: bool = True,
    device_cache: bool = False,
) -> Callable[[TrainState, dict, jax.Array], tuple[TrainState, dict]]:
    """Build the jitted train step: (state, batch, dropout_rng) -> (state, metrics).

    batch: frames uint8 (B,T,H,W,3), labels int32 (B,) or multihot f32 (B,K),
    crop_tops/crop_lefts int32 (B,), flips bool (B,), weights f32 (B,).

    ``device_cache=True`` (the HBM-resident pack tier, data/device_cache.py):
    the step takes a fourth argument — the staged (total_frames, H, W, 3)
    uint8 cache — and the batch carries ``rows`` (B, T) int32 cache-row
    indices instead of ``frames``; the clip pixels are gathered on-device
    (one leading-axis row gather) so the per-step H2D is a few KB of
    indices. The cache MUST be a traced argument, never a jit-closure
    capture (GB-scale closure constants crash the remote compile service —
    CLAUDE.md trap).
    """
    d = cfg.data
    multilabel = cfg.model.multilabel
    mean = jnp.asarray(d.mean, jnp.float32)
    std = jnp.asarray(d.std, jnp.float32)
    compute_dtype = cfg.model.compute_dtype

    # host_crop ships pre-cropped frames: the device "resize" becomes the
    # (crop_hw -> crop_hw) identity and the kernel only applies flip+norm.
    resize_hw = d.crop_hw if getattr(d, "host_crop", False) else d.resize_hw

    def loss_fn(params, batch_stats, batch, dropout_rng, cache_frames=None):
        frames = (cache_frames[batch["rows"]] if device_cache
                  else batch["frames"])
        clips = preprocess_batch(
            frames, batch["crop_tops"], batch["crop_lefts"],
            batch["flips"], mean, std,
            resize_hw=resize_hw, crop_hw=d.crop_hw,
            out_dtype_name=compute_dtype,
        )
        variables = {"params": params, "batch_stats": batch_stats}
        logits, mutated = model.apply(
            variables, clips, train=True, mutable=["batch_stats"],
            rngs={"dropout": dropout_rng},
        )
        if multilabel:
            loss = heads.sigmoid_bce(logits, batch["multihot"], batch["weights"])
        else:
            loss = heads.softmax_cross_entropy(
                logits, batch["labels"], batch["weights"]
            )
        # norm='group' models have no batch_stats collection at all
        return loss, (logits, mutated.get("batch_stats", batch_stats))

    def _step(state: TrainState, batch: dict, dropout_rng: jax.Array,
              cache_frames=None):
        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, dropout_rng, cache_frames)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        metrics = {"loss": loss}
        if not multilabel:
            top1 = jnp.argmax(logits, axis=-1) == batch["labels"]
            w = batch["weights"]
            metrics["top1"] = (top1 * w).sum() / jnp.maximum(w.sum(), 1.0)
        return state, metrics

    donate_argnums = (0,) if donate else ()
    if device_cache:
        return jax.jit(_step, donate_argnums=donate_argnums)

    def step(state: TrainState, batch: dict, dropout_rng: jax.Array):
        return _step(state, batch, dropout_rng)

    return jax.jit(step, donate_argnums=donate_argnums)


def make_sample_batch(cfg: ExperimentConfig, batch_size: int | None = None,
                      device_cache: bool = False) -> dict:
    """A zeros batch with the config's exact shapes (for init / compile / dryrun).

    ``device_cache=True`` swaps the frames tensor for the (B, T) int32
    cache-row index array of the HBM-resident tier (the caller supplies the
    cache array itself to the step)."""
    d = cfg.data
    b = batch_size or cfg.train.batch_size
    t = d.sampler.clip_len
    if getattr(d, "host_crop", False):
        h, w = d.crop_hw
    else:
        h, w = d.source_hw or d.resize_hw
    batch = {
        "labels": jnp.zeros((b,), jnp.int32),
        "crop_tops": jnp.zeros((b,), jnp.int32),
        "crop_lefts": jnp.zeros((b,), jnp.int32),
        "flips": jnp.zeros((b,), bool),
        "weights": jnp.ones((b,), jnp.float32),
    }
    if device_cache:
        batch["rows"] = jnp.zeros((b, t), jnp.int32)
    else:
        batch["frames"] = jnp.zeros((b, t, h, w, 3), jnp.uint8)
    if cfg.model.multilabel:
        batch["multihot"] = jnp.zeros((b, cfg.model.num_classes), jnp.float32)
    return batch
