"""fit(): the end-to-end training orchestration (SURVEY.md C12, §4.1).

Mirrors the reference's train-script body — epoch/batch loop, periodic
speed/loss logging, per-epoch checkpoint + eval — on the TPU-native
substrate: one jitted step (preprocess+fwd+bwd+allreduce+update), uint8
batches prefetched onto the device mesh, orbax checkpoints with exact resume.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from fastvideotagging_tpu.config import ExperimentConfig
from fastvideotagging_tpu.data.packed import open_dataset
from fastvideotagging_tpu.data.pipeline import device_prefetch, train_batches
from fastvideotagging_tpu.models import model_from_config
from fastvideotagging_tpu.parallel import batch_sharding, make_mesh
from fastvideotagging_tpu.train import lr as lr_lib
from fastvideotagging_tpu.train.checkpoint import CheckpointManager
from fastvideotagging_tpu.train.loop import make_train_step
from fastvideotagging_tpu.train.metrics import RunningMean
from fastvideotagging_tpu.train.state import TrainState, create_train_state
from fastvideotagging_tpu.utils.logging import MetricsLogger, get_logger

log = get_logger("fvt.train")


def fit(
    cfg: ExperimentConfig,
    train_records,
    val_records=None,
    mesh=None,
    num_tags: int | None = None,
    metrics_path: str | None = None,
    eval_fn=None,
    init_variables: dict | None = None,
) -> TrainState:
    """Train per config; returns the final TrainState.

    eval_fn: optional callable (state, epoch) -> dict of eval scalars, run
    after each epoch. If absent and ``val_records`` is given, the standard
    multi-clip evaluator is built automatically.
    init_variables: optional pretrained {'params', 'batch_stats'} (the
    reference's ``pretrained=`` fine-tune path, e.g. from
    zoo.load_pretrained) used instead of random init; structure/shape
    mismatches raise.
    """
    t_cfg, d_cfg, m_cfg = cfg.train, cfg.data, cfg.model
    mesh = mesh or make_mesh(cfg.parallel.data_parallel, cfg.parallel.model_parallel)
    if eval_fn is None and val_records:
        from fastvideotagging_tpu.evaluation.evaluate import make_eval_fn

        # per-epoch eval rides the SAME mesh as training (data-parallel
        # clip chunks), not a single chip; multi-host, every host decodes
        # the val list and the forward spans all chips of the job
        eval_fn = make_eval_fn(cfg, val_records, num_tags=num_tags,
                               mesh=mesh)
    data_shards = mesh.shape[cfg.parallel.data_axis]
    if t_cfg.batch_size % data_shards != 0:
        raise ValueError(
            f"batch_size={t_cfg.batch_size} must be divisible by the data-"
            f"parallel degree {data_shards}; set train.batch_size or "
            f"parallel.data_parallel accordingly"
        )
    num_tags = num_tags or (m_cfg.num_classes if m_cfg.multilabel else None)

    # train_records: a list of VideoRecords (streaming decode) or a
    # ``.fvtpack`` path (decode-once mmap tier, data/packed.py).
    dataset = open_dataset(train_records, d_cfg, mode="train",
                           num_tags=num_tags, seed=t_cfg.seed)
    if len(dataset) < t_cfg.batch_size:
        # train_batches with drop_last would yield zero batches per epoch
        # while still paying full decode cost — fail loudly instead.
        raise ValueError(
            f"dataset has {len(dataset)} samples < batch_size="
            f"{t_cfg.batch_size}; no full batch can be formed")
    steps_per_epoch = max(1, len(dataset) // t_cfg.batch_size)

    model_kw = {}
    if cfg.parallel.model_parallel > 1:
        # channel/tensor parallelism over the model axis (SlowFast config)
        model_kw["shard_axis"] = cfg.parallel.model_axis
    try:
        model = model_from_config(m_cfg, **model_kw)
    except TypeError as e:
        if "shard_axis" in str(e):
            raise ValueError(
                f"model {m_cfg.name!r} does not support "
                f"model_parallel={cfg.parallel.model_parallel} (channel "
                f"sharding needs a shard_axis-capable model — the slowfast "
                f"family); use data_parallel only") from e
        raise
    tx = lr_lib.make_optimizer(t_cfg, steps_per_epoch)

    rng = jax.random.PRNGKey(t_cfg.seed)
    # Initialize on a preprocessed-shape clip tensor.
    ch, cw = d_cfg.crop_hw
    sample_clips = np.zeros(
        (1, d_cfg.sampler.clip_len, ch, cw, 3), np.float32
    )
    param_specs = None
    if cfg.parallel.model_parallel > 1:
        from fastvideotagging_tpu.parallel.mesh import param_partition_specs

        boxed = jax.eval_shape(
            lambda: model.init(rng, jnp.asarray(sample_clips), train=False))
        param_specs = param_partition_specs(boxed)["params"]
    state = create_train_state(model, tx, rng, sample_clips)
    if init_variables is not None:
        state = _apply_pretrained(state, init_variables)
    from fastvideotagging_tpu.parallel.mesh import shard_train_state

    state = shard_train_state(state, mesh, param_specs)

    if t_cfg.checkpoint_dir:
        ckpt = CheckpointManager(t_cfg.checkpoint_dir)
    else:
        from fastvideotagging_tpu.train.checkpoint import NullCheckpointManager

        ckpt = NullCheckpointManager()  # benchmark/throwaway runs
    start_epoch = 0
    if t_cfg.resume:
        restored, extra = ckpt.restore(state)
        if restored is not None:
            # Re-apply the same shardings as the fresh-init path: a plain
            # replicated device_put would silently drop the channel-sharding
            # PartitionSpecs when model_parallel > 1.
            state = shard_train_state(restored, mesh, param_specs)
            start_epoch = int(extra.get("epoch", -1)) + 1
            log.info("resumed from step %d (epoch %d)", int(state.step), start_epoch)

    use_device_cache = bool(getattr(d_cfg, "cache_on_device", False))
    if use_device_cache:
        from fastvideotagging_tpu.data.device_cache import build_cache
        from fastvideotagging_tpu.data.packed import PackedDataset

        if not isinstance(dataset, PackedDataset):
            raise ValueError(
                "cache_on_device=True needs a .fvtpack train source "
                "(cli.prepare --pack); streaming records cannot be staged "
                "into HBM")
        cache = build_cache(dataset, mesh=mesh)
        raw_step = make_train_step(model, cfg, device_cache=True)
        # the cache rides as a TRACED argument every step (same buffer ->
        # no transfer); closure capture would crash the remote compiler
        step_fn = lambda s, b, r: raw_step(s, b, r, cache.frames)  # noqa: E731
    else:
        cache = None
        step_fn = make_train_step(model, cfg)
    data_sh = batch_sharding(mesh)
    # Multi-host: each process decodes only the global-batch rows its
    # addressable devices own; global arrays are assembled per batch
    # (mesh.global_batch_put via device_prefetch). Metrics are identical on
    # every process (the step psums them), so only process 0 logs.
    local_rows = None
    if jax.process_count() > 1:
        from fastvideotagging_tpu.parallel.mesh import local_batch_rows

        local_rows = local_batch_rows(data_sh, t_cfg.batch_size)
        if not local_rows:
            raise ValueError(
                f"process {jax.process_index()}: none of this host's devices "
                f"appear in the data sharding (mesh uses "
                f"{mesh.devices.size}/{len(jax.devices())} devices) — every "
                f"process must own at least one batch row; raise "
                f"--data-parallel/--model-parallel to cover all hosts' chips")
        log.info("multi-host: process %d/%d loads %d/%d rows per batch",
                 jax.process_index(), jax.process_count(), len(local_rows),
                 t_cfg.batch_size)
    mlog = MetricsLogger(metrics_path,
                         enabled=jax.process_index() == 0)
    global_step = int(state.step)

    from fastvideotagging_tpu.utils.interrupt import GracefulStopper

    with GracefulStopper() as stopper:
        state, global_step = _epoch_loop(
            cfg, state, step_fn, dataset, data_sh, ckpt, mlog, rng,
            global_step, start_epoch, eval_fn, stopper,
            local_rows=local_rows, cache=cache)
    ckpt.wait()
    mlog.close()
    return state


def _apply_pretrained(state: TrainState, variables: dict) -> TrainState:
    """Replace params/batch_stats with a pretrained tree, structure-checked."""

    def check_and_cast(init_tree, new_tree, what):
        init_flat = dict(jax.tree_util.tree_flatten_with_path(init_tree)[0])
        new_flat = dict(jax.tree_util.tree_flatten_with_path(new_tree)[0])
        if set(init_flat) != set(new_flat):
            missing = sorted(map(jax.tree_util.keystr,
                                 set(init_flat) - set(new_flat)))[:4]
            extra = sorted(map(jax.tree_util.keystr,
                               set(new_flat) - set(init_flat)))[:4]
            raise ValueError(
                f"pretrained {what} tree mismatch: missing={missing} "
                f"extra={extra}")
        for path, leaf in init_flat.items():
            got = new_flat[path]
            if tuple(np.shape(got)) != tuple(leaf.shape):
                raise ValueError(
                    f"pretrained {what} shape mismatch at "
                    f"{jax.tree_util.keystr(path)}: {np.shape(got)} vs "
                    f"{tuple(leaf.shape)}")
        return jax.tree.map(lambda init, new: jnp.asarray(new, init.dtype),
                            init_tree, new_tree)

    state = state.replace(
        params=check_and_cast(state.params, variables["params"], "params"))
    if variables.get("batch_stats"):
        state = state.replace(batch_stats=check_and_cast(
            state.batch_stats, variables["batch_stats"], "batch_stats"))
    return state


def _epoch_loop(cfg, state, step_fn, dataset, data_sh, ckpt, mlog, rng,
                global_step, start_epoch, eval_fn, stopper,
                local_rows=None, cache=None):
    t_cfg, d_cfg = cfg.train, cfg.data
    nproc = jax.process_count()

    def make_batches(epoch):
        if cache is not None:
            from fastvideotagging_tpu.data.device_cache import (
                train_index_batches,
            )

            # index-only batches: a few KB per step; the pixels are already
            # in HBM (the 'Fast' endpoint — zero per-step frame transfer)
            return train_index_batches(dataset, cache, t_cfg.batch_size,
                                       epoch, rows=local_rows)
        return train_batches(dataset, t_cfg.batch_size, epoch,
                             num_workers=d_cfg.num_workers, rows=local_rows)

    def stop_requested():
        # Multi-host, the stop decision must be COLLECTIVE: a signal lands on
        # one process only; if it alone saved and returned, the others would
        # enter the next step's collectives and the job would deadlock (the
        # orbax save barrier on one side, the gradient psum on the other).
        if nproc == 1:
            return stopper.stop_requested
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray(stopper.stop_requested, np.int32))
        return bool(np.max(flags) > 0)

    for epoch in range(start_epoch, t_cfg.num_epochs):
        loss_avg, top1_avg = RunningMean(), RunningMean()
        metrics = None  # this epoch's last step; None if the epoch is empty
        epoch_start = time.time()
        tic = time.time()
        batches = device_prefetch(
            make_batches(epoch),
            sharding=data_sh, depth=d_cfg.prefetch_depth,
            global_batch=t_cfg.batch_size if local_rows is not None else None,
            rows=local_rows,
        )
        data_wait = 0.0  # host-blocked-on-loader time this logging window
        while True:
            t_wait = time.time()
            batch = next(batches, None)
            if batch is None:
                break
            data_wait += time.time() - t_wait
            if stop_requested():
                ckpt.save(global_step, state,
                          {"epoch": epoch - 1})
                log.warning("stopping at step %d on request; checkpoint saved "
                            "(resume with --resume)", global_step)
                return state, global_step
            dropout_rng = jax.random.fold_in(rng, global_step)
            state, metrics = step_fn(state, batch, dropout_rng)
            global_step += 1
            if global_step % t_cfg.log_every == 0:
                metrics = jax.device_get(metrics)  # sync point, every K steps
                loss_avg.update(metrics["loss"], t_cfg.batch_size)
                if "top1" in metrics:
                    top1_avg.update(metrics["top1"], t_cfg.batch_size)
                window = time.time() - tic
                speed = t_cfg.log_every * t_cfg.batch_size / window
                # data_wait_frac: share of the window the host spent BLOCKED
                # on the loader (prefetch starvation). ~0 means data IO is
                # fully hidden behind the device — the 'Fast' contract; near
                # 1 means loader-bound (use cli.prepare --pack).
                wait_frac = data_wait / window if window > 0 else 0.0
                data_wait = 0.0
                tic = time.time()
                mlog.log(global_step, epoch=epoch, loss=float(metrics["loss"]),
                         top1=float(metrics.get("top1", float("nan"))),
                         samples_per_sec=speed,
                         data_wait_frac=round(wait_frac, 4))
            if (t_cfg.checkpoint_every_steps
                    and global_step % t_cfg.checkpoint_every_steps == 0):
                # Mid-epoch save records epoch-1 (like the graceful-stop path)
                # so resume re-runs the interrupted epoch rather than silently
                # skipping its remaining batches.
                ckpt.save(global_step, state,
                          {"epoch": epoch - 1})

        if loss_avg.weight == 0 and metrics is not None:
            # short epochs can finish between log_every sync points; pull
            # the last step's metrics once so the summary is never nan
            last = jax.device_get(metrics)
            loss_avg.update(last["loss"], t_cfg.batch_size)
            if "top1" in last:
                top1_avg.update(last["top1"], t_cfg.batch_size)
        log.info("epoch %d done in %.1fs loss=%.4f top1=%.4f", epoch,
                 time.time() - epoch_start, loss_avg.value, top1_avg.value)
        ckpt.save(global_step, state, {"epoch": epoch})
        if eval_fn is not None:
            scalars = eval_fn(state, epoch)
            mlog.log(global_step, **{f"eval_{k}": v for k, v in scalars.items()})

    return state, global_step
