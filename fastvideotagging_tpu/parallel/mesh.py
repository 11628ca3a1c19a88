"""Device mesh construction and sharding helpers (SURVEY.md §3.3, N4).

The reference's data parallelism was ``split_and_load`` + NCCL allreduce via
the MXNet kvstore. The TPU-native equivalent is declarative: build a Mesh
with axes (data, model), annotate the batch as sharded over ``data`` and
params as replicated (or channel-sharded over ``model`` for the dual-pathway
stretch config), and let XLA's SPMD partitioner insert psum/all-gather over
ICI. One code path from 1 chip to N chips.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Multi-host entry (SURVEY.md §6.8 DCN tier): wraps
    jax.distributed.initialize; afterwards jax.devices() spans all hosts and
    make_mesh lays data-parallel groups across DCN automatically (XLA routes
    intra-slice collectives over ICI, inter-host over DCN)."""
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def make_mesh(
    data_parallel: int = -1,
    model_parallel: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a (data, model) mesh. data_parallel=-1 -> use all remaining devices.

    The device order follows jax.devices(), which enumerates ICI-adjacent
    chips contiguously — model-parallel groups land on neighboring chips so
    the channel all-gathers ride the fastest links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model_parallel < 1 or n % model_parallel != 0:
        raise ValueError(f"model_parallel={model_parallel} must divide {n} devices")
    if data_parallel == -1:
        data_parallel = n // model_parallel
    need = data_parallel * model_parallel
    if need > n:
        raise ValueError(
            f"data_parallel*model_parallel = {data_parallel}*{model_parallel} "
            f"> {n} available devices"
        )
    # An explicit smaller request uses the first `need` devices.
    grid = np.asarray(devices[:need]).reshape(data_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays) sharded over the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def _slice_bounds(sl: slice, size: int) -> tuple[int, int]:
    """Normalize a shard-index slice (None endpoints = full extent)."""
    return (0 if sl.start is None else sl.start,
            size if sl.stop is None else sl.stop)


def local_batch_rows(sharding: NamedSharding, batch_size: int) -> list[int]:
    """Global batch-row positions this process owns under ``sharding``.

    In a multi-controller run each process materializes ONLY the rows whose
    shards live on its addressable devices (SURVEY.md §6.8: the loader is
    per-host; the mesh is global). Single-process this is range(batch_size).
    Rows are positions within ONE global batch — they are the same for every
    batch because the sharding is fixed for the run.
    """
    rows: set[int] = set()
    for idx in sharding.addressable_devices_indices_map((batch_size,)).values():
        rows.update(range(*_slice_bounds(idx[0], batch_size)))
    return sorted(rows)


def global_batch_put(batch, sharding: NamedSharding, global_batch: int,
                     rows: list[int]):
    """Form global sharded arrays from process-local batch rows.

    ``batch`` is a pytree whose leading dim holds exactly ``rows`` (sorted
    global row positions); the other processes contribute their own rows.
    Uses jax.make_array_from_callback so each addressable shard is sliced
    from the local buffer — no cross-host data movement, the DCN carries
    only collectives (gradients), never input data.
    """
    pos = {r: i for i, r in enumerate(rows)}

    def put(x):
        gshape = (global_batch,) + tuple(x.shape[1:])

        def cb(index):
            start, stop = _slice_bounds(index[0], global_batch)
            try:
                sel = [pos[r] for r in range(start, stop)]
            except KeyError as e:  # pragma: no cover - misuse guard
                raise ValueError(
                    f"shard rows [{start},{stop}) not local (have {rows}); "
                    f"rows must come from local_batch_rows(sharding)") from e
            return x[sel]

        return jax.make_array_from_callback(gshape, sharding, cb)

    return jax.tree.map(put, batch)


def param_partition_specs(variables):
    """PartitionSpec tree from flax ``with_partitioning`` metadata (boxed
    variables as returned by model.init when modules set ``shard_axis``)."""
    import flax.linen as nn

    return nn.get_partition_spec(variables)


def shard_train_state(state, mesh: Mesh, param_specs=None):
    """Place a TrainState on the mesh: everything replicated except params
    (and via GSPMD propagation, the optimizer moments after step 1) following
    ``param_specs`` — the channel/tensor-parallel placement for [B:11]."""
    state = jax.device_put(state, replicated(mesh))
    if param_specs is not None:
        shardings = jax.tree.map(
            lambda s: NamedSharding(mesh, s), param_specs,
            is_leaf=lambda x: isinstance(x, P),
        )
        params = jax.tree.map(jax.device_put, state.params, shardings)
        state = state.replace(params=params)
    return state
