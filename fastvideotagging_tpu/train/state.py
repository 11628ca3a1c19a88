"""Train state: params + batch_stats + optimizer state (SURVEY.md C12/C15).

Extends the flax TrainState with BatchNorm running statistics so the whole
training state is one checkpointable pytree.
"""

from __future__ import annotations

from typing import Any

import flax
import jax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_train_state(model, tx, rng: jax.Array, sample_input) -> TrainState:
    """Initialize params/batch_stats with a jitted init (eager is very slow)."""
    variables = jax.jit(model.init, static_argnames="train")(
        rng, sample_input, train=False
    )
    # Unbox flax partitioning metadata (channel-sharded models); the
    # PartitionSpecs are recovered via parallel.mesh.param_partition_specs
    # from a separate (shape-only) init when placing the state on a mesh.
    variables = flax.linen.meta.unbox(variables)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", flax.core.freeze({})),
        tx=tx,
    )
