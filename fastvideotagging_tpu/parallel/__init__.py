"""Mesh / partitioning: the comm "component" of the rebuild (SURVEY.md §6.8).

There is no user-visible message-passing backend on TPU — collectives are XLA
ops compiled onto ICI. This package owns the mesh axes and sharding helpers.
"""

from fastvideotagging_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
