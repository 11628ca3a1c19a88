"""Tracing / profiling hooks (SURVEY.md §6.1).

The reference's only observability was samples/sec log lines; here:
* ``trace(logdir)`` — context manager around warm steps producing a
  TensorBoard/Perfetto trace via jax.profiler.
* ``StepTimer`` — wall-clock step timing with warmup exclusion and a
  readback-based sync (NOTE: jax.block_until_ready does not synchronize
  through the axon PJRT tunnel; only readback does).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/fvt_trace"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """Force execution of a pytree by reading back ONE element of one leaf
    (device_get of a whole array would ship it over the tunnel)."""
    leaf = jax.tree.leaves(tree)[0]
    float(leaf[(0,) * getattr(leaf, "ndim", 0)])


class StepTimer:
    """Accumulates per-step wall-clock with warmup exclusion.

    Every ``sync_every`` steps it syncs (readback) and credits the elapsed
    time; async dispatch between syncs keeps the device busy.
    """

    def __init__(self, warmup: int = 2, sync_every: int = 10):
        self.warmup = warmup
        self.sync_every = sync_every
        self.steps = 0
        self.timed_steps = 0
        self.total = 0.0
        self._tic = None

    def step(self, result_tree) -> None:
        self.steps += 1
        if self.steps == self.warmup:
            sync(result_tree)
            self._tic = time.perf_counter()
            return
        if self.steps > self.warmup and (
            (self.steps - self.warmup) % self.sync_every == 0
        ):
            sync(result_tree)
            now = time.perf_counter()
            self.total += now - self._tic
            self.timed_steps += self.sync_every
            self._tic = now

    @property
    def seconds_per_step(self) -> float:
        return self.total / self.timed_steps if self.timed_steps else float("nan")
