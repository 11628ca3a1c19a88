"""Checkpoint / resume via orbax (SURVEY.md C15, §6.4).

Improves on the reference's per-epoch ``save_parameters`` (weights-only,
non-atomic): full train state (params, BN stats, optimizer state, step) at
step granularity, atomic directory swaps, bounded retention, plus a
weights-only export for the tag()/serving path.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from fastvideotagging_tpu.train.state import TrainState


class NullCheckpointManager:
    """Checkpointing disabled (TrainConfig.checkpoint_dir == "").

    Useful for throwaway/benchmark runs: a per-epoch full-state save costs a
    ~260 MB device_get through the axon tunnel, which can dominate short
    epochs.
    """

    def save(self, step, state, extra=None):
        pass

    def latest_step(self):
        return None

    def restore(self, target_state, step=None):
        return None, None

    def restore_weights(self, step=None):
        return None, None

    def wait(self):
        pass


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state: TrainState, extra: dict | None = None) -> None:
        """extra: fixed schema {"epoch": int} (orbax restore needs a static tree).

        The device->host transfer happens HERE, not at call sites: through the
        axon tunnel a full-state device_get costs seconds, and evaluating it
        eagerly as a call argument would charge that cost even to disabled
        (NullCheckpointManager) runs.
        """
        epoch = int((extra or {}).get("epoch", 0))
        if jax.process_count() > 1:
            # Multi-host: device_get is ILLEGAL for params sharded across
            # processes (TP spanning hosts) and unnecessary anyway — orbax
            # writes each shard from its owning host; restore rebuilds the
            # global arrays from the shardings carried by the abstract tree
            # (to_shape_dtype_struct keeps .sharding).
            host_state = state
        else:
            host_state = jax.device_get(state)
        payload = {"state": host_state,
                   "epoch": np.asarray(epoch, np.int64)}
        # Every call here is an intentional save; a SECOND save at the SAME
        # step must win (it happens when checkpoint_every_steps divides the
        # epoch length: the mid-epoch save records epoch-1 and the epoch-end
        # save records epoch — orbax would otherwise keep the first and a
        # later --resume would replay the whole completed epoch). Orbax
        # raises StepAlreadyExistsError even with force, so replace.
        if step in self._mgr.all_steps():
            self._mgr.wait_until_finished()
            self._mgr.delete(step)
        self._mgr.save(step, args=ocp.args.StandardSave(payload), force=True)

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, target_state: TrainState, step: int | None = None):
        """Restore into the structure of ``target_state``; returns (state, extra)."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None, None
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target_state)
        restored = self._mgr.restore(
            step,
            args=ocp.args.StandardRestore(
                {"state": abstract, "epoch": np.asarray(0, np.int64)}
            ),
        )
        return restored["state"], {"epoch": int(restored["epoch"])}

    def restore_weights(self, step: int | None = None):
        """Weights-only restore: ``({"params", "batch_stats"}, step)`` or
        ``(None, None)``.

        For eval/serving consumers. A typed full-state restore needs the
        optimizer tree to MATCH the one the checkpoint was trained with
        (--clip-grad-norm / --grad-accum each add an opt-state node), which
        an eval CLI has no business knowing; the untyped restore reads the
        saved schema as-is and drops opt_state.
        """
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None, None
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore())
        state = restored["state"]
        return ({"params": state["params"],
                 "batch_stats": state["batch_stats"]}, int(state["step"]))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def export_weights(path: str, params: Any, batch_stats: Any) -> None:
    """Weights-only export for inference (the tag() path)."""
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path),
              {"params": params, "batch_stats": batch_stats}, force=True)
    ckpt.wait_until_finished()


def load_weights(path: str, abstract: Any | None = None) -> dict:
    ckpt = ocp.StandardCheckpointer()
    if abstract is not None:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract)
    return ckpt.restore(os.path.abspath(path), target=abstract)
