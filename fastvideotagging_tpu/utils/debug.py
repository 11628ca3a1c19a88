"""Numerics debugging (SURVEY.md §6.2): NaN/Inf detection for train state
and a checkify wrapper for the train step.

The reference had no sanitizers; the TPU-native equivalents are (a) Pallas
interpret mode (exercised by the CPU test suite), (b) these finite-ness
checks, usable as a periodic assertion in long runs.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def nonfinite_report(tree: Any, max_entries: int = 10) -> list[str]:
    """Paths of leaves containing NaN/Inf (host-side; syncs the tree)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not hasattr(leaf, "dtype") or not jnp.issubdtype(leaf.dtype,
                                                            jnp.floating):
            continue
        arr = np.asarray(jax.device_get(leaf))
        n_bad = int(np.size(arr) - np.isfinite(arr).sum())
        if n_bad:
            bad.append(f"{jax.tree_util.keystr(path)}: {n_bad} non-finite")
            if len(bad) >= max_entries:
                break
    return bad


def assert_all_finite(tree: Any, what: str = "tree") -> None:
    bad = nonfinite_report(tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {what}: {bad}")


def finite_guard(tree: Any) -> jax.Array:
    """In-graph scalar: True iff every float leaf is finite (cheap to log)."""
    oks = [
        jnp.isfinite(leaf).all()
        for leaf in jax.tree.leaves(tree)
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
    ]
    return jnp.stack(oks).all() if oks else jnp.asarray(True)


def debug_train_step(step_fn):
    """Wrap a train step: adds a 'finite' metric computed in-graph from the
    new params and loss; zero extra syncs."""

    def wrapped(state, batch, rng):
        new_state, metrics = step_fn(state, batch, rng)
        metrics = dict(metrics)
        metrics["finite"] = jnp.logical_and(
            finite_guard(new_state.params), jnp.isfinite(metrics["loss"])
        )
        return new_state, metrics

    return wrapped
