"""Loss functions / output heads (SURVEY.md C10).

Both losses compute in float32 regardless of model compute dtype and reduce by
mean over the batch. ``weights`` masks padding examples (0/1 per example) so
sharded batches with ragged tails keep exact semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def softmax_cross_entropy(
    logits: jax.Array, labels: jax.Array, weights: jax.Array | None = None
) -> jax.Array:
    """Single-label CE. logits (B, K) f32, labels (B,) int."""
    losses = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels
    )
    return _weighted_mean(losses, weights)


def sigmoid_bce(
    logits: jax.Array, multihot: jax.Array, weights: jax.Array | None = None
) -> jax.Array:
    """Multi-label sigmoid BCE. logits (B, K) f32, multihot (B, K) {0,1}."""
    losses = optax.sigmoid_binary_cross_entropy(
        logits.astype(jnp.float32), multihot.astype(jnp.float32)
    ).mean(axis=-1)
    return _weighted_mean(losses, weights)


def _weighted_mean(losses: jax.Array, weights: jax.Array | None) -> jax.Array:
    if weights is None:
        return losses.mean()
    weights = weights.astype(jnp.float32)
    return (losses * weights).sum() / jnp.maximum(weights.sum(), 1.0)


def predict_scores(logits: jax.Array, multilabel: bool) -> jax.Array:
    """Logits -> per-class scores: sigmoid (multilabel) or softmax, in f32."""
    logits = logits.astype(jnp.float32)
    return jax.nn.sigmoid(logits) if multilabel else jax.nn.softmax(logits, axis=-1)
