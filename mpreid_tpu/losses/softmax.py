"""Cross-entropy losses (reference ``loss/softmax_loss.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Plain mean CE over the batch (F.cross_entropy semantics)."""
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logprobs, targets[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def cross_entropy_label_smooth(
    logits: jax.Array, targets: jax.Array, num_classes: int, epsilon: float = 0.1
) -> jax.Array:
    """CrossEntropyLabelSmooth (ref softmax_loss.py:5-35).

    Smoothed one-hot targets, loss = (−targets · logprobs).mean(0).sum().
    """
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    one_hot = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
    smoothed = (1.0 - epsilon) * one_hot + epsilon / num_classes
    return jnp.sum(jnp.mean(-smoothed * logprobs, axis=0))


def label_smoothing_cross_entropy(
    logits: jax.Array, targets: jax.Array, smoothing: float = 0.1
) -> jax.Array:
    """LabelSmoothingCrossEntropy (ref softmax_loss.py:37-57)."""
    assert smoothing < 1.0
    confidence = 1.0 - smoothing
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logprobs, targets[:, None], axis=-1)[:, 0]
    smooth = -jnp.mean(logprobs, axis=-1)
    return jnp.mean(confidence * nll + smoothing * smooth)
