"""Center loss (reference ``loss/center_loss.py``).

The centers are a learned (num_classes × feat_dim) parameter updated by a
*separate* SGD optimizer whose gradients the reference rescales by
``1/CENTER_LOSS_WEIGHT`` (ref ``processor/processor.py:80-84``). Here the
centers live in the TrainState's auxiliary params and the solver module
replicates that scaling; the loss itself is a pure function.

The reference computes the full (B × num_classes) distance matrix and masks
to each sample's own class — equivalent to the direct per-sample squared
distance computed here (clamped to [1e-12, 1e12] as the reference does).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_centers(key: jax.Array, num_classes: int, feat_dim: int = 2048) -> jax.Array:
    return jax.random.normal(key, (num_classes, feat_dim), jnp.float32)


def center_loss(centers: jax.Array, x: jax.Array, labels: jax.Array) -> jax.Array:
    x = x.astype(jnp.float32)
    c = centers[labels]
    sq = (
        jnp.sum(jnp.square(x), axis=1)
        + jnp.sum(jnp.square(c), axis=1)
        - 2.0 * jnp.sum(x * c, axis=1)
    )
    sq = jnp.clip(sq, 1e-12, 1e12)
    return jnp.mean(sq)
