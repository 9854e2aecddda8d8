"""Supervised contrastive (i2t/t2i) loss (reference ``loss/supcontrast.py``).

CLIP-style supervised contrastive between two feature banks with label-mask
positives and temperature 1.0 (ref ``supcontrast.py:10-29``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def supcon_loss(
    text_features: jax.Array,
    image_features: jax.Array,
    t_labels: jax.Array,
    i_labels: jax.Array,
    temperature: float = 1.0,
) -> jax.Array:
    mask = (t_labels[:, None] == i_labels[None, :]).astype(jnp.float32)
    logits = (
        jnp.dot(
            text_features.astype(jnp.float32),
            image_features.astype(jnp.float32).T,
            preferred_element_type=jnp.float32,
        )
        / temperature
    )
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))
    log_prob = logits - jnp.log(jnp.sum(jnp.exp(logits), axis=1, keepdims=True))
    mean_log_prob_pos = jnp.sum(mask * log_prob, axis=1) / jnp.sum(mask, axis=1)
    return -jnp.mean(mean_log_prob_pos)
