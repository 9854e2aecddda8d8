"""Query×gallery distance matrices, HBM-resident.

The reference computes the eval distmat on CPU after collecting features
host-side (reference ``utils/metrics.py:7-13,107-111``). Here the distmat is
computed on-device: the ‖q‖²+‖g‖²−2q·gᵀ decomposition rides the MXU, and for
multi-chip eval the gallery axis is sharded over the mesh (see
parallel/sharded_eval.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def euclidean_squared_distmat(qf: jax.Array, gf: jax.Array) -> jax.Array:
    """Squared euclidean distance (ref metrics.py:7-13 — note: the reference
    eval distmat is *squared* distance; only the triplet loss takes sqrt)."""
    qf = qf.astype(jnp.float32)
    gf = gf.astype(jnp.float32)
    qq = jnp.sum(jnp.square(qf), axis=1, keepdims=True)
    gg = jnp.sum(jnp.square(gf), axis=1, keepdims=True).T
    return qq + gg - 2.0 * jnp.dot(qf, gf.T, preferred_element_type=jnp.float32)


def cosine_distmat(qf: jax.Array, gf: jax.Array, epsilon: float = 1e-5) -> jax.Array:
    """Arc-cosine distance (ref metrics.py:15-25)."""
    qf = qf.astype(jnp.float32)
    gf = gf.astype(jnp.float32)
    sim = jnp.dot(qf, gf.T, preferred_element_type=jnp.float32)
    qn = jnp.linalg.norm(qf, axis=1, keepdims=True)
    gn = jnp.linalg.norm(gf, axis=1, keepdims=True)
    sim = sim / (qn @ gn.T)
    return jnp.arccos(jnp.clip(sim, -1 + epsilon, 1 - epsilon))
