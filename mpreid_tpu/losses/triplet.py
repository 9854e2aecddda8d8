"""Batch-hard triplet loss as pure JAX functions.

Behavioral contract (reference ``loss/triplet_loss.py``):

* ``euclidean_dist`` (ref ``:16-31``): ‖x‖² + ‖y‖² − 2x·yᵀ, clamped to 1e-12
  and sqrt'd,
* ``hard_example_mining`` (ref ``:51-103``): per-anchor max over positives and
  min over negatives. The reference relies on a boolean-mask ``view(N,-1)``
  trick that assumes exactly K positives per anchor; we use a shape-static
  masked max/min which is exactly equivalent for PK-sampled batches and safe
  for arbitrary label layouts,
* ``TripletLoss`` (ref ``:106-134``): MarginRankingLoss with margin, or
  SoftMarginLoss when margin is None; optional ``hard_factor`` scaling.

The (B×B) distance matrix + mining runs fused inside the jitted train step;
XLA maps the matmul onto the MXU and fuses the mask/reduce elementwise ops.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def normalize(x: jax.Array, axis: int = -1) -> jax.Array:
    """Unit-length normalize (ref triplet_loss.py:6-14)."""
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + 1e-12)


def euclidean_dist(x: jax.Array, y: jax.Array) -> jax.Array:
    xx = jnp.sum(jnp.square(x), axis=1, keepdims=True)
    yy = jnp.sum(jnp.square(y), axis=1, keepdims=True).T
    dist = xx + yy - 2.0 * jnp.dot(
        x, y.T, preferred_element_type=jnp.float32
    )
    return jnp.sqrt(jnp.clip(dist, min=1e-12))


def cosine_dist(x: jax.Array, y: jax.Array) -> jax.Array:
    """(1 − cos)/2 distance (ref triplet_loss.py:34-49)."""
    x_norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=1, keepdims=True))
    y_norm = jnp.sqrt(jnp.sum(jnp.square(y), axis=1, keepdims=True)).T
    sim = jnp.dot(x, y.T, preferred_element_type=jnp.float32) / (x_norm * y_norm)
    return (1.0 - sim) / 2.0


def hard_example_mining(
    dist_mat: jax.Array, labels: jax.Array, return_inds: bool = False
):
    """Batch-hard positive/negative mining (ref triplet_loss.py:51-103)."""
    n = dist_mat.shape[0]
    is_pos = labels[:, None] == labels[None, :]
    is_neg = ~is_pos

    neg_inf = jnp.full_like(dist_mat, -jnp.inf)
    pos_inf = jnp.full_like(dist_mat, jnp.inf)
    dist_ap = jnp.max(jnp.where(is_pos, dist_mat, neg_inf), axis=1)
    dist_an = jnp.min(jnp.where(is_neg, dist_mat, pos_inf), axis=1)

    if return_inds:
        p_inds = jnp.argmax(jnp.where(is_pos, dist_mat, neg_inf), axis=1)
        n_inds = jnp.argmin(jnp.where(is_neg, dist_mat, pos_inf), axis=1)
        return dist_ap, dist_an, p_inds, n_inds
    return dist_ap, dist_an


def triplet_loss(
    global_feat: jax.Array,
    labels: jax.Array,
    margin: Optional[float] = None,
    normalize_feature: bool = False,
    hard_factor: float = 0.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """→ (loss, dist_ap, dist_an). Mirrors reference TripletLoss.__call__."""
    feat = global_feat.astype(jnp.float32)
    if normalize_feature:
        feat = normalize(feat)
    dist_mat = euclidean_dist(feat, feat)
    dist_ap, dist_an = hard_example_mining(dist_mat, labels)

    dist_ap = dist_ap * (1.0 + hard_factor)
    dist_an = dist_an * (1.0 - hard_factor)

    if margin is not None:
        # MarginRankingLoss(y=1): mean(max(0, ap − an + margin))
        loss = jnp.mean(jnp.maximum(dist_ap - dist_an + margin, 0.0))
    else:
        # SoftMarginLoss on (an − ap) with target 1: mean(log(1 + exp(ap − an)))
        loss = jnp.mean(jax.nn.softplus(dist_ap - dist_an))
    return loss, dist_ap, dist_an
