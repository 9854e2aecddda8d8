"""Margin-based classifier heads as pure functions over a weight matrix.

Ports the semantics of reference ``loss/arcface.py`` and
``loss/metric_learning.py`` (ArcFace, CircleLoss, Cosface, AMSoftmax,
ContrastiveLoss). In the reference these are nn.Modules holding their own
(num_classes × feat) weight; here the weight is an explicit argument so the
functions stay pure and the weight lives wherever the TrainState puts it.
All return *logits* (to be fed to cross-entropy), matching the reference,
except ``contrastive_loss`` which returns a scalar loss.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .triplet import normalize


def _cosine_logits(features: jax.Array, weight: jax.Array) -> jax.Array:
    """cos(θ) = norm(x) · norm(W)ᵀ with W of shape (num_classes, feat)."""
    return jnp.dot(
        normalize(features.astype(jnp.float32)),
        normalize(weight.astype(jnp.float32)).T,
        preferred_element_type=jnp.float32,
    )


def arcface_logits(
    features: jax.Array,
    weight: jax.Array,
    labels: jax.Array,
    s: float = 30.0,
    m: float = 0.50,
    easy_margin: bool = False,
    ls_eps: float = 0.0,
) -> jax.Array:
    """ArcFace cos(θ+m) logits (ref arcface.py:8-50, metric_learning.py:76-120)."""
    cosine = _cosine_logits(features, weight)
    sine = jnp.sqrt(jnp.clip(1.0 - jnp.square(cosine), 0.0, 1.0))
    phi = cosine * math.cos(m) - sine * math.sin(m)
    if easy_margin:
        phi = jnp.where(cosine > 0, phi, cosine)
    else:
        th = math.cos(math.pi - m)
        mm = math.sin(math.pi - m) * m
        phi = jnp.where(cosine > th, phi, cosine - mm)
    one_hot = jax.nn.one_hot(labels, weight.shape[0], dtype=jnp.float32)
    if ls_eps > 0:
        one_hot = (1 - ls_eps) * one_hot + ls_eps / weight.shape[0]
    return s * (one_hot * phi + (1.0 - one_hot) * cosine)


def cosface_logits(
    features: jax.Array,
    weight: jax.Array,
    labels: jax.Array,
    s: float = 30.0,
    m: float = 0.30,
) -> jax.Array:
    """CosFace cos(θ)−m logits (ref metric_learning.py:124-163)."""
    cosine = _cosine_logits(features, weight)
    one_hot = jax.nn.one_hot(labels, weight.shape[0], dtype=jnp.float32)
    return s * (one_hot * (cosine - m) + (1.0 - one_hot) * cosine)


def amsoftmax_logits(
    features: jax.Array,
    weight: jax.Array,
    labels: jax.Array,
    s: float = 30.0,
    m: float = 0.30,
) -> jax.Array:
    """AMSoftmax logits (ref metric_learning.py:166-188). weight: (feat, C)."""
    x = features.astype(jnp.float32)
    x = x / jnp.clip(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    w = weight.astype(jnp.float32)
    w = w / jnp.clip(jnp.linalg.norm(w, axis=0, keepdims=True), 1e-12)
    costh = jnp.dot(x, w, preferred_element_type=jnp.float32)
    delt = jax.nn.one_hot(labels, weight.shape[1], dtype=jnp.float32) * m
    return s * (costh - delt)


def circle_logits(
    features: jax.Array,
    weight: jax.Array,
    labels: jax.Array,
    s: float = 256.0,
    m: float = 0.25,
) -> jax.Array:
    """CircleLoss class logits (ref arcface.py:52-79)."""
    sim = _cosine_logits(features, weight)
    sim_sg = jax.lax.stop_gradient(sim)
    alpha_p = jnp.clip(-sim_sg + 1 + m, min=0.0)
    alpha_n = jnp.clip(sim_sg + m, min=0.0)
    s_p = s * alpha_p * (sim - (1 - m))
    s_n = s * alpha_n * (sim - m)
    one_hot = jax.nn.one_hot(labels, weight.shape[0], dtype=jnp.float32)
    return one_hot * s_p + (1.0 - one_hot) * s_n


def contrastive_loss(
    features: jax.Array, labels: jax.Array, margin: float = 0.3
) -> jax.Array:
    """ContrastiveLoss (ref metric_learning.py:9-42), vectorized.

    Per anchor: sum(1 − sim) over positive pairs with sim < 1 (excluding
    self-similarity ≈ 1) plus sum(sim) over negatives with sim > margin.
    """
    sim = jnp.dot(
        features.astype(jnp.float32), features.astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    )
    same = labels[:, None] == labels[None, :]
    pos_mask = same & (sim < 1.0)
    neg_mask = (~same) & (sim > margin)
    pos_loss = jnp.sum(jnp.where(pos_mask, 1.0 - sim, 0.0), axis=1)
    neg_loss = jnp.sum(jnp.where(neg_mask, sim, 0.0), axis=1)
    return jnp.mean(pos_loss + neg_loss)
