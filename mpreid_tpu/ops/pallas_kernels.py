"""Pallas TPU kernels for the hot eval/mining ops.

1. ``fused_batch_hard`` — the training hot path (SURVEY.md §2.1 north-star):
   pairwise euclidean distance + batch-hard positive/negative mining in ONE
   kernel. The B×B distance matrix lives and dies in VMEM — it is never
   materialized in HBM. The matmul rides the MXU; mask/max/min ride the VPU.
   A custom VJP routes gradients through the selected hard pairs only, so
   the backward pass is two cheap gathers instead of re-running the matrix.

2. ``l1_cross`` — the re-ranking hot loop: pairwise L1 distances between the
   k-reciprocal weight rows (Jaccard min-sum identity, see ops/reranking.py).
   Tiled (TQ × TG × K-chunks) accumulation, bf16 loads with fp32
   accumulation, grid-revisited output block.

Both fall back to pure-XLA implementations off-TPU (and power the unit
tests via ``interpret=True``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# fused distmat + batch-hard mining
# ---------------------------------------------------------------------------

def _batch_hard_kernel(feats_ref, labels_ref, valid_ref,
                       ap_ref, an_ref, p_ref, n_ref):
    f = feats_ref[:].astype(jnp.float32)
    labels = labels_ref[:]          # (B, 1) int32
    valid = valid_ref[:]            # (B, 1) int32 — 0 for padding rows

    sq = jnp.sum(f * f, axis=1, keepdims=True)
    d2 = sq + sq.T - 2.0 * jnp.dot(f, f.T, preferred_element_type=jnp.float32)
    d = jnp.sqrt(jnp.clip(d2, min=1e-12))

    same = labels == labels.T
    both_valid = (valid * valid.T) > 0
    is_pos = same & both_valid
    is_neg = (~same) & both_valid

    neg_inf = jnp.float32(-jnp.inf)
    pos_inf = jnp.float32(jnp.inf)
    masked_pos = jnp.where(is_pos, d, neg_inf)
    masked_neg = jnp.where(is_neg, d, pos_inf)

    ap_ref[:] = jnp.max(masked_pos, axis=1, keepdims=True)
    an_ref[:] = jnp.min(masked_neg, axis=1, keepdims=True)
    p_ref[:] = jnp.argmax(masked_pos, axis=1, keepdims=True).astype(jnp.int32)
    n_ref[:] = jnp.argmin(masked_neg, axis=1, keepdims=True).astype(jnp.int32)


def _batch_hard_forward(feats: jax.Array, labels: jax.Array, interpret: bool):
    b, dim = feats.shape
    bp = _round_up(b, 8)
    dp = _round_up(dim, 128)
    feats_p = jnp.pad(feats.astype(jnp.float32), ((0, bp - b), (0, dp - dim)))
    labels_p = jnp.pad(labels.astype(jnp.int32), (0, bp - b),
                       constant_values=-1)[:, None]
    valid_p = jnp.pad(jnp.ones((b,), jnp.int32), (0, bp - b))[:, None]

    out_shapes = (
        jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        jax.ShapeDtypeStruct((bp, 1), jnp.int32),
        jax.ShapeDtypeStruct((bp, 1), jnp.int32),
    )
    ap, an, p, n = pl.pallas_call(
        _batch_hard_kernel,
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(4)),
        interpret=interpret,
    )(feats_p, labels_p, valid_p)
    return ap[:b, 0], an[:b, 0], p[:b, 0], n[:b, 0]


def _batch_hard_xla(feats: jax.Array, labels: jax.Array):
    from mpreid_tpu.losses.triplet import euclidean_dist

    f = feats.astype(jnp.float32)
    d = euclidean_dist(f, f)
    is_pos = labels[:, None] == labels[None, :]
    masked_pos = jnp.where(is_pos, d, -jnp.inf)
    masked_neg = jnp.where(~is_pos, d, jnp.inf)
    ap = jnp.max(masked_pos, axis=1)
    an = jnp.min(masked_neg, axis=1)
    p = jnp.argmax(masked_pos, axis=1)
    n = jnp.argmin(masked_neg, axis=1)
    return ap, an, p, n


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_batch_hard(feats: jax.Array, labels: jax.Array,
                     use_pallas: bool = True) -> Tuple[jax.Array, jax.Array]:
    """→ (dist_ap, dist_an): hardest positive/negative distance per anchor."""
    ap, an, _, _ = _fused_batch_hard_all(feats, labels, use_pallas)
    return ap, an


def _fused_batch_hard_all(feats, labels, use_pallas):
    if use_pallas and _on_tpu():
        return _batch_hard_forward(feats, labels, interpret=False)
    return _batch_hard_xla(feats, labels)


def _fbh_fwd(feats, labels, use_pallas):
    ap, an, p, n = _fused_batch_hard_all(feats, labels, use_pallas)
    return (ap, an), (feats, ap, an, p, n)


def _fbh_bwd(use_pallas, residuals, cotangents):
    feats, ap, an, p, n = residuals
    g_ap, g_an = cotangents
    f = feats.astype(jnp.float32)
    b = f.shape[0]

    def pair_grad(g, idx, dist):
        # d = ||f_i − f_j||; ∂d/∂f_i = (f_i − f_j)/d, ∂d/∂f_j = −(f_i − f_j)/d
        diff = f - f[idx]
        u = (g / jnp.maximum(dist, 1e-12))[:, None] * diff
        scatter = jnp.zeros_like(f).at[idx].add(-u)
        return u + scatter

    df = pair_grad(g_ap, p, ap) + pair_grad(g_an, n, an)
    return df.astype(feats.dtype), None


fused_batch_hard.defvjp(_fbh_fwd, _fbh_bwd)


def batch_hard_triplet_loss(
    feats: jax.Array,
    labels: jax.Array,
    margin: float | None = None,
    use_pallas: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Triplet loss over the fused kernel (drop-in for losses.triplet_loss)."""
    ap, an = fused_batch_hard(feats, labels, use_pallas)
    if margin is not None:
        loss = jnp.mean(jnp.maximum(ap - an + margin, 0.0))
    else:
        loss = jnp.mean(jax.nn.softplus(ap - an))
    return loss, ap, an


# ---------------------------------------------------------------------------
# tiled L1 cross-distance (re-ranking Jaccard)
# ---------------------------------------------------------------------------

def _l1_kernel(a_ref, b_ref, out_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    b = b_ref[:].astype(jnp.float32)   # (TG, KC)
    tq = a_ref.shape[0]

    def row(i, carry):
        a_row = a_ref[pl.ds(i, 1), :].astype(jnp.float32)        # (1, KC)
        diff = jnp.sum(jnp.abs(a_row - b), axis=1)                # (TG,)
        out_ref[pl.ds(i, 1), :] += diff[None, :]
        return carry

    jax.lax.fori_loop(0, tq, row, 0)


def l1_cross_pallas(
    vq: jax.Array,
    vg: jax.Array,
    tile_q: int = 128,
    tile_g: int = 128,
    chunk_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Pairwise L1 distances between rows of vq (Q,N) and vg (G,N)."""
    q, n = vq.shape
    g = vg.shape[0]
    qp, gp, np_ = _round_up(q, tile_q), _round_up(g, tile_g), _round_up(n, chunk_k)
    vq_p = jnp.pad(vq, ((0, qp - q), (0, np_ - n)))
    vg_p = jnp.pad(vg, ((0, gp - g), (0, np_ - n)))

    grid = (qp // tile_q, gp // tile_g, np_ // chunk_k)
    out = pl.pallas_call(
        _l1_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, chunk_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_g, chunk_k), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_q, tile_g), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp, gp), jnp.float32),
        interpret=interpret,
    )(vq_p, vg_p)
    return out[:q, :g]


def l1_cross(vq: jax.Array, vg: jax.Array) -> jax.Array:
    """Dispatch: Pallas on TPU, chunked XLA elsewhere."""
    if _on_tpu():
        return l1_cross_pallas(vq, vg)
    from .reranking import _l1_cross as xla_l1

    return xla_l1(vq, vg)


# ---------------------------------------------------------------------------
# tiled elementwise min-sum (sparse-V re-ranking Jaccard)
# ---------------------------------------------------------------------------
#
# Same tiling as the L1 kernel with Σ|a−b| replaced by Σ min(a,b). The
# sparse re-ranking path (ops/reranking_sparse.py) computes the min-sum
# directly because its truncated rows need not sum to 1, breaking the
# minsum = 1 − L1/2 identity the dense path uses.

def _minsum_kernel(a_ref, b_ref, out_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    b = b_ref[:].astype(jnp.float32)   # (TG, KC)
    tq = a_ref.shape[0]

    def row(i, carry):
        a_row = a_ref[pl.ds(i, 1), :].astype(jnp.float32)        # (1, KC)
        ms = jnp.sum(jnp.minimum(a_row, b), axis=1)               # (TG,)
        out_ref[pl.ds(i, 1), :] += ms[None, :]
        return carry

    jax.lax.fori_loop(0, tq, row, 0)


def minsum_cross_pallas(
    vq: jax.Array,
    vg: jax.Array,
    tile_q: int = 128,
    tile_g: int = 128,
    chunk_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Pairwise Σₖ min(vqᵢₖ, vgⱼₖ) between rows of vq (Q,N) and vg (G,N)."""
    q, n = vq.shape
    g = vg.shape[0]
    qp, gp, np_ = _round_up(q, tile_q), _round_up(g, tile_g), _round_up(n, chunk_k)
    vq_p = jnp.pad(vq, ((0, qp - q), (0, np_ - n)))
    vg_p = jnp.pad(vg, ((0, gp - g), (0, np_ - n)))

    grid = (qp // tile_q, gp // tile_g, np_ // chunk_k)
    out = pl.pallas_call(
        _minsum_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, chunk_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_g, chunk_k), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_q, tile_g), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp, gp), jnp.float32),
        interpret=interpret,
    )(vq_p, vg_p)
    return out[:q, :g]


def _minsum_cross_xla(vq: jax.Array, vg: jax.Array, chunk: int = 128) -> jax.Array:
    q = vq.shape[0]
    pad = (-q) % chunk
    vq_p = jnp.pad(vq, ((0, pad), (0, 0)))
    blocks = vq_p.reshape(-1, chunk, vq.shape[1])

    def one(block):
        return jnp.sum(jnp.minimum(block[:, None, :], vg[None, :, :]), axis=-1)

    out = jax.lax.map(one, blocks)
    return out.reshape(-1, vg.shape[0])[:q]


def minsum_cross(vq: jax.Array, vg: jax.Array) -> jax.Array:
    """Dispatch: Pallas on TPU, chunked XLA elsewhere."""
    if _on_tpu():
        return minsum_cross_pallas(vq, vg)
    return _minsum_cross_xla(vq, vg)
