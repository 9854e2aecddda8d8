"""k-reciprocal re-ranking on TPU (XLA, static shapes).

The reference implementation (``utils/reranking.py:29-100``) is NumPy on CPU
with data-dependent sparse sets — unusable under XLA. This reformulation
keeps every set as a fixed-shape multi-hot row over the (Q+G) corpus so the
whole algorithm becomes boolean algebra + matmuls that ride the MXU:

  * membership:      F[i]  = multi-hot of i's (k1+1)-NN (top_k, static k)
  * reciprocity:     R     = F ∧ Fᵀ
  * half sets:       Rh    = Fh ∧ Fhᵀ            (k1/2 neighbors)
  * overlap counts:  C     = R · Rhᵀ             (one matmul)
  * expansion:       R*    = R ∨ [(R ∧ (C > ⅔·|Rh|)) · Rh > 0]
  * weights:         V     = rownorm(exp(−d) ∘ R*)
  * query expansion: V     ← S · V   with S the top-k2 averaging matrix
  * Jaccard:         since rows of V sum to 1,
                     Σₖ min(Vᵢₖ, Vⱼₖ) = 1 − ½‖Vᵢ−Vⱼ‖₁,
                     so the min-sum matrix is an L1 distance matrix,
                     computed in query×feature chunks to bound VMEM.

Validated element-wise against the NumPy oracle (``reranking_numpy.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .distmat import euclidean_squared_distmat


def _multi_hot(indices: jax.Array, n: int) -> jax.Array:
    """(N, K) index rows → (N, N) 0/1 float32 membership matrix."""
    rows = jnp.arange(indices.shape[0])[:, None]
    out = jnp.zeros((indices.shape[0], n), jnp.float32)
    return out.at[rows, indices].set(1.0)


def _l1_cross(
    vq: jax.Array, vg: jax.Array, chunk: int = 128
) -> jax.Array:
    """Pairwise L1 distances between rows of vq (Q,N) and vg (G,N).

    Chunked over queries so the (chunk, G, N) broadcast temporary stays
    bounded; XLA fuses the abs/sub/reduce into one pass per chunk.
    """
    q = vq.shape[0]
    pad = (-q) % chunk
    vq_p = jnp.pad(vq, ((0, pad), (0, 0)))
    blocks = vq_p.reshape(-1, chunk, vq.shape[1])

    def one(block):
        return jnp.sum(jnp.abs(block[:, None, :] - vg[None, :, :]), axis=-1)

    out = jax.lax.map(one, blocks)
    return out.reshape(-1, vg.shape[0])[:q]


def _minsum_quantized(vq: jax.Array, vg: jax.Array, levels: int = 32) -> jax.Array:
    """Approximate Σₖ min(vqᵢₖ, vgⱼₖ) via threshold decomposition on the MXU.

    min(a, b) = ∫₀^∞ [a ≥ t]·[b ≥ t] dt, so with thresholds t₁ < … < t_L the
    min-sum matrix is a sum of L rank-decomposed 0/1 matmuls:

        minsum ≈ Σ_l Δ_l · (1[vq ≥ t_l] @ 1[vg ≥ t_l]ᵀ)

    Each level is a bf16 matmul (0/1 is exact in bf16) with fp32
    accumulation — the whole Jaccard step becomes MXU work instead of the
    VPU-bound exact L1 pass, ~100× faster at Market-1501 gallery scale.
    Thresholds are quantiles of the nonzero V values (midpoint rule), so
    quantization error is bounded by the inter-quantile gaps.
    """
    # midpoint quadrature of minsum = ∫ count(t) dt over quantile-spaced
    # intervals [e_{l-1}, e_l] of the positive value mass (both sides sampled)
    floor = 1e-9
    sample = jnp.concatenate([
        vq[: min(vq.shape[0], 128)].reshape(-1),
        vg[: min(vg.shape[0], 128)].reshape(-1),
    ])
    pos = jnp.where(sample > floor, sample, jnp.nan)
    qs = jnp.linspace(0.0, 1.0, levels)
    edges = jnp.nan_to_num(jnp.nanquantile(pos, qs), nan=floor)
    edges = jnp.concatenate([jnp.zeros((1,), edges.dtype), edges])  # e₀ = 0
    lows, highs = edges[:-1], edges[1:]
    mids = jnp.maximum(0.5 * (lows + highs), floor)
    deltas = highs - lows

    def level(carry, args):
        t, d = args
        a = (vq >= t).astype(jnp.bfloat16)
        b = (vg >= t).astype(jnp.bfloat16)
        carry = carry + d * jnp.dot(a, b.T, preferred_element_type=jnp.float32)
        return carry, ()

    init = jnp.zeros((vq.shape[0], vg.shape[0]), jnp.float32)
    out, _ = jax.lax.scan(level, init, (mids, deltas))
    return out


@functools.partial(
    jax.jit, static_argnames=("k1", "k2", "lambda_value", "fast_minsum")
)
def re_ranking(
    qf: jax.Array,
    gf: jax.Array,
    k1: int = 50,
    k2: int = 15,
    lambda_value: float = 0.3,
    fast_minsum: bool = False,
) -> jax.Array:
    """Re-ranked (Q, G) distance matrix from query/gallery features.

    Same API as the reference's ``re_ranking(probFea, galFea, k1, k2, λ)``.
    ``fast_minsum=True`` swaps the exact L1 Jaccard step for the quantized
    MXU decomposition (see ``_minsum_quantized``) — large-gallery mode.
    """
    feat = jnp.concatenate([qf, gf], axis=0).astype(jnp.float32)
    num_q = qf.shape[0]
    n = feat.shape[0]

    orig = euclidean_squared_distmat(feat, feat)
    orig = (orig / jnp.max(orig, axis=0)).T

    # clamp neighbor counts to the corpus size (NumPy slicing in the
    # reference truncates silently for tiny galleries)
    k1 = min(k1, n - 1)
    k2 = min(k2, n)
    half = int(round(k1 / 2))
    k_top = max(k1 + 1, half + 1, k2)
    _, nn = jax.lax.top_k(-orig, k_top)

    f_full = _multi_hot(nn[:, : k1 + 1], n)
    f_half = _multi_hot(nn[:, : half + 1], n)
    r_full = f_full * f_full.T
    r_half = f_half * f_half.T

    overlap = jnp.dot(r_full, r_half.T, preferred_element_type=jnp.float32)
    half_sizes = jnp.sum(r_half, axis=1)
    cond = r_full * (overlap > (2.0 / 3.0) * half_sizes[None, :])
    expanded = jnp.clip(
        r_full + jnp.dot(cond, r_half, preferred_element_type=jnp.float32),
        0.0,
        1.0,
    )

    v = jnp.exp(-orig) * expanded
    v = v / jnp.sum(v, axis=1, keepdims=True)

    if k2 != 1:
        s = _multi_hot(nn[:, :k2], n) / k2
        v = jnp.dot(s, v, preferred_element_type=jnp.float32)

    if fast_minsum:
        min_sums = _minsum_quantized(v[:num_q], v[num_q:])
    else:
        # min-sum via the L1 identity (rows of v sum to 1). Pallas tiled
        # kernel on TPU (VMEM-blocked), chunked XLA elsewhere.
        from .pallas_kernels import l1_cross

        l1 = l1_cross(v[:num_q], v[num_q:])
        min_sums = 1.0 - 0.5 * l1
    jaccard = 1.0 - min_sums / (2.0 - min_sums)

    return jaccard * (1 - lambda_value) + orig[:num_q, num_q:] * lambda_value
