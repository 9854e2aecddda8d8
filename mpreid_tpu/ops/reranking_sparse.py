"""k-reciprocal re-ranking at beyond-HBM gallery scale (sparse V).

The dense TPU implementation (``reranking.py``) materializes several
(Q+G)² fp32 matrices; at MSMT17 scale (N≈94k) a single one is 35 GB —
over twice the chip's HBM. But V is ~k-sparse *by construction*: row p's
support is p's k-reciprocal set plus the accepted half-set expansions —
≤ (k1+1)(half+2) indices in theory, ~3·k1 in practice (the reference's own
fp16 + inverted-index formulation, ref ``utils/reranking.py:47,80-93``,
exploits exactly this sparsity on CPU).

This module never materializes an N×N matrix:

  1. **neighbors** — one blocked pass over row tiles of the (implicit)
     distmat: top-(k1+1) indices + raw distances + per-row max. O(N·k) HBM.
  2. **reciprocity** — blocked gather of the back-neighbor lists;
     membership masks of static width k1+1 / half+1.
  3. **expansion** — candidate slots (reciprocal set ∪ accepted half
     sets), sorted + deduplicated per row, compacted to a static width W;
     weights exp(−d/colmax) recomputed only for the compacted indices.
  4. **query expansion** — the k2 source rows are merged sparsely
     (sort by index + segmented sum), compacted to width W2.
  5. **min-sum** — gallery rows are densified a chunk at a time
     (unique-index scatter) against the dense query-row block:
     ``minsum="exact"`` runs the tiled Pallas/XLA elementwise-min kernel,
     ``minsum="quantized"`` the MXU threshold decomposition
     (``reranking._minsum_quantized``'s math) — O(Q·N) resident, never
     O(N²).

Static widths make the sparse sets XLA-compatible. Overflow (a row's true
set exceeding W/W2) drops the highest-sorted-index entries
deterministically and is *counted* — ``return_info=True`` reports how many
rows truncated so callers can widen. With no overflow the result is
element-wise equal to the NumPy oracle (``reranking_numpy.py``), pinned by
``tests/test_reranking_sparse.py``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _blocked(n: int, block: int) -> int:
    return (n + block - 1) // block


def _pad_rows(x: jax.Array, block: int, value) -> jax.Array:
    pad = (-x.shape[0]) % block
    if pad == 0:
        return x
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                   constant_values=value)


# ---------------------------------------------------------------------------
# stage 1: blocked neighbor lists
# ---------------------------------------------------------------------------

def _topk_neighbors(feat: jax.Array, k_top: int, block: int):
    """Per-row top-k of the (implicit) squared-euclidean distmat.

    Returns ``nn`` (N, k_top) int32 ascending-distance neighbor indices
    (self first), ``dtop`` (N, k_top) raw squared distances, and ``colmax``
    (N,) the per-row max distance. Mirrors the reference's
    ``original_dist/np.max(original_dist, axis=0)`` normalization
    (ref utils/reranking.py:36-44) — the distmat is symmetric, so the
    column max equals the row max and one blocked row pass suffices.
    """
    n, _ = feat.shape
    sq = jnp.sum(feat * feat, axis=1)
    feat_p = _pad_rows(feat, block, 0.0)
    sq_p = _pad_rows(sq[:, None], block, 0.0)[:, 0]
    rows = feat_p.reshape(-1, block, feat.shape[1])
    sqs = sq_p.reshape(-1, block)

    def one(args):
        f_b, sq_b = args
        d = sq_b[:, None] + sq[None, :] - 2.0 * jnp.dot(
            f_b, feat.T, preferred_element_type=jnp.float32
        )
        d = jnp.maximum(d, 0.0)
        rmax = jnp.max(d, axis=1)
        neg, idx = jax.lax.top_k(-d, k_top)
        return idx.astype(jnp.int32), -neg, rmax

    nn_b, dtop_b, rmax_b = jax.lax.map(one, (rows, sqs))
    nn = nn_b.reshape(-1, k_top)[:n]
    dtop = dtop_b.reshape(-1, k_top)[:n]
    colmax = rmax_b.reshape(-1)[:n]
    return nn, dtop, jnp.maximum(colmax, 1e-12)


# ---------------------------------------------------------------------------
# stage 2: reciprocity masks
# ---------------------------------------------------------------------------

def _reciprocal_mask(nn: jax.Array, k: int, block: int) -> jax.Array:
    """mask[a, i] = (a ∈ k-NN of nn[a, i])  for i < k+1 — blocked gathers."""
    n = nn.shape[0]
    cand = _pad_rows(nn[:, : k + 1], block, 0).reshape(-1, block, k + 1)
    row_ids = _pad_rows(
        jnp.arange(n, dtype=jnp.int32)[:, None], block, -1
    ).reshape(-1, block)

    def one(args):
        c_b, a_b = args                       # (B, K), (B,)
        back = nn[c_b, : k + 1]               # (B, K, K)
        return jnp.any(back == a_b[:, None, None], axis=-1)

    m = jax.lax.map(one, (cand, row_ids))
    return m.reshape(-1, k + 1)[:n]


# ---------------------------------------------------------------------------
# helpers: sorted dedup + static-width compaction
# ---------------------------------------------------------------------------

def _dedup_compact(idx_sorted, val_sorted, width, sentinel):
    """Row-wise: keep first-of-each-group entries of an index-sorted row,
    scatter them to the first ``width`` slots; count overflow.

    ``val_sorted`` may be None (indices only). Entries beyond ``width``
    drop deterministically (highest sorted index first dropped last —
    i.e. truncation keeps the lowest indices)."""
    b, wc = idx_sorted.shape
    valid = idx_sorted < sentinel
    first = jnp.concatenate(
        [jnp.ones((b, 1), bool),
         idx_sorted[:, 1:] != idx_sorted[:, :-1]], axis=1
    ) & valid
    pos = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1
    n_unique = jnp.sum(first.astype(jnp.int32), axis=1)
    overflow = jnp.maximum(n_unique - width, 0)
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], (b, wc))
    tgt = jnp.where(first, pos, width)  # non-first → dropped slot
    out_idx = jnp.full((b, width + 1), sentinel, idx_sorted.dtype)
    out_idx = out_idx.at[rows, jnp.minimum(tgt, width)].set(
        jnp.where(first, idx_sorted, sentinel)
    )[:, :width]
    if val_sorted is None:
        return out_idx, None, overflow
    out_val = jnp.zeros((b, width + 1), val_sorted.dtype)
    out_val = out_val.at[rows, jnp.minimum(tgt, width)].set(
        jnp.where(first, val_sorted, 0.0)
    )[:, :width]
    return out_idx, out_val, overflow


# ---------------------------------------------------------------------------
# stage 3: k-reciprocal expansion → sparse V0
# ---------------------------------------------------------------------------

def _expand_rows(feat, nn, colmax, rmask, hmask, k1, half, width, block):
    """Sparse V0: (idx (N, W) int32, val (N, W) f32, overflow (N,))."""
    n = feat.shape[0]
    sentinel = n
    k = k1 + 1
    h = half + 1
    sq = jnp.sum(feat * feat, axis=1)

    cand = _pad_rows(nn[:, :k], block, 0).reshape(-1, block, k)
    rm = _pad_rows(rmask, block, False).reshape(-1, block, k)
    row_ids = _pad_rows(
        jnp.arange(n, dtype=jnp.int32)[:, None], block, 0
    ).reshape(-1, block)

    def one(args):
        c_b, rm_b, a_b = args                   # (B,K) (B,K) (B,)
        # half sets of each reciprocal member
        hidx = nn[c_b, :h]                      # (B, K, H)
        hval = hmask[c_b] & rm_b[:, :, None]    # (B, K, H)
        # |Rh(b) ∩ R(a)|  >  2/3 |Rh(b)|
        r_set = jnp.where(rm_b, c_b, sentinel)  # (B, K)
        inter = jnp.any(
            hidx[:, :, :, None] == r_set[:, None, None, :], axis=-1
        ) & hval                                # (B, K, H)
        n_inter = jnp.sum(inter, axis=-1).astype(jnp.float32)
        n_half = jnp.sum(hval, axis=-1).astype(jnp.float32)
        accept = rm_b & (n_inter > (2.0 / 3.0) * n_half)

        slots = jnp.concatenate([
            r_set,
            jnp.where(accept[:, :, None] & hval, hidx, sentinel
                      ).reshape(c_b.shape[0], -1),
        ], axis=1)                              # (B, K + K·H)
        slots = jnp.sort(slots, axis=1)
        idx_c, _, overflow = _dedup_compact(slots, None, width, sentinel)

        # weights exp(−d/colmax[a]) on the compacted support only
        fa = feat[a_b]                          # (B, D)
        fc = feat[jnp.minimum(idx_c, n - 1)]    # (B, W, D)
        d = (sq[a_b][:, None] + sq[jnp.minimum(idx_c, n - 1)]
             - 2.0 * jnp.einsum("bd,bwd->bw", fa, fc,
                                preferred_element_type=jnp.float32))
        d = jnp.maximum(d, 0.0) / colmax[a_b][:, None]
        valid = idx_c < sentinel
        w = jnp.where(valid, jnp.exp(-d), 0.0)
        w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
        return idx_c, w.astype(jnp.float32), overflow

    idx_b, val_b, ovf_b = jax.lax.map(one, (cand, rm, row_ids))
    w = idx_b.shape[-1]
    return (idx_b.reshape(-1, w)[:n], val_b.reshape(-1, w)[:n],
            ovf_b.reshape(-1)[:n])


# ---------------------------------------------------------------------------
# stage 4: sparse local query expansion (k2-mean of V0 rows)
# ---------------------------------------------------------------------------

def _query_expand(idx0, val0, nn, k2, width2, block):
    """V1[a] = mean of V0 over a's k2-NN, merged sparsely."""
    n, w = idx0.shape
    sentinel = n
    if k2 == 1:
        return idx0, val0, jnp.zeros((n,), jnp.int32)

    nn2 = _pad_rows(nn[:, :k2], block, 0).reshape(-1, block, k2)

    def one(nn_b):
        gi = idx0[nn_b].reshape(nn_b.shape[0], -1)      # (B, k2·W)
        gv = (val0[nn_b] / k2).reshape(nn_b.shape[0], -1)
        order = jnp.argsort(gi, axis=1)
        gi = jnp.take_along_axis(gi, order, axis=1)
        gv = jnp.take_along_axis(gv, order, axis=1)
        # segmented sum of duplicate indices: csum difference at group ends
        valid = gi < sentinel
        last = jnp.concatenate(
            [gi[:, :-1] != gi[:, 1:], jnp.ones((gi.shape[0], 1), bool)],
            axis=1) & valid
        csum = jnp.cumsum(gv, axis=1)
        b = gi.shape[0]
        rows = jnp.broadcast_to(jnp.arange(b)[:, None], gi.shape)
        pos = jnp.cumsum(last.astype(jnp.int32), axis=1) - 1
        n_unique = jnp.sum(last.astype(jnp.int32), axis=1)
        overflow = jnp.maximum(n_unique - width2, 0)
        tgt = jnp.minimum(jnp.where(last, pos, width2), width2)
        idx_m = jnp.full((b, width2 + 1), sentinel, gi.dtype)
        idx_m = idx_m.at[rows, tgt].set(jnp.where(last, gi, sentinel))
        cs_m = jnp.zeros((b, width2 + 1), jnp.float32)
        cs_m = cs_m.at[rows, tgt].set(jnp.where(last, csum, 0.0))
        idx_m, cs_m = idx_m[:, :width2], cs_m[:, :width2]
        val_m = jnp.diff(cs_m, axis=1, prepend=0.0)
        val_m = jnp.where(idx_m < sentinel, val_m, 0.0)
        return idx_m, val_m, overflow

    idx_b, val_b, ovf_b = jax.lax.map(one, nn2)
    return (idx_b.reshape(-1, width2)[:n], val_b.reshape(-1, width2)[:n],
            ovf_b.reshape(-1)[:n])


# ---------------------------------------------------------------------------
# stage 5: chunked min-sum from sparse rows
# ---------------------------------------------------------------------------

def _densify(idx, val, n, dtype=jnp.float32):
    """(B, W) sparse rows → (B, n) dense; sentinel column n is dropped.

    Real indices are unique per row by construction; sentinel slots all
    target column n with value 0.0 (initial value 0.0 too), so any write
    order yields the same result and the column is sliced away."""
    b, w = idx.shape
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], idx.shape)
    out = jnp.zeros((b, n + 1), dtype)
    out = out.at[rows, idx].set(val.astype(dtype))
    return out[:, :n]


def _minsum_exact(vq_dense, idxg, valg, n, g_chunk):
    """Exact Σ min over gallery chunks: densify each chunk and run the
    tiled elementwise-min kernel (Pallas on TPU)."""
    from .pallas_kernels import minsum_cross

    g = idxg.shape[0]
    idx_p = _pad_rows(idxg, g_chunk, n)
    val_p = _pad_rows(valg, g_chunk, 0.0)
    chunks_i = idx_p.reshape(-1, g_chunk, idxg.shape[1])
    chunks_v = val_p.reshape(-1, g_chunk, idxg.shape[1])

    def one(args):
        ic, vc = args
        return minsum_cross(vq_dense, _densify(ic, vc, n)).T  # (chunk, Q)

    ms = jax.lax.map(one, (chunks_i, chunks_v))
    return ms.reshape(-1, vq_dense.shape[0])[:g].T  # (Q, G)


def _quantile_thresholds(sample_vals, levels):
    floor = 1e-9
    pos = jnp.where(sample_vals > floor, sample_vals, jnp.nan)
    qs = jnp.linspace(0.0, 1.0, levels)
    edges = jnp.nan_to_num(jnp.nanquantile(pos, qs), nan=floor)
    edges = jnp.concatenate([jnp.zeros((1,), edges.dtype), edges])
    lows, highs = edges[:-1], edges[1:]
    mids = jnp.maximum(0.5 * (lows + highs), floor)
    return mids, highs - lows


def _minsum_quantized_chunk(vq_dense, vg_dense, mids, deltas):
    """(chunk, Q) min-sums via the MXU threshold decomposition
    (reranking._minsum_quantized math)."""

    def level(carry, lv):
        t, d = lv
        a = (vq_dense >= t).astype(jnp.bfloat16)
        b = (vg_dense >= t).astype(jnp.bfloat16)
        return carry + d * jnp.dot(
            b, a.T, preferred_element_type=jnp.float32), ()

    init = jnp.zeros((vg_dense.shape[0], vq_dense.shape[0]), jnp.float32)
    out, _ = jax.lax.scan(level, init, (mids, deltas))
    return out


def _final_blend_chunks(vq_dense, qf32, colmax_q, gf32, idxg, valg, n,
                        g_chunk, lambda_value, minsum, sample_vals):
    """The whole min-sum → Jaccard → λ-blend tail, one gallery chunk at a
    time — only ONE full (Q, G) matrix (the result) is ever resident.

    At MSMT17 scale the (Q, G) result alone is 3.8 GB fp32. The r4
    formulation (``lax.map`` over chunks + a final transpose) materialized
    THREE near-(Q,G) buffers — the stacked map output, its transpose, and
    the live chunk temporaries — for a ~15 GB peak that crashed the 16 GB
    chip's worker (reproduced standalone, r5). This version writes each
    chunk's transposed block straight into the (Q, G) result inside a
    ``fori_loop`` (XLA aliases the carry in place). The last chunk starts
    at ``G - g_chunk`` and OVERLAPS the previous one instead of padding:
    the overlapping columns recompute identical values, so no padded
    (Q, G_pad) buffer and no trailing slice-copy exist at all."""
    from .pallas_kernels import minsum_cross

    g = idxg.shape[0]
    g_chunk = min(g_chunk, g)
    n_chunks = _blocked(g, g_chunk)
    if minsum == "quantized":
        mids, deltas = _quantile_thresholds(sample_vals, levels=32)
    sqq = jnp.sum(qf32 * qf32, axis=1)
    q = qf32.shape[0]

    def body(i, out):
        start = jnp.minimum(i * g_chunk, g - g_chunk)
        ic = jax.lax.dynamic_slice_in_dim(idxg, start, g_chunk, 0)
        vc = jax.lax.dynamic_slice_in_dim(valg, start, g_chunk, 0)
        gfc = jax.lax.dynamic_slice_in_dim(gf32, start, g_chunk, 0)
        if minsum == "quantized":
            # bf16 dense halves HBM (the comparisons re-quantize to 0/1;
            # only values straddling a threshold within 1 bf16 ulp move)
            vg_dense = _densify(ic, vc, n, jnp.bfloat16)
            ms = _minsum_quantized_chunk(vq_dense, vg_dense, mids, deltas)
        else:
            ms = minsum_cross(vq_dense, _densify(ic, vc, n)).T
        jac = 1.0 - ms / (2.0 - ms)                     # (chunk, Q)
        d = (jnp.sum(gfc * gfc, axis=1)[:, None] + sqq[None, :]
             - 2.0 * jnp.dot(gfc, qf32.T,
                             preferred_element_type=jnp.float32))
        orig = jnp.maximum(d, 0.0) / colmax_q[None, :]
        blk = (jac * (1 - lambda_value) + orig * lambda_value).T  # (Q, chunk)
        return jax.lax.dynamic_update_slice_in_dim(out, blk, start, 1)

    out = jnp.zeros((q, g), jnp.float32)
    return jax.lax.fori_loop(0, n_chunks, body, out)    # (Q, G)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def _resolve_params(n, k1, k2, width, width2):
    k1 = min(k1, n - 1)
    k2 = min(k2, n)
    half = int(round(k1 / 2))
    if width is None:
        width = min(8 * (k1 + 1), (k1 + 1) * (half + 2))
    if width2 is None:
        width2 = min(4 * width, max(k2, 1) * width)
    width2 = max(width2, width)
    return k1, k2, half, width, width2


def _build_sparse_v(feat, k1, k2, half, width, width2, block):
    """Stages 1-4: sparse query-expanded V rows for the whole corpus.

    → (idx1 (N, W2), val1 (N, W2), colmax (N,), ovf_v (N,), ovf_qe (N,))
    """
    k_top = max(k1 + 1, half + 1, k2)
    nn, _, colmax = _topk_neighbors(feat, k_top, block)
    rmask = _reciprocal_mask(nn, k1, block)
    hmask = _reciprocal_mask(nn, half, block)
    idx0, val0, ovf_v = _expand_rows(
        feat, nn, colmax, rmask, hmask, k1, half, width, block
    )
    idx1, val1, ovf_qe = _query_expand(idx0, val0, nn, k2, width2, block)
    return idx1, val1, colmax, ovf_v, ovf_qe


@functools.partial(
    jax.jit,
    donate_argnums=(0,),
    static_argnames=("num_q", "n", "g_chunk", "lambda_value", "minsum",
                     "q_block"),
)
def _blend_q_block_into(out, start, idx1, val1, colmax, feat, sample_vals,
                        *, num_q, n, g_chunk, lambda_value, minsum, q_block):
    """One query block's rows of the final matrix, written into the DONATED
    (Q, G) result. Blocks overlap at the tail like gallery chunks do —
    identical recomputed values, no padding buffer."""
    q_dtype = jnp.float32 if minsum == "exact" else jnp.bfloat16
    rows = start + jnp.arange(q_block, dtype=jnp.int32)
    vq_dense = _densify(idx1[rows], val1[rows], n, q_dtype)
    blk = _final_blend_chunks(
        vq_dense, feat[rows], colmax[rows], feat[num_q:],
        idx1[num_q:], val1[num_q:], n, g_chunk, lambda_value, minsum,
        sample_vals,
    )
    return jax.lax.dynamic_update_slice_in_dim(out, blk, start, 0)


def re_ranking_sparse(
    qf: jax.Array,
    gf: jax.Array,
    k1: int = 50,
    k2: int = 15,
    lambda_value: float = 0.3,
    width: Optional[int] = None,
    width2: Optional[int] = None,
    minsum: str = "exact",
    block: int = 256,
    g_chunk: int = 4096,
    q_block: int = 2048,
    return_info: bool = False,
):
    """Re-ranked (Q, G) distance matrix — sparse-V, beyond-HBM galleries.

    Same semantics as ``reranking.re_ranking`` / the reference
    ``re_ranking(probFea, galFea, k1, k2, λ)`` (ref utils/reranking.py:29-100)
    but with O(N·W) live memory instead of O(N²). ``minsum``:

      * ``"exact"``   — elementwise-min over densified gallery chunks
        (Pallas tiled on TPU). Exact; VPU-bound at huge N.
      * ``"quantized"`` — 32-level threshold decomposition on the MXU
        (quantile-bounded approximation; the large-gallery default).

    Memory architecture (r5 — the r4 monolithic jit crashed the 16 GB
    chip's worker at MSMT scale, reproduced standalone): the sparse-V
    build and the blend are SEPARATE compiled programs, and the blend runs
    ``q_block`` query rows at a time into a donated (Q, G) result — XLA's
    buffer plan never holds more than the result + one block's dense rows
    and level temporaries (~8 GB at MSMT scale vs ~15 monolithic).

    ``width``/``width2`` cap the expanded / query-expanded supports
    (defaults 8·(k1+1) and 4·width); truncation is deterministic and
    counted — pass ``return_info=True`` for
    ``{"overflow_v": rows-truncated-at-stage-3,
       "overflow_qe": rows-truncated-at-stage-4}``.
    """
    if minsum not in ("exact", "quantized"):
        raise ValueError(f"minsum must be 'exact'|'quantized', got {minsum!r}")
    feat = jnp.concatenate([jnp.asarray(qf), jnp.asarray(gf)],
                           axis=0).astype(jnp.float32)
    num_q = qf.shape[0]
    num_g = gf.shape[0]
    n = feat.shape[0]
    k1, k2, half, width, width2 = _resolve_params(n, k1, k2, width, width2)

    idx1, val1, colmax, ovf_v, ovf_qe = _build_sparse_v_jitted(
        feat, k1=k1, k2=k2, half=half, width=width, width2=width2,
        block=block,
    )
    sample_vals = val1[: min(n, 256)].reshape(-1)

    q_block = min(q_block, num_q)
    final = jnp.zeros((num_q, num_g), jnp.float32)
    for i in range(_blocked(num_q, q_block)):
        start = jnp.asarray(min(i * q_block, num_q - q_block), jnp.int32)
        final = _blend_q_block_into(
            final, start, idx1, val1, colmax, feat, sample_vals,
            num_q=num_q, n=n, g_chunk=g_chunk, lambda_value=lambda_value,
            minsum=minsum, q_block=q_block,
        )
    if return_info:
        return final, {
            "overflow_v": jnp.sum((ovf_v > 0).astype(jnp.int32)),
            "overflow_qe": jnp.sum((ovf_qe > 0).astype(jnp.int32)),
        }
    return final


@functools.partial(
    jax.jit,
    static_argnames=("k1", "k2", "half", "width", "width2", "block"),
)
def _build_sparse_v_jitted(feat, *, k1, k2, half, width, width2, block):
    return _build_sparse_v(feat, k1, k2, half, width, width2, block)


def re_ranking_sparse_sharded(
    qf,
    gf,
    mesh,
    axis: str = "data",
    k1: int = 50,
    k2: int = 15,
    lambda_value: float = 0.3,
    width: Optional[int] = None,
    width2: Optional[int] = None,
    minsum: str = "exact",
    block: int = 256,
    g_chunk: int = 4096,
    q_block: int = 2048,
):
    """Mesh-parallel sparse re-ranking over the gallery axis.

    Semantics identical to :func:`re_ranking_sparse`. The sparse-V build
    (stages 1-4) runs replicated — it is O(N·W) and cheap relative to the
    min-sum; the min-sum → Jaccard → λ-blend tail (the dominant cost at
    MSMT scale) is *embarrassingly parallel over gallery chunks* once V is
    built, so it runs under ``shard_map`` with each device blending its
    contiguous gallery slab against the replicated dense query block.
    Quantization thresholds are computed once from the replicated sample,
    so every shard uses identical level edges.

    Like the single-device path, the blend streams ``q_block`` query rows
    at a time into a DONATED gallery-sharded (Q, G) result — the full
    (Q, N) dense query matrix (4.4 GB fp32 at MSMT scale) is never
    materialized per chip, the exact memory regime whose monolithic form
    crashed the 16 GB chip's worker in r4.

    Replaces the reference's CPU inverted-index offload
    (ref ``utils/reranking.py:80-93``, ``utils/metrics.py:107-111``) with
    ICI-scaled on-chip compute. Returns the (Q, G) matrix laid out with
    its gallery dimension sharded over ``axis`` (callers slicing per-query
    rows trigger an all-gather of just those rows).
    """
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    if minsum not in ("exact", "quantized"):
        raise ValueError(f"minsum must be 'exact'|'quantized', got {minsum!r}")
    feat = jnp.concatenate([jnp.asarray(qf), jnp.asarray(gf)], axis=0)
    feat = feat.astype(jnp.float32)
    num_q = qf.shape[0]
    num_g = gf.shape[0]
    n = feat.shape[0]
    k1, k2, half, width, width2 = _resolve_params(n, k1, k2, width, width2)

    rep = NamedSharding(mesh, P())
    feat = jax.device_put(feat, rep)
    idx1, val1, colmax, _, _ = _build_sparse_v_jitted(
        feat, k1=k1, k2=k2, half=half, width=width, width2=width2,
        block=block,
    )

    q_dtype = jnp.float32 if minsum == "exact" else jnp.bfloat16
    sample_vals = val1[: min(n, 256)].reshape(-1)

    # pad the gallery rows so each device owns an equal contiguous slab
    ndev = mesh.shape[axis]
    pad = (-num_g) % ndev
    idxg = jnp.pad(idx1[num_q:], ((0, pad), (0, 0)), constant_values=n)
    valg = jnp.pad(val1[num_q:], ((0, pad), (0, 0)))
    gf32 = jnp.pad(feat[num_q:], ((0, pad), (0, 0)))

    def local_blend(vq, qf32, colmax_q, gfc, ic, vc, sv):
        return _final_blend_chunks(
            vq, qf32, colmax_q, gfc, ic, vc, n, g_chunk, lambda_value,
            minsum, sv,
        )

    blend = shard_map(
        local_blend, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P()),
        out_specs=P(None, axis),
        check_vma=False,
    )

    q_block = min(q_block, num_q)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def blend_block_into(out, start):
        # query blocks overlap at the tail like the single-device path —
        # recomputed values are identical, no padding buffer needed
        rows = start + jnp.arange(q_block, dtype=jnp.int32)
        vq = _densify(idx1[rows], val1[rows], n, q_dtype)
        blk = blend(vq, feat[rows], colmax[rows], gf32, idxg, valg,
                    sample_vals)
        return jax.lax.dynamic_update_slice_in_dim(out, blk, start, 0)

    out = jax.device_put(
        jnp.zeros((num_q, num_g + pad), jnp.float32),
        NamedSharding(mesh, P(None, axis)),
    )
    for i in range(_blocked(num_q, q_block)):
        start = jnp.asarray(min(i * q_block, num_q - q_block), jnp.int32)
        out = blend_block_into(out, start)
    return out[:, :num_g]


@functools.partial(
    jax.jit,
    static_argnames=("k1", "k2", "lambda_value", "width", "width2",
                     "block", "g_chunk"),
)
def re_ranking_sparse_rows(
    qf: jax.Array,
    gf: jax.Array,
    rows: jax.Array,
    k1: int = 50,
    k2: int = 15,
    lambda_value: float = 0.3,
    width: Optional[int] = None,
    width2: Optional[int] = None,
    block: int = 256,
    g_chunk: int = 4096,
) -> jax.Array:
    """EXACT re-ranked distances for a subset of query rows.

    Runs the identical sparse-V construction over the full corpus, then the
    exact min-sum for only ``rows`` (int32 query indices) — the on-chip
    oracle for verifying the quantized full-matrix path at corpus sizes
    where neither the dense XLA path nor the NumPy oracle can run
    (MSMT17-scale verification in bench.py). → (len(rows), G).
    """
    feat = jnp.concatenate([qf, gf], axis=0).astype(jnp.float32)
    num_q = qf.shape[0]
    n = feat.shape[0]
    k1, k2, half, width, width2 = _resolve_params(n, k1, k2, width, width2)

    idx1, val1, colmax, _, _ = _build_sparse_v(
        feat, k1, k2, half, width, width2, block
    )
    rows = rows.astype(jnp.int32)
    vq_dense = _densify(idx1[rows], val1[rows], n)
    ms = _minsum_exact(vq_dense, idx1[num_q:], val1[num_q:], n, g_chunk)
    jaccard = 1.0 - ms / (2.0 - ms)

    qfr = qf.astype(jnp.float32)[rows]
    sqq = jnp.sum(qfr ** 2, axis=1)
    sqg = jnp.sum(gf.astype(jnp.float32) ** 2, axis=1)
    d_qg = sqq[:, None] + sqg[None, :] - 2.0 * jnp.dot(
        qfr, gf.astype(jnp.float32).T, preferred_element_type=jnp.float32
    )
    orig_qg = jnp.maximum(d_qg, 0.0) / colmax[rows][:, None]
    return jaccard * (1 - lambda_value) + orig_qg * lambda_value
