"""Gallery-sharded evaluation over the device mesh.

The scaling axis of this workload is the gallery at eval time (SURVEY.md §5):
the reference moves it to CPU/NumPy; here gallery features stay in HBM,
sharded over the mesh's 'data' axis, and the query×gallery distance matrix is
computed shard-locally with XLA collectives merging results over ICI:

* ``sharded_distmat`` — each device computes its (Q, G/D) slab; the result
  stays sharded (it IS the layout cmc_map wants when gathered lazily).
* ``sharded_topk`` — distributed retrieval: per-shard local top-k, then an
  all-gather of the D·k candidates and a final top-k merge. O(Q·k·D)
  inter-chip traffic instead of O(Q·G).
* ``sharded_cmc_map`` — exact CMC/mAP from shard-local match statistics:
  ranks of relevant items are recovered by counting, per query, how many
  gallery entries (across all shards, via psum) are closer than each
  relevant item — no global sort, no gathered distmat.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def _distmat_local(qf, gf):
    qq = jnp.sum(jnp.square(qf), axis=1, keepdims=True)
    gg = jnp.sum(jnp.square(gf), axis=1, keepdims=True).T
    return qq + gg - 2.0 * jnp.dot(qf, gf.T, preferred_element_type=jnp.float32)


def sharded_distmat(qf: jax.Array, gf: jax.Array, mesh: Mesh) -> jax.Array:
    """(Q, G) squared-euclidean distmat, computed with gf sharded on 'data'.

    Output is sharded over its gallery (column) axis; consumers may gather
    or keep it distributed.
    """
    fn = shard_map(
        _distmat_local,
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=P(None, "data"),
    )
    return fn(qf.astype(jnp.float32), gf.astype(jnp.float32))


def sharded_topk(
    qf: jax.Array, gf: jax.Array, k: int, mesh: Mesh
) -> Tuple[jax.Array, jax.Array]:
    """Global top-k nearest gallery items per query. → (dists, indices)."""
    n_shards = mesh.shape["data"]
    g = gf.shape[0]
    shard_size = g // n_shards

    def local(qf, gf_shard):
        d = _distmat_local(qf, gf_shard)                       # (Q, G/D)
        vals, idx = jax.lax.top_k(-d, k)                       # nearest k
        shard_id = jax.lax.axis_index("data")
        gidx = idx + shard_id * shard_size
        # gather all shards' candidates: (D*k) per query
        vals_all = jax.lax.all_gather(vals, "data", axis=1, tiled=True)
        gidx_all = jax.lax.all_gather(gidx, "data", axis=1, tiled=True)
        mvals, mpos = jax.lax.top_k(vals_all, k)
        midx = jnp.take_along_axis(gidx_all, mpos, axis=1)
        return -mvals, midx

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(qf.astype(jnp.float32), gf.astype(jnp.float32))


@functools.partial(
    jax.jit,
    static_argnames=("max_rank", "camera_filter", "mesh", "cap", "key_dtype"),
)
def _sharded_cmc_map_impl(
    qf, gf, q_pids, g_pids, q_camids, g_camids, max_rank, camera_filter, mesh,
    cap, key_dtype=jnp.int32,
):
    g_total = gf.shape[0]

    def local(qf, gf_shard, q_pids, g_pids_shard, q_camids, g_camids_shard):
        d = _distmat_local(qf, gf_shard)                       # (Q, Gs)
        match = g_pids_shard[None, :] == q_pids[:, None]
        if camera_filter:
            keep = ~(match & (g_camids_shard[None, :] == q_camids[:, None]))
        else:
            keep = jnp.ones_like(match)
        mk = match & keep
        num_rel = jax.lax.psum(jnp.sum(mk, axis=1), "data")    # (Q,)

        # Every shard contributes its relevant items as candidate thresholds
        # — (distance, global gallery index) pairs; the all-gathered
        # threshold set is evaluated by ALL shards so psum'd counts are
        # w.r.t. the same thresholds.
        gs = d.shape[1]
        k = min(gs, cap)
        s_id = jax.lax.axis_index("data")

        def sort_with_gidx(masked_d):
            order = jnp.argsort(masked_d, axis=1)              # stable
            sd = jnp.take_along_axis(masked_d, order, axis=1)
            sg = s_id * gs + order                             # global indices
            return sd, sg

        d_rel_sorted, g_rel_sorted = sort_with_gidx(jnp.where(mk, d, jnp.inf))
        d_kept_sorted, g_kept_sorted = sort_with_gidx(jnp.where(keep, d, jnp.inf))
        thr_d = jax.lax.all_gather(
            d_rel_sorted[:, :k], "data", axis=1, tiled=True
        )                                                       # (Q, D*k)
        thr_g = jax.lax.all_gather(
            g_rel_sorted[:, :k], "data", axis=1, tiled=True
        )

        search_l = jax.vmap(lambda row, t: jnp.searchsorted(row, t, side="left"))

        # Tie handling must reproduce the dense path EXACTLY: dense cmc_map
        # ranks by a stable argsort, i.e. lexicographically by (distance,
        # global gallery index) — including ties between a relevant and an
        # irrelevant item at bitwise-equal distance (byte-duplicate gallery
        # images with different labels). count_lex(t, tg) = #items with
        # d < t, plus #items in t's tie window with gidx < tg. The window
        # count uses a per-position key m[p] = tie_window_start(p)·G +
        # gidx[p] (the stable sort leaves gidx ascending within a window,
        # so m is non-decreasing): searchsorted(m, left_t·G + tg) − left_t
        # counts the window's smaller-index ties — gated on the window at
        # left_t actually holding value t, because when t is absent from
        # this shard the target lands inside the NEXT window and the raw
        # difference would overcount.
        # (key bound: m ≤ (Gs+1)·G — sharded_cmc_map promotes key_dtype to
        # int64 past the int32 range, or raises when x64 is unavailable.)
        def count_lex(sd, sg):
            self_left = jax.vmap(
                lambda row: jnp.searchsorted(row, row, side="left")
            )(sd)
            m = self_left.astype(key_dtype) * g_total + sg.astype(key_dtype)
            left_t = search_l(sd, thr_d)
            raw = jax.vmap(jnp.searchsorted)(
                m, left_t.astype(key_dtype) * g_total + thr_g.astype(key_dtype)
            )
            raw = jnp.maximum(raw - left_t, 0)
            at_left = jnp.take_along_axis(
                sd, jnp.minimum(left_t, sd.shape[1] - 1), axis=1
            )
            return left_t + jnp.where(at_left == thr_d, raw, 0)

        # rank(t) = 1 + #kept lexicographically before t (global);
        # cnt_rel(t) = 1 + #relevant lexicographically before t
        ranks = jax.lax.psum(count_lex(d_kept_sorted, g_kept_sorted), "data") + 1
        cnt_rel = jax.lax.psum(count_lex(d_rel_sorted, g_rel_sorted), "data") + 1

        valid_t = jnp.isfinite(thr_d)
        prec = jnp.where(
            valid_t, cnt_rel.astype(jnp.float32) / ranks.astype(jnp.float32), 0.0
        )
        ap_sum = jnp.sum(prec, axis=1)                          # (Q,)
        big = jnp.iinfo(jnp.int32).max
        first = jnp.min(
            jnp.where(valid_t, ranks, big), axis=1
        ).astype(jnp.int32)
        return ap_sum, first, num_rel

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data"), P(), P("data"), P(), P("data")),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    ap_sum, first, num_rel = fn(
        qf.astype(jnp.float32), gf.astype(jnp.float32),
        q_pids, g_pids, q_camids, g_camids,
    )
    valid = num_rel > 0
    n_valid = jnp.sum(valid).astype(jnp.float32)
    ap = ap_sum / jnp.maximum(num_rel, 1).astype(jnp.float32)
    mean_ap = jnp.sum(jnp.where(valid, ap, 0.0)) / n_valid
    ranks = jnp.arange(1, max_rank + 1)
    cmc_per_q = (first[:, None] <= ranks[None, :]).astype(jnp.float32)
    cmc = jnp.sum(jnp.where(valid[:, None], cmc_per_q, 0.0), axis=0) / n_valid
    return cmc, mean_ap


def _tie_key_dtype(g_total: int, n_shards: int):
    """Dtype for the packed lexicographic tie-break key (max (Gs+1)·G).

    Past the int32 range the key must be int64 — silently wrapping would
    corrupt mAP/CMC on huge galleries — and int64 requires jax_enable_x64;
    raise a clear error rather than compute garbage when it is off."""
    import numpy as np

    import jax

    gs = g_total // n_shards
    if (gs + 1) * g_total <= np.iinfo(np.int32).max:
        return jnp.int32
    if not jax.config.jax_enable_x64:
        raise ValueError(
            f"sharded_cmc_map: gallery of {g_total} images overflows the "
            "int32 tie-break key; enable jax_enable_x64 (or evaluate the "
            "gallery in chunks)"
        )
    return jnp.int64


def sharded_cmc_map(
    qf, gf, q_pids, g_pids, q_camids, g_camids, mesh: Mesh,
    max_rank: int = 50, camera_filter: bool = False,
):
    """Exact CMC/mAP with the gallery sharded over the mesh — the full
    (Q, G) distance matrix is never materialized on any single device."""
    import numpy as np

    # exact per-shard relevant-item bound: no query can have more relevant
    # items in one shard than its identity has gallery images in total
    _, counts = np.unique(np.asarray(g_pids), return_counts=True)
    cap = int(counts.max()) if len(counts) else 1
    key_dtype = _tie_key_dtype(int(gf.shape[0]), int(mesh.shape["data"]))
    return _sharded_cmc_map_impl(
        qf, gf, jnp.asarray(q_pids), jnp.asarray(g_pids),
        jnp.asarray(q_camids), jnp.asarray(g_camids),
        max_rank, camera_filter, mesh, cap, key_dtype,
    )
