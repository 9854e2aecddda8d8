"""CMC / mAP evaluation, fully vectorized for TPU.

The reference evaluates with a NumPy argsort + per-query Python loop
(reference ``utils/metrics.py:28-88``). Here the whole computation is a
handful of batched sorts/cumsums that XLA fuses into a few HBM passes —
no per-query host loop.

Protocol parity notes:
  * the reference hard-disables same-pid+same-camera junk filtering
    (``remove = False`` at ``metrics.py:53-56``) — that is our default
    (``camera_filter=False``); the standard market1501 protocol
    (``camera_filter=True``) removes same-pid+same-cam gallery entries
    per query before ranking,
  * queries whose identity never appears in the (kept) gallery are excluded
    from both CMC and mAP averaging (``metrics.py:60-62``),
  * ``max_rank`` is clamped to the gallery size (``metrics.py:35-37``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("max_rank", "camera_filter"))
def cmc_map(
    distmat: jax.Array,
    q_pids: jax.Array,
    g_pids: jax.Array,
    q_camids: jax.Array,
    g_camids: jax.Array,
    max_rank: int = 50,
    camera_filter: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """→ (cmc[max_rank], mAP). Exact math of reference eval_func."""
    num_q, num_g = distmat.shape
    max_rank = min(max_rank, num_g)

    indices = jnp.argsort(distmat, axis=1)
    g_pids_sorted = g_pids[indices]
    matches = g_pids_sorted == q_pids[:, None]

    if camera_filter:
        g_camids_sorted = g_camids[indices]
        remove = matches & (g_camids_sorted == q_camids[:, None])
        keep = ~remove
    else:
        keep = jnp.ones_like(matches)

    mk = matches & keep
    # 1-based rank of each gallery entry within the kept subsequence
    rank_in_kept = jnp.cumsum(keep.astype(jnp.int32), axis=1)
    num_rel = jnp.sum(mk, axis=1)
    cum_matches = jnp.cumsum(mk.astype(jnp.int32), axis=1)

    # average precision over the kept sequence
    precision_at_hit = jnp.where(
        mk, cum_matches.astype(jnp.float32) / rank_in_kept.astype(jnp.float32), 0.0
    )
    ap = jnp.sum(precision_at_hit, axis=1) / jnp.maximum(num_rel, 1).astype(jnp.float32)

    valid = num_rel > 0
    n_valid = jnp.sum(valid).astype(jnp.float32)
    mean_ap = jnp.sum(jnp.where(valid, ap, 0.0)) / n_valid

    # CMC: rank of the first kept match
    first_hit = jnp.min(jnp.where(mk, rank_in_kept, num_g + 1), axis=1)
    ranks = jnp.arange(1, max_rank + 1)
    cmc_per_q = (first_hit[:, None] <= ranks[None, :]).astype(jnp.float32)
    cmc = jnp.sum(jnp.where(valid[:, None], cmc_per_q, 0.0), axis=0) / n_valid

    return cmc, mean_ap
