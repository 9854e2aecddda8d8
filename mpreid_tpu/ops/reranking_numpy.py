"""k-reciprocal re-ranking — NumPy oracle.

Independent implementation of Zhong et al., "Re-ranking Person
Re-identification with k-reciprocal Encoding", CVPR 2017 (the algorithm the
reference vendors at ``utils/reranking.py:29-100``). Used as the golden
oracle for the XLA implementation in ``reranking.py``; written set-at-a-time
rather than index-at-a-time so both implementations are independently
derived from the paper's definitions.

Algorithm recap:
  1. normalize the (Q+G)×(Q+G) squared-euclidean distance matrix column-wise
     by its per-column max, then transpose,
  2. R(p, k1): k-reciprocal neighbor set — j is in R(p) iff j is in p's k1-NN
     *and* p is in j's k1-NN (both lists include self),
  3. expansion: add R(q, k1/2) for each q ∈ R(p) whose half-set overlaps
     R(p) in more than 2/3 of its size,
  4. sparse weight vector V[p] = softmax-like exp(−d) over the expanded set,
  5. local query expansion: V[p] ← mean of V over p's k2-NN,
  6. Jaccard distance from pairwise min-sums; final distance is
     λ·original + (1−λ)·jaccard.
"""

from __future__ import annotations

import numpy as np


def _k_neighbors(rank: np.ndarray, i: int, k: int) -> np.ndarray:
    return rank[i, : k + 1]


def _reciprocal_set(rank: np.ndarray, i: int, k: int) -> np.ndarray:
    fwd = _k_neighbors(rank, i, k)
    mutual = [j for j in fwd if i in _k_neighbors(rank, j, k)]
    return np.asarray(mutual, dtype=np.int64)


def re_ranking_numpy(
    qf: np.ndarray,
    gf: np.ndarray,
    k1: int = 20,
    k2: int = 6,
    lambda_value: float = 0.3,
) -> np.ndarray:
    feat = np.concatenate([qf, gf], axis=0).astype(np.float32)
    num_q = qf.shape[0]
    n = feat.shape[0]

    sq = (feat**2).sum(1)
    orig = sq[:, None] + sq[None, :] - 2.0 * feat @ feat.T
    orig = np.transpose(orig / np.max(orig, axis=0))
    rank = np.argsort(orig, axis=1)

    half = int(np.around(k1 / 2))
    v = np.zeros((n, n), dtype=np.float32)
    for p in range(n):
        rset = _reciprocal_set(rank, p, k1)
        expanded = set(rset.tolist())
        for q in rset:
            half_set = _reciprocal_set(rank, int(q), half)
            if len(np.intersect1d(half_set, rset)) > (2.0 / 3.0) * len(half_set):
                expanded.update(half_set.tolist())
        idx = np.asarray(sorted(expanded), dtype=np.int64)
        w = np.exp(-orig[p, idx])
        v[p, idx] = w / w.sum()

    if k2 != 1:
        v = np.stack([v[rank[p, :k2]].mean(axis=0) for p in range(n)])

    min_sums = np.zeros((num_q, n), dtype=np.float32)
    for p in range(num_q):
        min_sums[p] = np.minimum(v[p][None, :], v).sum(axis=1)
    jaccard = 1.0 - min_sums / (2.0 - min_sums)

    final = jaccard * (1 - lambda_value) + orig[:num_q] * lambda_value
    return final[:, num_q:]
