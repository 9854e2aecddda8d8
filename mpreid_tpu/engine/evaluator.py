"""R1/mAP evaluator — feature accumulation + on-device metric computation.

Mirrors the reference ``R1_mAP_eval`` (``utils/metrics.py:91-134``):
accumulate (features, pids, camids) per batch, then L2-normalize
(``TEST.FEAT_NORM``), split query = first ``num_query`` rows, distmat,
CMC/mAP. Unlike the reference, the distmat/metrics run on device
(ops/metrics.py) and the ``reranking`` flag actually works — the reference
accepts it but no call site ever passes it (``metrics.py:124-127`` vs
``processor/processor.py:40``).

``compute`` returns the reference's 7-tuple:
(cmc, mAP, distmat, pids, camids, qf, gf).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from mpreid_tpu.ops import cmc_map, cosine_distmat, euclidean_squared_distmat, re_ranking


class R1mAPEvaluator:
    def __init__(
        self,
        num_query: int,
        max_rank: int = 50,
        feat_norm: bool = True,
        reranking: bool = False,
        camera_filter: bool = False,
        rerank_k1: int = 50,
        rerank_k2: int = 15,
        rerank_lambda: float = 0.3,
        rerank_fast: bool = False,
        rerank_sparse_n: int = 25000,
        dist_metric: str = "euclidean",
    ):
        self.num_query = num_query
        self.max_rank = max_rank
        self.feat_norm = feat_norm
        self.reranking = reranking
        self.camera_filter = camera_filter
        self.rerank_params = (rerank_k1, rerank_k2, rerank_lambda)
        self.rerank_fast = rerank_fast
        self.rerank_sparse_n = rerank_sparse_n
        if dist_metric not in ("euclidean", "cosine"):
            raise ValueError(
                f"Unknown dist_metric {dist_metric!r}; expected 'euclidean' or 'cosine'"
            )
        self.dist_metric = dist_metric
        self.reset()

    def reset(self):
        self.feats: List[np.ndarray] = []
        self.pids: List[np.ndarray] = []
        self.camids: List[np.ndarray] = []

    def update(self, output):
        feat, pid, camid = output
        # device arrays stay on device (avoids a host fetch here and the
        # re-upload in compute() — material on hosts with slow device
        # links); anything else is normalized to fp32 numpy as before
        if isinstance(feat, jax.Array):
            self.feats.append(feat.astype(jnp.float32))
        else:
            self.feats.append(np.asarray(feat, dtype=np.float32))
        self.pids.append(np.asarray(pid))
        self.camids.append(np.asarray(camid))

    def compute(self):
        if any(isinstance(f, jax.Array) for f in self.feats):
            feats = jnp.concatenate(
                [jnp.asarray(f, jnp.float32) for f in self.feats], axis=0
            )
        else:
            feats = jnp.asarray(np.concatenate(self.feats, axis=0))
        pids = np.concatenate(self.pids)
        camids = np.concatenate(self.camids)
        if self.feat_norm:
            feats = feats / jnp.linalg.norm(feats, axis=1, keepdims=True)

        qf = feats[: self.num_query]
        gf = feats[self.num_query :]
        q_pids = pids[: self.num_query]
        g_pids = pids[self.num_query :]
        if not np.isin(q_pids, g_pids).any():
            # mirror the reference's assertion (utils/metrics.py:83) instead
            # of silently returning NaN metrics
            raise AssertionError(
                "Error: all query identities do not appear in gallery"
            )
        q_camids = camids[: self.num_query]
        g_camids = camids[self.num_query :]

        if self.reranking:
            k1, k2, lam = self.rerank_params
            n = qf.shape[0] + gf.shape[0]
            if n > self.rerank_sparse_n:
                # beyond-HBM corpus (e.g. MSMT17, N≈94k): sparse-V path,
                # MXU-quantized min-sum (ops/reranking_sparse.py)
                from mpreid_tpu.ops.reranking_sparse import re_ranking_sparse

                distmat = re_ranking_sparse(
                    qf, gf, k1=k1, k2=k2, lambda_value=lam,
                    minsum="quantized",
                )
            else:
                distmat = re_ranking(qf, gf, k1=k1, k2=k2, lambda_value=lam,
                                     fast_minsum=self.rerank_fast)
        elif self.dist_metric == "cosine":
            distmat = cosine_distmat(qf, gf)
        else:
            distmat = euclidean_squared_distmat(qf, gf)

        cmc, mAP = cmc_map(
            distmat,
            jnp.asarray(q_pids),
            jnp.asarray(g_pids),
            jnp.asarray(q_camids),
            jnp.asarray(g_camids),
            max_rank=self.max_rank,
            camera_filter=self.camera_filter,
        )
        return (
            np.asarray(cmc),
            float(mAP),
            np.asarray(distmat),
            pids,
            camids,
            np.asarray(qf),
            np.asarray(gf),
        )
