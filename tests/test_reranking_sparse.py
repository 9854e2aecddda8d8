"""Sparse-V k-reciprocal re-ranking (ops/reranking_sparse.py).

The sparse path must be element-wise equal to the NumPy oracle and the
dense XLA path whenever its static widths don't truncate; truncation is
deterministic and reported. This is the beyond-HBM gallery mode (VERDICT
r3 next-task #1): MSMT17-scale corpora where the dense path's (Q+G)² fp32
matrices exceed the chip.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mpreid_tpu.ops.reranking import re_ranking
from mpreid_tpu.ops.reranking_numpy import re_ranking_numpy
from mpreid_tpu.ops.reranking_sparse import re_ranking_sparse


def _clustered(rng, n_ids, dim, n_q, n_g, noise=0.5):
    centers = rng.randn(n_ids, dim) * 3
    qf = np.stack([centers[i % n_ids] + rng.randn(dim) * noise
                   for i in range(n_q)]).astype(np.float32)
    gf = np.stack([centers[i % n_ids] + rng.randn(dim) * noise
                   for i in range(n_g)]).astype(np.float32)
    return qf, gf


@pytest.mark.parametrize("k1,k2", [(6, 3), (10, 4), (20, 6)])
def test_sparse_matches_numpy_oracle(k1, k2):
    rng = np.random.RandomState(3)
    qf, gf = _clustered(rng, 8, 16, 24, 56)

    ref = re_ranking_numpy(qf, gf, k1=k1, k2=k2, lambda_value=0.3)
    got = np.asarray(re_ranking_sparse(
        jnp.asarray(qf), jnp.asarray(gf), k1=k1, k2=k2, block=16,
        g_chunk=32,
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_sparse_matches_dense_xla():
    rng = np.random.RandomState(5)
    qf, gf = _clustered(rng, 12, 24, 32, 150)

    dense = np.asarray(re_ranking(jnp.asarray(qf), jnp.asarray(gf),
                                  k1=20, k2=6))
    sparse = np.asarray(re_ranking_sparse(
        jnp.asarray(qf), jnp.asarray(gf), k1=20, k2=6, block=64,
        g_chunk=64,
    ))
    np.testing.assert_allclose(sparse, dense, rtol=1e-3, atol=1e-4)


def test_sparse_reference_protocol_params():
    """k1=50, k2=15 — the reference's own protocol (ref metrics.py:127)."""
    rng = np.random.RandomState(11)
    qf, gf = _clustered(rng, 16, 24, 40, 260, noise=0.9)

    ref = re_ranking_numpy(qf, gf, k1=50, k2=15, lambda_value=0.3)
    got = np.asarray(re_ranking_sparse(
        jnp.asarray(qf), jnp.asarray(gf), k1=50, k2=15, block=64,
        g_chunk=128,
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_sparse_no_overflow_on_clustered_data():
    rng = np.random.RandomState(7)
    qf, gf = _clustered(rng, 10, 16, 20, 120)
    _, info = re_ranking_sparse(
        jnp.asarray(qf), jnp.asarray(gf), k1=12, k2=4, block=32,
        g_chunk=64, return_info=True,
    )
    assert int(info["overflow_v"]) == 0
    assert int(info["overflow_qe"]) == 0


def test_sparse_overflow_counted_and_survives():
    """Deliberately tiny widths: rows truncate, the function still returns
    finite distances and reports how many rows overflowed."""
    rng = np.random.RandomState(9)
    qf, gf = _clustered(rng, 6, 16, 16, 80, noise=1.5)
    out, info = re_ranking_sparse(
        jnp.asarray(qf), jnp.asarray(gf), k1=20, k2=6, width=8, width2=12,
        block=32, g_chunk=32, return_info=True,
    )
    assert np.all(np.isfinite(np.asarray(out)))
    assert int(info["overflow_v"]) > 0 or int(info["overflow_qe"]) > 0


def test_sparse_quantized_minsum_close_to_exact():
    rng = np.random.RandomState(13)
    qf, gf = _clustered(rng, 16, 24, 48, 160, noise=0.9)
    exact = np.asarray(re_ranking_sparse(
        jnp.asarray(qf), jnp.asarray(gf), k1=16, k2=5, block=64, g_chunk=64,
    ))
    fast = np.asarray(re_ranking_sparse(
        jnp.asarray(qf), jnp.asarray(gf), k1=16, k2=5, block=64, g_chunk=64,
        minsum="quantized",
    ))
    assert float(np.max(np.abs(exact - fast))) < 0.15

    # metric equivalence, same bar as the dense fast_minsum test
    from mpreid_tpu.ops.metrics import cmc_map

    q_pids = jnp.asarray(np.arange(48) % 16)
    g_pids = jnp.asarray(np.arange(160) % 16)
    zq, zg = jnp.zeros(48, jnp.int32), jnp.zeros(160, jnp.int32)
    cmc_e, map_e = cmc_map(jnp.asarray(exact), q_pids, g_pids, zq, zg)
    cmc_f, map_f = cmc_map(jnp.asarray(fast), q_pids, g_pids, zq, zg)
    # measured on this data (r5): rank-1/mAP deltas are exactly 0.0 and
    # top-1 *image* disagreement is 3/48 (always within the same identity).
    # Tolerances allow one rank-1 query flip and half its mAP effect —
    # anything looser would hide a real quantization regression.
    assert abs(float(cmc_e[0]) - float(cmc_f[0])) <= 1.0 / 48 + 1e-9
    assert abs(float(map_e) - float(map_f)) < 0.005
    top1_disagree = float(np.mean(np.argmin(exact, 1) != np.argmin(fast, 1)))
    assert top1_disagree < 0.15


def test_sparse_q_blocked_matches_unblocked():
    """The donated q-block streaming blend (the r5 crash fix: the r4
    monolithic program's ~15 GB peak killed the TPU worker at MSMT scale)
    must be value-identical for any q_block, including ragged tail
    overlap."""
    rng = np.random.RandomState(29)
    qf, gf = _clustered(rng, 8, 16, 23, 70)
    kw = dict(k1=10, k2=4, block=16, g_chunk=32)
    whole = np.asarray(re_ranking_sparse(
        jnp.asarray(qf), jnp.asarray(gf), **kw
    ))
    for qb in (7, 23, 64):
        blocked = np.asarray(re_ranking_sparse(
            jnp.asarray(qf), jnp.asarray(gf), q_block=qb, **kw
        ))
        np.testing.assert_array_equal(blocked, whole)


def test_sparse_ragged_blocks_and_chunks():
    """Block/chunk sizes that do NOT divide N or G exercise the padding."""
    rng = np.random.RandomState(17)
    qf, gf = _clustered(rng, 7, 12, 13, 61)
    ref = re_ranking_numpy(qf, gf, k1=8, k2=3, lambda_value=0.3)
    got = np.asarray(re_ranking_sparse(
        jnp.asarray(qf), jnp.asarray(gf), k1=8, k2=3, block=9, g_chunk=7,
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_sparse_rows_oracle_matches_numpy():
    """re_ranking_sparse_rows — the on-chip row oracle used by bench.py to
    verify the quantized path at MSMT scale — must itself equal the NumPy
    oracle's rows."""
    from mpreid_tpu.ops.reranking_sparse import re_ranking_sparse_rows

    rng = np.random.RandomState(19)
    qf, gf = _clustered(rng, 9, 16, 20, 90)
    rows = np.asarray([0, 3, 17], np.int32)

    ref = re_ranking_numpy(qf, gf, k1=12, k2=5, lambda_value=0.3)[rows]
    got = np.asarray(re_ranking_sparse_rows(
        jnp.asarray(qf), jnp.asarray(gf), jnp.asarray(rows),
        k1=12, k2=5, block=32, g_chunk=64,
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("minsum", ["exact", "quantized"])
def test_sparse_sharded_matches_single_device(minsum):
    """re_ranking_sparse_sharded: the gallery-partitioned blend under
    shard_map must equal the single-logical-device result bitwise-ish (same
    math, same chunk walk per shard) on the 8-device CPU mesh — the
    multi-chip story for MSMT-scale re-ranking (VERDICT r4 task #4)."""
    from mpreid_tpu.ops.reranking_sparse import re_ranking_sparse_sharded
    from mpreid_tpu.parallel import make_mesh

    rng = np.random.RandomState(23)
    qf, gf = _clustered(rng, 10, 16, 22, 109)  # 109 % 8 != 0: pad path
    mesh = make_mesh(data=8)
    kw = dict(k1=12, k2=5, block=32, g_chunk=16, minsum=minsum)
    single = np.asarray(re_ranking_sparse(
        jnp.asarray(qf), jnp.asarray(gf), **kw
    ))
    with mesh:
        # q_block=7 with 22 queries: 4 blocks incl. an overlapping ragged
        # tail — the donated streaming path (the r4-crash memory regime
        # fix) must be value-identical under the mesh too
        sharded = np.asarray(re_ranking_sparse_sharded(
            jnp.asarray(qf), jnp.asarray(gf), mesh, axis="data",
            q_block=7, **kw
        ))
    assert sharded.shape == single.shape
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-5)


def test_evaluator_auto_switches_to_sparse():
    """R1mAPEvaluator: corpora above TEST.RERANK_SPARSE_N take the sparse
    path; metrics must stay equivalent to the dense evaluator's."""
    from mpreid_tpu.engine.evaluator import R1mAPEvaluator

    rng = np.random.RandomState(21)
    n_ids, n_q, n_g = 8, 16, 80
    qf, gf = _clustered(rng, n_ids, 16, n_q, n_g, noise=0.6)
    pids = np.concatenate([np.arange(n_q) % n_ids, np.arange(n_g) % n_ids])
    camids = np.concatenate([np.zeros(n_q, np.int64), np.ones(n_g, np.int64)])
    feats = np.concatenate([qf, gf], axis=0)

    results = []
    for threshold in (10**9, 8):     # dense, then forced-sparse
        ev = R1mAPEvaluator(n_q, max_rank=10, reranking=True,
                            rerank_k1=12, rerank_k2=4,
                            rerank_sparse_n=threshold)
        ev.update((feats, pids, camids))
        cmc, mAP = ev.compute()[:2]
        results.append((cmc, mAP))
    (cmc_d, map_d), (cmc_s, map_s) = results
    # sparse uses the quantized min-sum → metric-level equivalence
    assert abs(float(cmc_d[0]) - float(cmc_s[0])) < 0.03
    assert abs(map_d - map_s) < 0.01


def test_minsum_cross_kernel_matches_xla():
    from mpreid_tpu.ops.pallas_kernels import (
        _minsum_cross_xla, minsum_cross_pallas,
    )

    rng = np.random.RandomState(2)
    vq = jnp.asarray(np.abs(rng.randn(9, 300)).astype(np.float32))
    vg = jnp.asarray(np.abs(rng.randn(17, 300)).astype(np.float32))
    exp = np.asarray(_minsum_cross_xla(vq, vg))
    got = np.asarray(minsum_cross_pallas(vq, vg, tile_q=8, tile_g=8,
                                         chunk_k=128, interpret=True))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)
    exp2 = np.minimum(np.asarray(vq)[:, None, :], np.asarray(vg)[None]).sum(-1)
    np.testing.assert_allclose(exp, exp2, rtol=1e-5, atol=1e-5)
