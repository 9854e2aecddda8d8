import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpreid_tpu.ops import (
    cmc_map,
    euclidean_squared_distmat,
    re_ranking,
    re_ranking_numpy,
)


# ---------------------------------------------------------------------------
# independent per-query loop oracle for CMC/mAP (market1501 protocol)
# ---------------------------------------------------------------------------
def cmc_map_loop(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=50,
                 camera_filter=False):
    num_q, num_g = distmat.shape
    max_rank = min(max_rank, num_g)
    indices = np.argsort(distmat, axis=1)
    all_cmc, all_ap = [], []
    for qi in range(num_q):
        order = indices[qi]
        if camera_filter:
            keep = ~((g_pids[order] == q_pids[qi]) & (g_camids[order] == q_camids[qi]))
        else:
            keep = np.ones(num_g, bool)
        raw = (g_pids[order] == q_pids[qi]).astype(np.int32)[keep]
        if not raw.any():
            continue
        cmc = raw.cumsum()
        cmc[cmc > 1] = 1
        all_cmc.append(cmc[:max_rank])
        num_rel = raw.sum()
        prec = raw.cumsum() / np.arange(1, raw.shape[0] + 1)
        all_ap.append((prec * raw).sum() / num_rel)
    return np.stack(all_cmc).mean(0), float(np.mean(all_ap))


def make_eval_data(seed, num_q=20, num_g=80, n_ids=10, n_cams=4):
    rng = np.random.RandomState(seed)
    q_pids = rng.randint(0, n_ids, num_q)
    g_pids = rng.randint(0, n_ids, num_g)
    q_camids = rng.randint(0, n_cams, num_q)
    g_camids = rng.randint(0, n_cams, num_g)
    distmat = rng.rand(num_q, num_g).astype(np.float32)
    return distmat, q_pids, g_pids, q_camids, g_camids


@pytest.mark.parametrize("camera_filter", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cmc_map_matches_loop_oracle(seed, camera_filter):
    d, qp, gp, qc, gc = make_eval_data(seed)
    cmc_ref, map_ref = cmc_map_loop(d, qp, gp, qc, gc, camera_filter=camera_filter)
    cmc, mAP = cmc_map(
        jnp.asarray(d), jnp.asarray(qp), jnp.asarray(gp), jnp.asarray(qc),
        jnp.asarray(gc), max_rank=50, camera_filter=camera_filter,
    )
    np.testing.assert_allclose(np.asarray(cmc), cmc_ref, atol=1e-6)
    assert np.isclose(float(mAP), map_ref, atol=1e-6)


def test_cmc_perfect_ranking():
    # gallery sorted so the correct id is always nearest
    q_pids = np.arange(5)
    g_pids = np.arange(5)
    d = np.ones((5, 5), np.float32)
    np.fill_diagonal(d, 0.0)
    cmc, mAP = cmc_map(
        jnp.asarray(d), jnp.asarray(q_pids), jnp.asarray(g_pids),
        jnp.zeros(5, jnp.int32), jnp.ones(5, jnp.int32),
    )
    assert float(cmc[0]) == 1.0 and float(mAP) == 1.0


def test_cmc_query_without_gallery_match_excluded():
    q_pids = np.array([0, 99])  # pid 99 absent from gallery
    g_pids = np.array([0, 1])
    d = np.array([[0.1, 0.9], [0.5, 0.5]], np.float32)
    cmc, mAP = cmc_map(
        jnp.asarray(d), jnp.asarray(q_pids), jnp.asarray(g_pids),
        jnp.zeros(2, jnp.int32), jnp.zeros(2, jnp.int32),
    )
    assert float(cmc[0]) == 1.0  # only the valid query counts
    assert float(mAP) == 1.0


def test_squared_distmat():
    rng = np.random.RandomState(0)
    q = rng.randn(6, 8).astype(np.float32)
    g = rng.randn(9, 8).astype(np.float32)
    got = np.asarray(euclidean_squared_distmat(jnp.asarray(q), jnp.asarray(g)))
    exp = ((q[:, None, :] - g[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k1,k2", [(6, 3), (10, 4)])
def test_reranking_matches_numpy_oracle(k1, k2):
    rng = np.random.RandomState(3)
    n_ids = 8
    qf, gf = [], []
    centers = rng.randn(n_ids, 16) * 3
    for i in range(24):
        qf.append(centers[i % n_ids] + rng.randn(16) * 0.5)
    for i in range(56):
        gf.append(centers[i % n_ids] + rng.randn(16) * 0.5)
    qf = np.asarray(qf, np.float32)
    gf = np.asarray(gf, np.float32)

    ref = re_ranking_numpy(qf, gf, k1=k1, k2=k2, lambda_value=0.3)
    got = np.asarray(re_ranking(jnp.asarray(qf), jnp.asarray(gf), k1=k1, k2=k2))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_reranking_improves_clustered_retrieval():
    # re-ranked distances should still rank the right identity first
    rng = np.random.RandomState(0)
    centers = rng.randn(4, 32) * 4
    qf = np.stack([centers[i] + rng.randn(32) * 0.3 for i in range(4)]).astype(np.float32)
    gf = np.stack(
        [centers[i % 4] + rng.randn(32) * 0.3 for i in range(20)]
    ).astype(np.float32)
    d = np.asarray(re_ranking(jnp.asarray(qf), jnp.asarray(gf), k1=5, k2=2))
    for i in range(4):
        assert np.argmin(d[i]) % 4 == i


def test_reranking_fast_minsum_metric_equivalent():
    """MXU-quantized Jaccard: distances differ slightly, metrics match."""
    from mpreid_tpu.ops.metrics import cmc_map

    rng = np.random.RandomState(7)
    n_ids = 16
    centers = rng.randn(n_ids, 24)
    qf = np.stack([centers[i % n_ids] + rng.randn(24) * 0.9 for i in range(48)]).astype(np.float32)
    gf = np.stack([centers[i % n_ids] + rng.randn(24) * 0.9 for i in range(160)]).astype(np.float32)
    q_pids = np.arange(48) % n_ids
    g_pids = np.arange(160) % n_ids
    zq, zg = np.zeros(48, np.int64), np.zeros(160, np.int64)

    exact = re_ranking(jnp.asarray(qf), jnp.asarray(gf), k1=16, k2=5)
    fast = re_ranking(jnp.asarray(qf), jnp.asarray(gf), k1=16, k2=5, fast_minsum=True)
    assert float(jnp.max(jnp.abs(exact - fast))) < 0.15
    cmc_e, map_e = cmc_map(exact, jnp.asarray(q_pids), jnp.asarray(g_pids),
                           jnp.asarray(zq), jnp.asarray(zg))
    cmc_f, map_f = cmc_map(fast, jnp.asarray(q_pids), jnp.asarray(g_pids),
                           jnp.asarray(zq), jnp.asarray(zg))
    assert abs(float(cmc_e[0]) - float(cmc_f[0])) < 0.03
    assert abs(float(map_e) - float(map_f)) < 0.01


def test_cosine_distmat_matches_numpy():
    from mpreid_tpu.ops import cosine_distmat

    rng = np.random.RandomState(0)
    q = rng.randn(5, 8).astype(np.float32)
    g = rng.randn(7, 8).astype(np.float32)
    got = np.asarray(cosine_distmat(jnp.asarray(q), jnp.asarray(g)))
    sim = (q @ g.T) / (np.linalg.norm(q, axis=1, keepdims=True)
                       @ np.linalg.norm(g, axis=1, keepdims=True).T)
    exp = np.arccos(np.clip(sim, -1 + 1e-5, 1 - 1e-5))
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_evaluator_cosine_metric():
    from mpreid_tpu.engine import R1mAPEvaluator

    rng = np.random.RandomState(1)
    feats = rng.randn(30, 8).astype(np.float32)
    pids = np.arange(30) % 5
    ev_e = R1mAPEvaluator(num_query=10)
    ev_c = R1mAPEvaluator(num_query=10, dist_metric="cosine")
    for ev in (ev_e, ev_c):
        ev.update((feats, pids, np.zeros(30, np.int64)))
    d_e = ev_e.compute()[2]
    d_c = ev_c.compute()[2]
    assert not np.allclose(d_e, d_c)
    # with L2-normalized features both metrics produce the same RANKING
    r_e = np.argsort(d_e, axis=1)
    r_c = np.argsort(d_c, axis=1)
    np.testing.assert_array_equal(r_e, r_c)
