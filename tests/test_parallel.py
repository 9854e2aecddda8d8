"""Multi-device tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpreid_tpu.ops import cmc_map, euclidean_squared_distmat
from mpreid_tpu.parallel import make_mesh, shard_batch, shard_variables
from mpreid_tpu.parallel.sharded_eval import (
    sharded_cmc_map,
    sharded_distmat,
    sharded_topk,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(data=8, model=1)


@pytest.fixture(scope="module")
def mesh2d():
    return make_mesh(data=4, model=2)


def eval_data(seed=0, q=24, g=64, dim=16, n_ids=10, n_cams=4):
    rng = np.random.RandomState(seed)
    qf = rng.randn(q, dim).astype(np.float32)
    gf = rng.randn(g, dim).astype(np.float32)
    return (
        qf, gf,
        rng.randint(0, n_ids, q), rng.randint(0, n_ids, g),
        rng.randint(0, n_cams, q), rng.randint(0, n_cams, g),
    )


class TestShardedDistmat:
    def test_matches_single_device(self, mesh):
        qf, gf, *_ = eval_data()
        got = np.asarray(sharded_distmat(jnp.asarray(qf), jnp.asarray(gf), mesh))
        exp = np.asarray(euclidean_squared_distmat(jnp.asarray(qf), jnp.asarray(gf)))
        np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-4)

    def test_output_sharded_on_gallery_axis(self, mesh):
        qf, gf, *_ = eval_data()
        out = sharded_distmat(jnp.asarray(qf), jnp.asarray(gf), mesh)
        spec = out.sharding.spec
        assert spec[1] == "data" or (spec and spec[-1] == "data")


class TestShardedTopk:
    def test_matches_full_sort(self, mesh):
        qf, gf, *_ = eval_data(seed=2, g=128)
        k = 10
        dists, idx = sharded_topk(jnp.asarray(qf), jnp.asarray(gf), k, mesh)
        full = np.asarray(euclidean_squared_distmat(jnp.asarray(qf), jnp.asarray(gf)))
        exp_idx = np.argsort(full, axis=1)[:, :k]
        np.testing.assert_array_equal(np.sort(np.asarray(idx), axis=1),
                                      np.sort(exp_idx, axis=1))
        np.testing.assert_allclose(
            np.sort(np.asarray(dists), axis=1),
            np.sort(np.take_along_axis(full, exp_idx, 1), axis=1),
            rtol=1e-4, atol=1e-4,
        )


class TestShardedCmcMap:
    @pytest.mark.parametrize("camera_filter", [False, True])
    def test_matches_dense(self, mesh, camera_filter):
        qf, gf, qp, gp, qc, gc = eval_data(seed=3)
        dense = euclidean_squared_distmat(jnp.asarray(qf), jnp.asarray(gf))
        cmc_ref, map_ref = cmc_map(
            dense, jnp.asarray(qp), jnp.asarray(gp), jnp.asarray(qc),
            jnp.asarray(gc), max_rank=20, camera_filter=camera_filter,
        )
        cmc, mAP = sharded_cmc_map(
            jnp.asarray(qf), jnp.asarray(gf), qp, gp, qc, gc, mesh,
            max_rank=20, camera_filter=camera_filter,
        )
        np.testing.assert_allclose(np.asarray(cmc), np.asarray(cmc_ref), atol=1e-6)
        assert np.isclose(float(mAP), float(map_ref), atol=1e-6)


class TestMeshPlacement:
    def test_batch_sharding(self, mesh):
        batch = {"images": np.zeros((16, 8, 4, 3), np.uint8),
                 "pids": np.arange(16, dtype=np.int32)}
        out = shard_batch(batch, mesh)
        assert out["images"].sharding.spec[0] == "data"

    def test_classifier_and_experts_sharded_on_model_axis(self, mesh2d):
        variables = {
            "params": {
                "classifier": {"kernel": np.zeros((64, 32), np.float32)},
                "visual": {
                    "moe_resblocks_0": {
                        "experts": {"c_fc_kernel": np.zeros((4, 8, 32), np.float32)}
                    }
                },
                "bottleneck": {"scale": np.ones(64, np.float32)},
            }
        }
        placed = shard_variables(variables, mesh2d)
        assert placed["params"]["classifier"]["kernel"].sharding.spec == (None, "model")
        assert (
            placed["params"]["visual"]["moe_resblocks_0"]["experts"]["c_fc_kernel"]
            .sharding.spec[0] == "model"
        )
        assert placed["params"]["bottleneck"]["scale"].sharding.spec == ()


def test_rerank_shards_over_mesh():
    """k-reciprocal re-ranking partitions row-parallel under GSPMD: sharded
    query/gallery inputs give the same distmat as single-device (the multi-
    hot/matmul formulation has no data-dependent shapes to block it)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mpreid_tpu.ops.reranking import re_ranking
    from mpreid_tpu.parallel import make_mesh

    rng = np.random.RandomState(0)
    qf = rng.randn(64, 32).astype(np.float32)
    gf = rng.randn(192, 32).astype(np.float32)

    d1 = np.asarray(re_ranking(jnp.asarray(qf), jnp.asarray(gf), k1=20, k2=6))

    mesh = make_mesh(data=8, model=1)
    qs = jax.device_put(qf, NamedSharding(mesh, P("data", None)))
    gs = jax.device_put(gf, NamedSharding(mesh, P("data", None)))
    with mesh:
        d8 = np.asarray(re_ranking(qs, gs, k1=20, k2=6))
    np.testing.assert_allclose(d1, d8, atol=1e-5)
