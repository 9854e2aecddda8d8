import numpy as np
import pytest

from mpreid_tpu.native import native_available, re_ranking_native
from mpreid_tpu.ops.reranking_numpy import re_ranking_numpy

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ toolchain unavailable"
)


def clustered(seed=3, n_ids=8, nq=24, ng=56, dim=16):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_ids, dim) * 3
    qf = np.stack([centers[i % n_ids] + rng.randn(dim) * 0.5 for i in range(nq)])
    gf = np.stack([centers[i % n_ids] + rng.randn(dim) * 0.5 for i in range(ng)])
    return qf.astype(np.float32), gf.astype(np.float32)


@pytest.mark.parametrize("k1,k2", [(10, 4), (6, 1), (20, 6)])
def test_native_matches_numpy_oracle(k1, k2):
    qf, gf = clustered()
    ref = re_ranking_numpy(qf, gf, k1=k1, k2=k2, lambda_value=0.3)
    got = re_ranking_native(qf, gf, k1=k1, k2=k2, lambda_value=0.3)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_native_clamps_small_gallery():
    qf, gf = clustered(nq=4, ng=5)
    out = re_ranking_native(qf, gf, k1=50, k2=15)
    assert out.shape == (4, 5) and np.isfinite(out).all()
