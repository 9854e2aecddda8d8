"""GPipe pipeline parallelism (parallel/pipeline.py) vs the sequential tower.

The correctness contract is exactness: pipelined application of the blocks
over a ('pipe',) mesh must reproduce block-sequential application — forward
AND gradients (ppermute/scan/where have exact VJPs; microbatching is exact
because block math never mixes samples). The reference has no PP analogue
(nn.DataParallel only, ref processor/processor.py:33-35).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpreid_tpu.models.layers import ResidualAttentionBlock
from mpreid_tpu.parallel.pipeline import (
    gpipe_apply,
    pipe_mesh,
    pipelined_blocks,
    stack_block_params,
    unstack_block_params,
)

DIM, HEADS, LAYERS = 16, 2, 4


@pytest.fixture(scope="module")
def tower():
    blk = ResidualAttentionBlock(DIM, HEADS)
    x = jnp.asarray(np.random.RandomState(0).randn(8, 5, DIM), jnp.float32)
    params = {
        f"resblocks_{i}": blk.init(jax.random.PRNGKey(i), x[:1])["params"]
        for i in range(LAYERS)
    }
    return blk, params, x


def _sequential(blk, params, x, mask=None):
    h = x
    for i in range(LAYERS):
        h = blk.apply({"params": params[f"resblocks_{i}"]}, h, mask)
    return h


def test_stack_unstack_roundtrip(tower):
    _, params, _ = tower
    stacked = stack_block_params(params, LAYERS, 2)
    leaf = jax.tree_util.tree_leaves(stacked)[0]
    assert leaf.shape[:2] == (2, 2)
    back = unstack_block_params(stacked)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), params, back
    )


@pytest.mark.parametrize("n_stages,microbatches", [(1, 2), (2, 2), (2, 8), (4, 4)])
def test_gpipe_forward_matches_sequential(tower, n_stages, microbatches):
    blk, params, x = tower
    mesh = pipe_mesh(n_stages)
    y = pipelined_blocks(blk, params, LAYERS, x, mesh, microbatches=microbatches)
    ref = _sequential(blk, params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-6, atol=2e-6)


def test_gpipe_forward_with_causal_mask(tower):
    # the text tower's blocks take an additive causal mask — same contract
    blk, params, x = tower
    L = x.shape[1]
    mask = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)
    mesh = pipe_mesh(2)
    y = pipelined_blocks(blk, params, LAYERS, x, mesh, microbatches=4, mask=mask)
    ref = _sequential(blk, params, x, mask)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("remat", [False, True])
def test_gpipe_grads_match_sequential(tower, remat):
    blk, params, x = tower
    mesh = pipe_mesh(4)
    stacked = stack_block_params(params, LAYERS, 4)
    coef = jnp.asarray(
        np.random.RandomState(1).randn(*x.shape), jnp.float32
    )

    def apply_one(p, h):
        return blk.apply({"params": p}, h)

    def loss_pipe(stacked, x):
        y = gpipe_apply(apply_one, stacked, x, mesh, microbatches=4,
                        remat=remat)
        return jnp.sum(y * coef)

    def loss_seq(stacked, x):
        p = unstack_block_params(stacked)
        return jnp.sum(_sequential(blk, p, x) * coef)

    gp_p, gp_x = jax.grad(loss_pipe, argnums=(0, 1))(stacked, x)
    gs_p, gs_x = jax.grad(loss_seq, argnums=(0, 1))(stacked, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        ),
        gp_p, gs_p,
    )
    np.testing.assert_allclose(np.asarray(gp_x), np.asarray(gs_x),
                               rtol=1e-5, atol=1e-5)


def test_gpipe_composes_with_dp(tower):
    """PP × DP on a 2-D ('data','pipe') mesh: every data column runs its own
    pipeline over the shared stage-sharded params; result equals sequential."""
    from jax.sharding import Mesh

    blk, params, x = tower
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "pipe"))
    y = pipelined_blocks(blk, params, LAYERS, x, mesh, microbatches=2,
                         batch_axis="data")
    ref = _sequential(blk, params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-6, atol=2e-6)

    # gradients flow through the composed mesh too
    stacked = stack_block_params(params, LAYERS, 4)
    coef = jnp.asarray(np.random.RandomState(2).randn(*x.shape), jnp.float32)

    def apply_one(p, h):
        return blk.apply({"params": p}, h)

    def loss_pipe(stacked):
        y = gpipe_apply(apply_one, stacked, x, mesh, microbatches=2,
                        batch_axis="data")
        return jnp.sum(y * coef)

    def loss_seq(stacked):
        return jnp.sum(_sequential(blk, unstack_block_params(stacked), x) * coef)

    gp = jax.grad(loss_pipe)(stacked)
    gs = jax.grad(loss_seq)(stacked)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        ),
        gp, gs,
    )

    # microbatch shard divisibility over 'data' is validated
    with pytest.raises(ValueError):
        pipelined_blocks(blk, params, LAYERS, x[:6], mesh, microbatches=2,
                         batch_axis="data")  # 3 % 2 data shards


def test_gpipe_shape_validation(tower):
    blk, params, x = tower
    with pytest.raises(ValueError):
        stack_block_params(params, LAYERS, 3)  # 4 blocks, 3 stages
    mesh = pipe_mesh(2)
    with pytest.raises(ValueError):
        pipelined_blocks(blk, params, LAYERS, x, mesh, microbatches=3)  # 8 % 3


def test_gpipe_stage_params_actually_sharded(tower):
    """The PP memory contract: each device materializes only its own stage's
    blocks when the stacked tree is placed P('pipe')."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    blk, params, x = tower
    mesh = pipe_mesh(4)
    stacked = stack_block_params(params, LAYERS, 4)
    placed = jax.tree_util.tree_map(
        lambda l: jax.device_put(l, NamedSharding(mesh, P("pipe"))), stacked
    )
    leaf = jax.tree_util.tree_leaves(placed)[0]
    shard_shapes = {s.data.shape for s in leaf.addressable_shards}
    assert shard_shapes == {(1,) + leaf.shape[1:]}

    def apply_one(p, h):
        return blk.apply({"params": p}, h)

    y = gpipe_apply(apply_one, placed, x, mesh, microbatches=4)
    ref = _sequential(blk, params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-6, atol=2e-6)
