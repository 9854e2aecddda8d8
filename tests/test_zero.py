"""ZeRO-1 sharded optimizer state (parallel/zero.py).

Pins the contract: bitwise-identical updates to the replicated optimizer,
moments actually stored 1/N per device over the mesh 'data' axis, engine
integration via TPU.ZERO_OPT_STATE.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mpreid_tpu.config import get_default_cfg
from mpreid_tpu.parallel import make_mesh, zero_sharded
from mpreid_tpu.solver.optim import Optimizer


def _params():
    rng = np.random.RandomState(0)
    return {
        "backbone": {
            # deliberately not divisible by 8 (padding path)
            "kernel": jnp.asarray(rng.randn(7, 5).astype(np.float32)),
            "bias": jnp.asarray(rng.randn(5).astype(np.float32)),
        },
        "classifier": {"kernel": jnp.asarray(rng.randn(3, 11).astype(np.float32))},
        "logit_scale": jnp.asarray(np.float32(2.7)),  # scalar leaf
    }


def _grads_like(train, seed):
    rng = np.random.RandomState(seed)
    return {
        k: jnp.asarray(np.asarray(rng.randn(*np.shape(v)), np.float32))
        for k, v in train.items()
    }


@pytest.mark.parametrize("name", ["Adam", "AdamW", "SGD"])
@pytest.mark.parametrize("moment_dtype", ["float32", "bfloat16"])
def test_zero_bitwise_matches_replicated(name, moment_dtype):
    cfg = get_default_cfg()
    cfg.SOLVER.OPTIMIZER_NAME = name
    cfg.SOLVER.MOMENT_DTYPE = moment_dtype
    params = _params()
    mesh = make_mesh(data=len(jax.devices()), model=1)

    base = Optimizer(name, params, cfg.SOLVER, stage="baseline")
    zero = zero_sharded(base, mesh)

    def run(opt):
        train, _ = opt.partition(params)
        state = opt.init(params)
        step = jax.jit(lambda g, s, t, lr: opt.update(g, s, t, lr))
        for i in range(5):
            train, state = step(_grads_like(train, i), state, train, 1e-2)
        return train, state

    t_base, s_base = run(base)
    t_zero, s_zero = run(zero)
    assert set(t_base) == set(t_zero)
    for k in t_base:
        np.testing.assert_array_equal(
            np.asarray(t_base[k]), np.asarray(t_zero[k]), err_msg=str(k)
        )
    # moment VALUES agree too (zero stores ZeRO'd leaves flattened + padded;
    # TP/EP-sharded leaves — here the classifier kernel — keep their shape)
    for k in s_base.mu:
        flat = np.asarray(s_base.mu[k]).reshape(-1)
        np.testing.assert_array_equal(
            np.asarray(s_zero.mu[k]).reshape(-1)[: flat.size], flat,
            err_msg=str(k),
        )


def test_zero_state_actually_sharded():
    cfg = get_default_cfg()
    params = _params()
    n = len(jax.devices())
    mesh = make_mesh(data=n, model=1)
    base = Optimizer("Adam", params, cfg.SOLVER, stage="baseline")
    zero = zero_sharded(base, mesh)

    # the TP-sharded classifier kernel is NOT ZeRO'd (it is already
    # distributed over 'model'); everything else here is
    assert ("classifier", "kernel") not in zero.zero_keys
    assert ("backbone", "kernel") in zero.zero_keys

    state = zero.init(params)
    for tree in (state.mu, state.nu):
        for k, leaf in tree.items():
            if k not in zero.zero_keys:
                assert leaf.shape == np.shape(params[k[0]][k[1]]), k
                continue
            assert leaf.ndim == 1 and leaf.shape[0] % n == 0, k
            assert leaf.sharding.spec == P("data"), k
            shard = leaf.addressable_shards[0]
            assert shard.data.shape == (leaf.shape[0] // n,), k

    # sharding survives a jitted update (constraints inside the step)
    train, _ = zero.partition(params)
    step = jax.jit(lambda g, s, t: zero.update(g, s, t, 1e-2))
    train, state = step(_grads_like(train, 0), state, train)
    for k, leaf in state.mu.items():
        if k in zero.zero_keys:
            assert leaf.sharding.spec == P("data"), k
    # updated params come back replicated (usable by the next fwd/bwd)
    for k, leaf in train.items():
        assert leaf.sharding.is_fully_replicated, k


def test_zero_engine_integration(tmp_path):
    """do_train with TPU.ZERO_OPT_STATE over the 8-device mesh: loss falls,
    moments end up in the ZeRO layout."""
    from tiny import tiny_cfg, tiny_model
    from mpreid_tpu.data import make_dataloader
    from mpreid_tpu.data.synthetic import make_market1501
    from mpreid_tpu.losses import make_loss
    from mpreid_tpu.solver import make_optimizer
    from mpreid_tpu.engine.processor import do_train

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device mesh")

    root = tmp_path / "m1501"
    make_market1501(str(root), n_ids=6, imgs_per_id=8)
    cfg = tiny_cfg()
    cfg.DATASETS.NAMES = "market1501"
    cfg.DATASETS.ROOT_DIR = str(root)
    cfg.TPU.ZERO_OPT_STATE = True
    cfg.SOLVER.BASE_LR = 3e-3
    tl2, tl1, val, num_query, num_classes, cams, views = make_dataloader(cfg)
    model, variables = tiny_model(cfg, num_classes=num_classes)
    loss_fn, _ = make_loss(cfg, num_classes)
    opt = make_optimizer(cfg.SOLVER, variables["params"], stage="baseline")
    state, history = do_train(
        cfg, model, variables, tl2, None, opt,
        lambda e: cfg.SOLVER.BASE_LR, loss_fn, num_query, max_epochs=4,
    )
    assert history[-1]["loss"] < history[0]["loss"]
    # ZeRO layout reached the engine state: replicated-spec leaves are 1-D
    flat = state.opt_state.mu
    one_d = [k for k, v in flat.items() if v.ndim == 1]
    assert one_d, "no ZeRO'd moment leaves in engine state"


def test_zero_checkpoint_resume(tmp_path):
    """ZeRO-layout opt state round-trips through orbax save/load and keeps
    training bitwise-aligned with an uninterrupted run."""
    from mpreid_tpu.engine.train_state import TrainState, initial_state
    from mpreid_tpu.solver.optim import OptState
    from mpreid_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
        unnest_opt_state,
    )

    cfg = get_default_cfg()
    params = _params()
    mesh = make_mesh(data=len(jax.devices()), model=1)
    zero = zero_sharded(Optimizer("Adam", params, cfg.SOLVER, stage="baseline"), mesh)

    train, _frozen = zero.partition(params)
    state = zero.init(params)
    step = jax.jit(lambda g, s, t, lr: zero.update(g, s, t, lr))
    for i in range(3):
        train, state = step(_grads_like(train, i), state, train, 1e-2)

    full = TrainState(
        params=Optimizer.merge(train, _frozen), batch_stats={},
        opt_state=state, centers=None,
    )
    save_checkpoint(str(tmp_path / "zck"), full, epoch=3)
    restored = load_checkpoint(str(tmp_path / "zck"))
    rstate = unnest_opt_state(restored["opt_state"])
    assert isinstance(rstate, OptState)
    for k in state.mu:
        np.testing.assert_array_equal(
            np.asarray(state.mu[k]), np.asarray(rstate.mu[k]), err_msg=str(k)
        )

    # continue 2 more steps from the restore vs uninterrupted — bitwise
    rtrain, _ = zero.partition(restored["params"])
    cont_t, cont_s = rtrain, rstate
    ref_t, ref_s = train, state
    for i in range(3, 5):
        g = _grads_like(ref_t, i)
        ref_t, ref_s = step(g, ref_s, ref_t, 1e-2)
        cont_t, cont_s = step(g, cont_s, cont_t, 1e-2)
    for k in ref_t:
        np.testing.assert_array_equal(
            np.asarray(ref_t[k]), np.asarray(cont_t[k]), err_msg=str(k)
        )


def test_moment_init_inherits_param_sharding():
    """Optimizer.init / ZeroOptimizer.init must create moments with the
    PARAMETER's sharding for non-ZeRO (TP/EP-sharded) leaves — zeros() that
    drops the NamedSharding would materialize full-size replicated moments
    on one device at init (round-3 review finding)."""
    from jax.sharding import NamedSharding

    cfg = get_default_cfg()
    params = _params()
    n = len(jax.devices())
    mesh = make_mesh(data=max(n // 2, 1), model=min(2, n))
    sharded = NamedSharding(mesh, P(None, "model"))
    # model-shard the classifier kernel like TP does (11 doesn't divide by 2,
    # so use a divisible kernel here)
    params["classifier"]["kernel"] = jax.device_put(
        jnp.zeros((3, 8), jnp.float32), sharded
    )

    base = Optimizer("Adam", params, cfg.SOLVER, stage="baseline")
    state = base.init(params)
    key = ("classifier", "kernel")
    assert state.mu[key].sharding == sharded, state.mu[key].sharding
    assert state.nu[key].sharding == sharded

    zero = zero_sharded(base, mesh)
    # the TP-sharded leaf is excluded from ZeRO (param_spec != P()) and must
    # keep the parameter's own layout, as the class docstring promises
    assert key not in zero.zero_keys
    zstate = zero.init(params)
    assert zstate.mu[key].sharding == sharded, zstate.mu[key].sharding
    assert zstate.nu[key].sharding == sharded
