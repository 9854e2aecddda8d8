"""Data-parallel train step must match the single-device result exactly.

Places params replicated + batch sharded over the 8-device 'data' axis and
runs the same jitted step as single-device; GSPMD should produce bitwise-
comparable results (up to fp reduction-order noise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpreid_tpu.engine.steps import make_train_step
from mpreid_tpu.engine.train_state import initial_state
from mpreid_tpu.losses import make_loss
from mpreid_tpu.parallel import make_mesh, shard_batch, shard_variables
from mpreid_tpu.solver import make_optimizer

from tiny import tiny_cfg, tiny_model


def test_dp_step_matches_single_device():
    cfg = tiny_cfg()
    model, variables = tiny_model(cfg, num_classes=8)
    loss_fn, _ = make_loss(cfg, 8)
    opt = make_optimizer(cfg.SOLVER, variables["params"], stage="baseline")
    step = make_train_step(model, cfg, loss_fn, opt)

    rng = np.random.RandomState(0)
    batch_np = {
        "images": rng.randint(0, 255, (16, 32, 16, 3), dtype=np.uint8),
        "pids": np.repeat(np.arange(4), 4).astype(np.int32),
        "camids": np.zeros(16, np.int32),
        "trackids": np.zeros(16, np.int32),
    }
    key = jax.random.PRNGKey(7)

    # the step donates its input state — give each run an independent copy
    mesh = make_mesh(data=8, model=1)
    sharded_vars = shard_variables(
        jax.tree_util.tree_map(np.asarray, variables), mesh
    )

    # single device
    state1 = initial_state(variables, opt)
    new1, m1 = step(state1, {k: jnp.asarray(v) for k, v in batch_np.items()},
                    1e-3, key)
    loss1 = float(m1["loss"])
    p1 = np.asarray(jax.tree_util.tree_leaves(new1.params)[0])

    # 8-way data parallel
    with mesh:
        state8 = initial_state(sharded_vars, opt)
        dev_batch = shard_batch(batch_np, mesh)
        new8, m8 = step(state8, dev_batch, 1e-3, key)
        loss8 = float(m8["loss"])
        p8 = np.asarray(jax.tree_util.tree_leaves(new8.params)[0])

    assert np.isclose(loss1, loss8, rtol=1e-4), (loss1, loss8)
    np.testing.assert_allclose(p1, p8, rtol=1e-4, atol=1e-6)


def test_config_driven_multidevice_training(tmp_path):
    """do_train shards over the mesh when TPU.MESH_DATA allows and trains."""
    from mpreid_tpu.data import make_dataloader
    from mpreid_tpu.data.synthetic import make_market1501
    from mpreid_tpu.engine import do_train

    make_market1501(str(tmp_path), n_ids=6, imgs_per_id=8)
    cfg = tiny_cfg()
    cfg.DATASETS.NAMES = "market1501"
    cfg.DATASETS.ROOT_DIR = str(tmp_path)
    cfg.TPU.MESH_DATA = -1  # all 8 virtual devices
    model, variables = tiny_model(cfg, num_classes=6)
    loss_fn, _ = make_loss(cfg, 6)
    loaders = make_dataloader(cfg)
    opt = make_optimizer(cfg.SOLVER, variables["params"], stage="baseline")
    state, hist = do_train(cfg, model, variables, loaders[0], None, opt,
                           lambda e: 3e-3, loss_fn, loaders[3], max_epochs=3)
    assert hist[-1]["loss"] < hist[0]["loss"]
