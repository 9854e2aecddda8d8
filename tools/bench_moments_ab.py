"""A/B SOLVER.MOMENT_DTYPE (fp32 vs bf16 Adam moments) in real train steps.

The Adam update is HBM-bound (~4.7 ms / 513 GB/s for the 87M trainable
stage-2 params on the v5e; ~8.5 ms of the RN50 step) — bf16 moment storage
halves the optimizer-state traffic. This times the full stage-2a step and
the RN50 baseline step under both dtypes.

Usage: python tools/bench_moments_ab.py [stage2|rn50|both]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def bench_stage2(md):
    from mpreid_tpu.config import get_default_cfg
    from mpreid_tpu.engine.steps import make_train_step
    from mpreid_tpu.engine.train_state import initial_state
    from mpreid_tpu.losses import make_loss
    from mpreid_tpu.models import init_variables, make_model_uniprompt
    from mpreid_tpu.solver import make_optimizer

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "ViT-B-16"
    cfg.INPUT.SIZE_TRAIN = [256, 128]
    cfg.INPUT.SIZE_TEST = [256, 128]
    cfg.DATALOADER.SAMPLER = "softmax_triplet"
    cfg.MODEL.ID_LOSS_WEIGHT = 0.25
    cfg.SOLVER.STAGE2.MOMENT_DTYPE = md
    model = make_model_uniprompt(cfg, num_class=1000, camera_num=14, view_num=1)
    variables = init_variables(model, jax.random.PRNGKey(0), cfg)

    batch, iters = 64, 20
    rng = np.random.RandomState(0)
    loss_fn, _ = make_loss(cfg, 1000)
    opt = make_optimizer(cfg.SOLVER.STAGE2, variables["params"], stage="stage2a")
    tf = jnp.asarray(rng.randn(1000, 512).astype(np.float32))
    step = make_train_step(model, cfg, loss_fn, opt, uniprompt=True, text_features=tf)
    state = initial_state(jax.tree_util.tree_map(jnp.array, variables), opt)
    b = {
        "images": jnp.asarray(rng.randint(0, 255, (batch, 256, 128, 3), dtype=np.uint8)),
        "pids": jnp.asarray((np.arange(batch) // 4 % 1000).astype(np.int32)),
        "camids": jnp.zeros(batch, jnp.int32),
        "trackids": jnp.zeros(batch, jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    state, m = step(state, b, 5e-6, key)
    _ = float(m["loss"])
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _i in range(iters):
            state, m = step(state, b, 5e-6, key)
        _ = float(m["loss"])
        _ = float(jnp.sum(jax.tree_util.tree_leaves(state.params)[0]))
        dts.append(time.perf_counter() - t0)
    return iters * batch / min(dts)


def bench_rn50(md):
    from mpreid_tpu.config import get_default_cfg
    from mpreid_tpu.engine.steps import make_train_step
    from mpreid_tpu.engine.train_state import initial_state
    from mpreid_tpu.losses import make_loss
    from mpreid_tpu.models import init_variables, make_model
    from mpreid_tpu.solver import make_optimizer

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "RN50"
    cfg.INPUT.SIZE_TRAIN = [256, 128]
    cfg.INPUT.SIZE_TEST = [256, 128]
    cfg.DATALOADER.SAMPLER = "softmax_triplet"
    cfg.SOLVER.MOMENT_DTYPE = md
    model = make_model(cfg, num_class=1000, camera_num=14, view_num=1)
    variables = init_variables(model, jax.random.PRNGKey(1), cfg)

    batch, iters = 64, 20
    rng = np.random.RandomState(0)
    loss_fn, _ = make_loss(cfg, 1000)
    opt = make_optimizer(cfg.SOLVER, variables["params"], stage="baseline")
    step = make_train_step(model, cfg, loss_fn, opt)
    state = initial_state(jax.tree_util.tree_map(jnp.array, variables), opt)
    b = {
        "images": jnp.asarray(rng.randint(0, 255, (batch, 256, 128, 3), dtype=np.uint8)),
        "pids": jnp.asarray((np.arange(batch) // 4 % 1000).astype(np.int32)),
        "camids": jnp.zeros(batch, jnp.int32),
        "trackids": jnp.zeros(batch, jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    state, m = step(state, b, 5e-6, key)
    _ = float(m["loss"])
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _i in range(iters):
            state, m = step(state, b, 5e-6, key)
        _ = float(m["loss"])
        _ = float(jnp.sum(jax.tree_util.tree_leaves(state.params)[0]))
        dts.append(time.perf_counter() - t0)
    return iters * batch / min(dts)


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    if what in ("stage2", "both"):
        for md in ("float32", "bfloat16"):
            print(f"stage2a moments={md:8s} {bench_stage2(md):7.1f} img/s",
                  flush=True)
    if what in ("rn50", "both"):
        for md in ("float32", "bfloat16"):
            print(f"rn50    moments={md:8s} {bench_rn50(md):7.1f} img/s",
                  flush=True)


if __name__ == "__main__":
    main()
