"""Worker process for tests/test_multiprocess.py.

Launched as ``python tests/_mp_worker.py <proc_id> <nprocs> <coordinator>
<out.npz>``. Each worker owns 4 virtual CPU devices and joins a 2-process
``jax.distributed`` job (the analogue of the reference's NCCL
``init_process_group``, ref train.py:61-62). It feeds ONLY its own half of
every global PK batch — sliced with ``shard_for_host`` (the deterministic
replacement for the reference's gloo-seeded DDP sampler,
ref datasets/sampler_ddp.py:111-196) — runs the shared jitted train step
over the global 8-device mesh, and dumps the updated (replicated) params
for the parent test to compare against the single-process run.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    proc_id, nprocs = int(sys.argv[1]), int(sys.argv[2])
    coordinator, out_path = sys.argv[3], sys.argv[4]
    opt_name = sys.argv[5] if len(sys.argv) > 5 else "SGD"
    n_steps = int(sys.argv[6]) if len(sys.argv) > 6 else 1

    # 4 local virtual devices per process → 8 global. Must be set before
    # jax import; the sitecustomize's axon platform pin is overridden after.
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    # CPU cross-process collectives need an explicit implementation
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=nprocs,
        process_id=proc_id,
    )
    assert jax.process_index() == proc_id
    assert jax.local_device_count() == 4 and jax.device_count() == 4 * nprocs

    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mpreid_tpu.data.sampler import RandomIdentitySampler, shard_for_host
    from mpreid_tpu.engine.steps import make_train_step
    from mpreid_tpu.engine.train_state import initial_state
    from mpreid_tpu.losses import make_loss
    from mpreid_tpu.parallel import make_mesh
    from mpreid_tpu.solver import make_optimizer
    from tiny import tiny_model

    from test_multiprocess import (
        global_batch_arrays, make_cfg, BATCH, NUM_CLASSES,
    )

    cfg = make_cfg(opt_name)
    model, variables = tiny_model(cfg, num_classes=NUM_CLASSES)
    loss_fn, _ = make_loss(cfg, NUM_CLASSES)
    opt = make_optimizer(cfg.SOLVER, variables["params"], stage="baseline")
    step = make_train_step(model, cfg, loss_fn, opt)

    mesh = make_mesh(data=8, model=1)  # global mesh spanning both processes
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))

    # Global PK order is identical on every process (deterministic seed);
    # each host materializes only its contiguous block of every batch.
    images, pids, camids, records = global_batch_arrays()
    sampler = RandomIdentitySampler(records, BATCH, 4, seed=cfg.SOLVER.SEED)
    epoch_order = np.asarray(sampler.epoch_indices(0))
    assert len(epoch_order) >= n_steps * BATCH

    def to_global_batch(arr, local):
        return jax.make_array_from_process_local_data(
            data_sh, np.ascontiguousarray(arr[local]),
            global_shape=(BATCH,) + arr.shape[1:],
        )

    def step_batch(t):
        order = epoch_order[t * BATCH:(t + 1) * BATCH]
        local = shard_for_host(order, BATCH, nprocs, proc_id)
        assert len(local) == BATCH // nprocs
        return {
            "images": to_global_batch(images, local),
            "pids": to_global_batch(pids, local),
            "camids": to_global_batch(camids, local),
            "trackids": to_global_batch(np.zeros_like(pids), local),
        }

    # Params/opt-state/PRNG must be global (replicated) arrays; the
    # optimizer state is built inside jit so its zeros come out replicated.
    params_g = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        variables,
    )
    with mesh:
        state = jax.jit(
            lambda v: initial_state(v, opt), out_shardings=repl
        )(params_g)
        for t in range(n_steps):
            key = jax.make_array_from_process_local_data(
                repl, np.asarray(jax.random.PRNGKey(7 + t))
            )
            state, metrics = step(state, step_batch(t), 1e-3, key)
        loss = float(metrics["loss"])
        leaves = jax.tree_util.tree_leaves(state.params)
        host_leaves = [np.asarray(l.addressable_data(0)) for l in leaves]

    # ---- phase 2: gallery-sharded eval ACROSS PROCESSES ----
    # sharded_cmc_map's psum/all_gather collectives must cross the process
    # boundary (gloo) and still reproduce the dense single-process metrics.
    # The public wrapper asarray-s its inputs (single-process convenience);
    # here every operand is pre-placed as a global array and the jitted impl
    # is invoked directly.
    from mpreid_tpu.parallel.sharded_eval import (
        _sharded_cmc_map_impl, _tie_key_dtype,
    )
    from test_multiprocess import eval_fixture

    qf_np, gf_np, qp, gp, qc, gc = eval_fixture()
    g_shard = gf_np.shape[0] // nprocs

    def repl_arr(x):
        return jax.make_array_from_process_local_data(repl, np.asarray(x))

    qf_g = repl_arr(qf_np)
    gf_g = jax.make_array_from_process_local_data(
        data_sh, gf_np[proc_id * g_shard:(proc_id + 1) * g_shard],
        global_shape=gf_np.shape,
    )
    cap = int(np.bincount(gp).max())
    with mesh:
        cmc, mAP = _sharded_cmc_map_impl(
            qf_g, gf_g, repl_arr(qp), repl_arr(gp), repl_arr(qc), repl_arr(gc),
            20, True, mesh, cap,
            _tie_key_dtype(gf_np.shape[0], mesh.shape["data"]),
        )
        cmc_np = np.asarray(cmc.addressable_data(0))
        map_val = float(np.asarray(mAP.addressable_data(0)))

    np.savez(
        out_path,
        loss=np.float64(loss),
        n_leaves=np.int64(len(host_leaves)),
        cmc=cmc_np,
        mAP=np.float64(map_val),
        **{f"p{i}": l for i, l in enumerate(host_leaves)},
    )
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
