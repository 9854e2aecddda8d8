"""Baseline train/eval drivers (ref ``processor/processor.py``).

``do_train`` owns the epoch loop: per-epoch LR from the schedule, jitted
train steps, periodic eval + checkpoint, samples/s logging with the
reference's metric definition (batch_size / time_per_batch,
ref processor.py:99-105). ``do_inference`` extracts features and runs the
evaluator. Both are thin hosts around the compiled steps in steps.py.
"""

from __future__ import annotations

import logging
import os
import time
from datetime import timedelta
from typing import Callable, Optional

import jax
import numpy as np

from mpreid_tpu.utils.meter import AverageMeter
from mpreid_tpu.utils.checkpoint import save_checkpoint, wait_for_pending_saves

from .evaluator import R1mAPEvaluator
from .steps import make_eval_step, make_train_epoch, make_train_step
from .train_state import TrainState, initial_state


_EVAL_STEP_CACHE: dict = {}


def _cached_eval_step(model, cfg):
    # jax.jit caches per function object — rebuilding the closure every
    # validation would recompile the full eval forward each eval epoch
    key = (id(model), cfg.TPU.COMPUTE_DTYPE, tuple(cfg.INPUT.PIXEL_MEAN),
           tuple(cfg.INPUT.PIXEL_STD), cfg.MODEL.SIE_CAMERA, cfg.MODEL.SIE_VIEW)
    if key not in _EVAL_STEP_CACHE:
        _EVAL_STEP_CACHE[key] = make_eval_step(model, cfg)
    return _EVAL_STEP_CACHE[key]


def run_validation(cfg, model, params, batch_stats, val_loader, num_query,
                   logger=None, epoch: Optional[int] = None):
    """Shared eval loop (ref processor.py:117-158 / 187-208)."""
    evaluator = R1mAPEvaluator(
        num_query,
        max_rank=50,
        feat_norm=cfg.TEST.FEAT_NORM == "yes",
        reranking=cfg.TEST.RE_RANKING,
        camera_filter=cfg.TEST.CAMERA_FILTER,
        rerank_fast=getattr(cfg.TEST, "RERANK_FAST", False),
        rerank_sparse_n=getattr(cfg.TEST, "RERANK_SPARSE_N", 25000),
        dist_metric=getattr(cfg.TEST, "DIST_METRIC", "euclidean"),
    )
    eval_step = _cached_eval_step(model, cfg)
    for batch in val_loader.iter_sequential():
        feat = eval_step(params, batch_stats, {
            "images": batch["images"],
            "camids": batch["camids"],
            "trackids": batch["trackids"],
        })
        n = batch["count"]
        # device-resident chunk: the evaluator concatenates on device, so
        # features never round-trip host↔device between extraction and the
        # distmat (the sharded branch below np.concatenate's them, which
        # fetches once via __array__)
        evaluator.update((feat[:n], batch["pids"][:n], batch["camids"][:n]))

    if getattr(cfg.TPU, "EVAL_SHARDED", False) and len(jax.devices()) > 1 \
            and not cfg.TEST.RE_RANKING:
        # gallery sharded over the mesh — exact CMC/mAP without a full
        # single-device distmat (parallel.sharded_eval)
        import jax.numpy as jnp
        from mpreid_tpu.parallel import make_mesh
        from mpreid_tpu.parallel.sharded_eval import sharded_cmc_map

        feats = np.concatenate(evaluator.feats, axis=0).astype(np.float32)
        pids = np.concatenate(evaluator.pids)
        camids = np.concatenate(evaluator.camids)
        if cfg.TEST.FEAT_NORM == "yes":
            feats = feats / np.linalg.norm(feats, axis=1, keepdims=True)
        nq = evaluator.num_query
        mesh = make_mesh(data=len(jax.devices()), model=1)
        ng = len(feats) - nq
        shards = mesh.shape["data"]
        pad = (-ng) % shards
        gf = feats[nq:]
        g_pids = pids[nq:]
        g_camids = camids[nq:]
        if pad:
            # pad with far-away never-relevant dummies (pid −1, huge
            # features) — ranked last, so metrics are exact
            gf = np.concatenate([gf, np.full((pad, gf.shape[1]), 1e6, gf.dtype)])
            g_pids = np.concatenate([g_pids, np.full(pad, -1, g_pids.dtype)])
            g_camids = np.concatenate([g_camids, np.full(pad, -1, g_camids.dtype)])
        cmc, mAP = sharded_cmc_map(
            jnp.asarray(feats[:nq]), jnp.asarray(gf),
            pids[:nq], g_pids, camids[:nq], g_camids, mesh,
            camera_filter=cfg.TEST.CAMERA_FILTER,
        )
        cmc, mAP, distmat = np.asarray(cmc), float(mAP), None
    else:
        cmc, mAP, distmat, *_ = evaluator.compute()
    # the reference names TEST.DIST_MAT but never writes it (SURVEY.md §5) —
    # here the dump works
    if getattr(cfg.TEST, "DIST_MAT", "") and cfg.OUTPUT_DIR and distmat is not None:
        import numpy as _np

        _np.save(os.path.join(cfg.OUTPUT_DIR, cfg.TEST.DIST_MAT), distmat)
    if logger:
        tag = f" - Epoch: {epoch}" if epoch is not None else " "
        logger.info(f"Validation Results{tag}")
        logger.info("mAP: {:.1%}".format(mAP))
        for r in (1, 5, 10):
            if r <= len(cmc):  # tiny galleries have fewer ranks than 10
                logger.info("CMC curve, Rank-{:<3}:{:.1%}".format(r, cmc[r - 1]))
    return cmc, mAP


def build_device_dataset(train_loader):
    """Decode every train record once and place the uint8 images + labels in
    device memory (TPU.DEVICE_DATASET mode)."""
    batcher = train_loader.batcher
    records = batcher.records
    import jax.numpy as jnp

    images = np.stack(batcher.decode_records(records))
    return (
        jnp.asarray(images),
        jnp.asarray(np.asarray([r[1] for r in records], np.int32)),
        jnp.asarray(np.asarray([r[2] for r in records], np.int32)),
        jnp.asarray(np.asarray([r[3] for r in records], np.int32)),
    )


def epoch_perm(train_loader, epoch: int, seed: int) -> np.ndarray:
    """(n_batches, batch) index matrix for one epoch (full batches only).

    The batch count is FIXED across epochs (anchored to epoch 0's): the PK
    sampler's tail varies by a few batches per epoch, and a varying perm
    shape would recompile the whole epoch scan every epoch. Short epochs
    wrap around; long ones truncate.
    """
    batcher = train_loader.batcher
    bs = batcher.batch_size
    if hasattr(train_loader, "sampler"):
        idxs = np.asarray(train_loader.sampler.epoch_indices(epoch))
        n0 = len(train_loader.sampler.epoch_indices(0))
    else:
        rng = np.random.default_rng(seed + epoch)
        idxs = rng.permutation(len(batcher.records))
        n0 = len(idxs)
    n_fixed = n0 - n0 % bs
    if len(idxs) < n_fixed and len(idxs):
        reps = -(-n_fixed // len(idxs))  # ceil
        idxs = np.tile(idxs, reps)
    return idxs[:n_fixed].reshape(-1, bs)


def do_train(
    cfg,
    model,
    variables,
    train_loader,
    val_loader,
    optimizer,
    scheduler: Callable[[int], float],
    loss_fn,
    num_query: int,
    centers=None,
    max_epochs: Optional[int] = None,
    solver_cfg=None,
):
    """Baseline training loop (ref processor.py:11-164)."""
    solver = solver_cfg if solver_cfg is not None else cfg.SOLVER
    log_period = solver.LOG_PERIOD
    checkpoint_period = solver.CHECKPOINT_PERIOD
    eval_period = solver.EVAL_PERIOD
    epochs = max_epochs or solver.MAX_EPOCHS

    logger = logging.getLogger("mpreid_tpu.train")
    logger.info("start training")

    # config-driven multi-device data parallelism: shard params (TP/EP per
    # param_spec) and batches (DP) over the mesh; GSPMD inserts collectives
    mesh = None
    if len(jax.devices()) > 1 and cfg.TPU.MESH_DATA != 1:
        from mpreid_tpu.parallel import mesh_from_cfg, shard_variables

        mesh = mesh_from_cfg(cfg)
        tp_towers = getattr(cfg.TPU, "TP_TOWERS", False)
        variables = shard_variables(variables, mesh, tp_towers=tp_towers)
        logger.info(
            f"Training over mesh {dict(mesh.shape)}"
            + (" with tensor-parallel towers" if tp_towers else "")
        )
        if getattr(cfg.TPU, "ZERO_OPT_STATE", False):
            from mpreid_tpu.parallel import zero_sharded

            optimizer = zero_sharded(optimizer, mesh, tp_towers=tp_towers)
            logger.info("ZeRO-1: optimizer moments sharded over 'data'")

    with_center = "center" in cfg.MODEL.METRIC_LOSS_TYPE
    train_step = make_train_step(
        model, cfg, loss_fn, optimizer,
        center_weight=solver.CENTER_LOSS_WEIGHT if with_center else None,
        center_lr=solver.CENTER_LR if with_center else None,
    )
    device_data = None
    epoch_fn = None
    if getattr(cfg.TPU, "DEVICE_DATASET", False) and mesh is None:
        device_data = build_device_dataset(train_loader)
        epoch_fn = make_train_epoch(
            model, cfg, loss_fn, optimizer,
            center_weight=solver.CENTER_LOSS_WEIGHT if with_center else None,
            center_lr=solver.CENTER_LR if with_center else None,
        )
        logger.info(
            f"Device-resident dataset: {device_data[0].shape[0]} images in HBM"
        )
    state = initial_state(variables, optimizer, centers=centers if with_center else None)
    start_epoch = 1
    if getattr(cfg.SOLVER, "RESUME", ""):
        from mpreid_tpu.utils.checkpoint import load_checkpoint, unnest_opt_state

        restored = load_checkpoint(cfg.SOLVER.RESUME, cfg)
        state = TrainState(
            params=restored["params"],
            batch_stats=restored.get("batch_stats", {}),
            opt_state=unnest_opt_state(restored["opt_state"]),
            centers=restored.get("centers", state.centers),
        )
        start_epoch = int(restored["epoch"]) + 1
        logger.info(f"Resumed from {cfg.SOLVER.RESUME} at epoch {start_epoch}")

    loss_meter, acc_meter = AverageMeter(), AverageMeter()
    key = jax.random.PRNGKey(cfg.SOLVER.SEED)
    all_start = time.monotonic()
    history = []

    for epoch in range(start_epoch, epochs + 1):
        start_time = time.time()
        loss_meter.reset()
        acc_meter.reset()
        lr = scheduler(epoch)

        if epoch_fn is not None:
            # whole epoch as one compiled scan over the HBM-resident dataset
            import jax.numpy as jnp

            perm = epoch_perm(train_loader, epoch, cfg.SOLVER.SEED)
            key, epoch_key = jax.random.split(key)
            # profile the second epoch (the first carries the compile)
            profiling = bool(cfg.TPU.PROFILE_DIR) and epoch == start_epoch + 1
            if profiling:
                jax.profiler.start_trace(cfg.TPU.PROFILE_DIR)
            state, (losses, accs) = epoch_fn(
                state, *device_data, jnp.asarray(perm), lr, epoch_key
            )
            if profiling:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                logger.info(f"Wrote profiler trace to {cfg.TPU.PROFILE_DIR}")
            losses = np.asarray(losses)
            accs = np.asarray(accs)
            for i in range(len(losses)):
                loss_meter.update(float(losses[i]), train_loader.batcher.batch_size)
                acc_meter.update(float(accs[i]), 1)
            n_iter = len(losses) - 1
            jax.block_until_ready(state.params)
            time_per_batch = (time.time() - start_time) / max(n_iter + 1, 1)
            logger.info(
                "Epoch {} done. Loss: {:.3f}, Acc: {:.3f}, Time per batch: {:.3f}[s] Speed: {:.1f}[samples/s]".format(
                    epoch, loss_meter.avg, acc_meter.avg, time_per_batch,
                    train_loader.batcher.batch_size / time_per_batch,
                )
            )
            history.append({"epoch": epoch, "loss": loss_meter.avg, "acc": acc_meter.avg})
            if cfg.OUTPUT_DIR and epoch % checkpoint_period == 0:
                save_checkpoint(
                    os.path.join(cfg.OUTPUT_DIR, f"{cfg.MODEL.NAME}_{epoch}"), state, epoch,
                    cfg=cfg,
                )
            if epoch % eval_period == 0 and val_loader is not None:
                run_validation(cfg, model, state.params, state.batch_stats,
                               val_loader, num_query, logger, epoch)
            continue

        n_iter = -1
        profiling = False
        pending = []  # device metric scalars — fetched only at log points so
        # the hot loop never synchronizes with the device
        batch_size = train_loader.batcher.batch_size

        def drain():
            for m in pending:
                loss_meter.update(float(m["loss"]), batch_size)
                acc_meter.update(float(m["acc"]), 1)
            pending.clear()

        for n_iter, batch in enumerate(train_loader.epoch(epoch)):
            if cfg.TPU.PROFILE_DIR and epoch == 1 and n_iter == 1:
                jax.profiler.start_trace(cfg.TPU.PROFILE_DIR)
                profiling = True
            key, step_key = jax.random.split(key)
            device_batch = {
                k: batch[k] for k in ("images", "pids", "camids", "trackids")
            }
            if mesh is not None:
                from mpreid_tpu.parallel import shard_batch

                device_batch = shard_batch(device_batch, mesh)
            state, metrics = train_step(state, device_batch, lr, step_key)
            pending.append(metrics)
            if profiling and n_iter == cfg.TPU.PROFILE_STEPS:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                profiling = False
                logger.info(f"Wrote profiler trace to {cfg.TPU.PROFILE_DIR}")
            if (n_iter + 1) % log_period == 0:
                drain()
                logger.info(
                    "Epoch[{}] Iteration[{}/{}] Loss: {:.3f}, Acc: {:.3f}, Base Lr: {:.2e}".format(
                        epoch, n_iter + 1, len(train_loader), loss_meter.avg,
                        acc_meter.avg, lr,
                    )
                )
        drain()
        if profiling:
            jax.profiler.stop_trace()
        if n_iter < 0:
            raise RuntimeError("empty training epoch — dataset smaller than one batch")

        jax.block_until_ready(state.params)
        time_per_batch = (time.time() - start_time) / (n_iter + 1)
        logger.info(
            "Epoch {} done. Time per batch: {:.3f}[s] Speed: {:.1f}[samples/s]".format(
                epoch, time_per_batch, train_loader.batcher.batch_size / time_per_batch
            )
        )
        history.append({"epoch": epoch, "loss": loss_meter.avg, "acc": acc_meter.avg})

        if cfg.OUTPUT_DIR and epoch % checkpoint_period == 0:
            save_checkpoint(
                os.path.join(cfg.OUTPUT_DIR, f"{cfg.MODEL.NAME}_{epoch}"), state, epoch,
                cfg=cfg,
            )
        if epoch % eval_period == 0 and val_loader is not None:
            run_validation(cfg, model, state.params, state.batch_stats,
                           val_loader, num_query, logger, epoch)

    total = timedelta(seconds=time.monotonic() - all_start)
    logger.info(f"Total running time: {total}")
    wait_for_pending_saves()  # surface any async checkpoint-write failure
    return state, history


def do_inference(cfg, model, variables, val_loader, num_query: int):
    """Feature extraction + metrics (ref processor.py:166-208)."""
    logger = logging.getLogger("mpreid_tpu.test")
    logger.info("Enter inferencing")
    cmc, mAP = run_validation(
        cfg, model, variables["params"], variables.get("batch_stats", {}),
        val_loader, num_query, logger,
    )
    return cmc[0], cmc[4]
