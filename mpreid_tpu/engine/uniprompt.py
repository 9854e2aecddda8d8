"""Uni-Prompt stage drivers (ref ``processor/processor_uniprompt_stage1.py``
and ``processor_uniprompt_stage2.py``).

Stage 1 (a/b): build an image-feature bank once with the frozen encoder,
then train only the prompt contexts with SupCon i2t+t2i over shuffled bank
batches. Stage 2 (a/b): precompute text features for every class, then
fine-tune with ID + triplet + i2t losses under the stage's freeze policy.

The four freeze regimes are four optimizers over one TrainState
(solver.optim.stage_trainable), not four model rebuilds.
"""

from __future__ import annotations

import logging
import os
import time
from datetime import timedelta
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mpreid_tpu.utils.checkpoint import save_checkpoint, wait_for_pending_saves
from mpreid_tpu.utils.meter import AverageMeter

from .processor import run_validation
from .steps import (
    make_image_bank_step,
    make_stage1_epoch,
    make_stage1_step,
    make_text_step,
    make_train_step,
)
from .train_state import TrainState, initial_state


def build_image_bank(cfg, model, variables, train_loader_stage1):
    """One pass over the train set with the frozen encoder
    (ref stage1:41-64). Returns (features, labels, views) numpy arrays."""
    bank_step = make_image_bank_step(model, cfg)
    feats, labels, views = [], [], []
    for batch in train_loader_stage1.epoch(0, drop_last=False):
        f = bank_step(
            variables["params"], variables.get("batch_stats", {}),
            {"images": batch["images"]},
        )
        n = batch["count"]
        feats.append(np.asarray(f)[:n])
        labels.append(batch["pids"][:n])
        views.append(batch["trackids"][:n])
    return (
        np.concatenate(feats),
        np.concatenate(labels),
        np.concatenate(views),
    )


def do_train_stage1(
    cfg,
    model,
    variables,
    train_loader_stage1,
    optimizer,
    scheduler: Callable[[int], float],
    is_stage1b: bool = False,
    bank=None,
    stage_cfg=None,
):
    """Prompt-context training (ref processor_uniprompt_stage1.py:11-120)."""
    stage_cfg = stage_cfg or cfg.SOLVER.STAGE1
    logger = logging.getLogger("mpreid_tpu.train")
    stage = "1b" if is_stage1b else "1a"
    logger.info(f"Start training stage {stage}")
    all_start = time.monotonic()

    if bank is None:
        bank = build_image_bank(cfg, model, variables, train_loader_stage1)
    feats_bank, labels_bank, views_bank = bank
    feats_bank = jnp.asarray(feats_bank)
    labels_bank = jnp.asarray(labels_bank)
    views_bank = jnp.asarray(views_bank)

    step_fn = make_stage1_step(model, cfg, optimizer, stage=stage)
    epoch_fn = make_stage1_epoch(model, cfg, optimizer, stage=stage)
    state = initial_state(variables, optimizer)

    batch = stage_cfg.IMS_PER_BATCH
    num_image = labels_bank.shape[0]
    i_ter = num_image // batch
    loss_meter = AverageMeter()
    rng = np.random.default_rng(cfg.SOLVER.SEED)
    history = []

    for epoch in range(1, stage_cfg.MAX_EPOCHS + 1):
        loss_meter.reset()
        lr = scheduler(epoch)
        perm = rng.permutation(num_image)
        # full batches run as one compiled scan (no host round-trips) ...
        if i_ter > 0:
            idx = jnp.asarray(perm[: i_ter * batch].reshape(i_ter, batch))
            state, losses = epoch_fn(
                state, feats_bank, labels_bank, views_bank, idx, lr
            )
            losses = np.asarray(losses)
            for i in range(i_ter):
                loss_meter.update(float(losses[i]), batch)
                if (i + 1) % stage_cfg.LOG_PERIOD == 0:
                    logger.info(
                        "Epoch[{}] Iteration[{}/{}] Loss: {:.3f}, Base Lr: {:.2e}".format(
                            epoch, i + 1, i_ter + 1, loss_meter.avg, lr
                        )
                    )
        # ... the trailing partial batch runs through the single-step fn
        rest = perm[i_ter * batch :]
        if len(rest):
            sel = jnp.asarray(rest)
            state, metrics = step_fn(
                state,
                feats_bank[sel],
                labels_bank[sel],
                views_bank[sel] if is_stage1b else None,
                lr,
            )
            loss_meter.update(float(metrics["loss"]), len(rest))
        history.append({"epoch": epoch, "loss": loss_meter.avg})
        if cfg.OUTPUT_DIR and epoch % stage_cfg.CHECKPOINT_PERIOD == 0:
            save_checkpoint(
                os.path.join(cfg.OUTPUT_DIR, f"{cfg.MODEL.NAME}_stage{stage}_{epoch}"),
                state, epoch, cfg=cfg,
            )

    logger.info(
        f"Stage {stage} running time: {timedelta(seconds=time.monotonic() - all_start)}"
    )
    # the jitted steps donate their input state — rebind every collection so
    # callers never hold handles to consumed buffers
    variables = dict(variables)
    variables["params"] = state.params
    variables["batch_stats"] = state.batch_stats
    wait_for_pending_saves()  # surface any async checkpoint-write failure
    return variables, history


def precompute_text_features(cfg, model, variables, num_classes: int,
                             batch: Optional[int] = None) -> np.ndarray:
    """Per-class text features in label batches (ref stage2:58-73)."""
    batch = batch or cfg.SOLVER.STAGE2.IMS_PER_BATCH
    text_step = make_text_step(model, stage="2")
    out = []
    for start in range(0, num_classes, batch):
        labels = jnp.arange(start, min(start + batch, num_classes))
        out.append(np.asarray(text_step(
            variables["params"], variables.get("batch_stats", {}), labels
        )))
    return np.concatenate(out, axis=0)


def do_train_stage2(
    cfg,
    model,
    variables,
    train_loader_stage2,
    val_loader,
    optimizer,
    scheduler: Callable[[int], float],
    loss_fn,
    num_query: int,
    num_classes: int,
    centers=None,
    max_epochs: Optional[int] = None,
    log_period: Optional[int] = None,
    checkpoint_period: Optional[int] = None,
    eval_period: Optional[int] = None,
):
    """Stage-2 fine-tune (ref processor_uniprompt_stage2.py:14-223)."""
    s2 = cfg.SOLVER.STAGE2
    max_epochs = max_epochs or s2.MAX_EPOCHS
    log_period = log_period or s2.LOG_PERIOD
    checkpoint_period = checkpoint_period or s2.CHECKPOINT_PERIOD
    eval_period = eval_period or s2.EVAL_PERIOD

    logger = logging.getLogger("mpreid_tpu.train")
    logger.info("start training")
    all_start = time.monotonic()

    text_features = jnp.asarray(
        precompute_text_features(cfg, model, variables, num_classes)
    )
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
        model, cfg, loss_fn, optimizer, uniprompt=True, text_features=text_features,
        center_weight=s2.CENTER_LOSS_WEIGHT if with_center else None,
        center_lr=s2.CENTER_LR if with_center else None,
    )
    device_data = None
    epoch_fn = None
    if getattr(cfg.TPU, "DEVICE_DATASET", False) and mesh is None:
        from .processor import build_device_dataset, epoch_perm
        from .steps import make_train_epoch

        device_data = build_device_dataset(train_loader_stage2)
        epoch_fn = make_train_epoch(
            model, cfg, loss_fn, optimizer, uniprompt=True,
            text_features=text_features,
            center_weight=s2.CENTER_LOSS_WEIGHT if with_center else None,
            center_lr=s2.CENTER_LR if with_center else None,
        )
        logger.info(
            f"Device-resident dataset: {device_data[0].shape[0]} images in HBM"
        )
    state = initial_state(variables, optimizer, centers=centers if with_center else None)

    loss_meter, acc_meter = AverageMeter(), AverageMeter()
    key = jax.random.PRNGKey(cfg.SOLVER.SEED)
    history = []

    for epoch in range(1, max_epochs + 1):
        start_time = time.time()
        loss_meter.reset()
        acc_meter.reset()
        lr = scheduler(epoch)
        if epoch_fn is not None:
            from .processor import epoch_perm

            perm = epoch_perm(train_loader_stage2, epoch, cfg.SOLVER.SEED)
            key, epoch_key = jax.random.split(key)
            state, (losses, accs) = epoch_fn(
                state, *device_data, jnp.asarray(perm), lr, epoch_key
            )
            losses, accs = np.asarray(losses), np.asarray(accs)
            bsz = train_loader_stage2.batcher.batch_size
            for i in range(len(losses)):
                loss_meter.update(float(losses[i]), bsz)
                acc_meter.update(float(accs[i]), 1)
            n_iter = len(losses) - 1
            jax.block_until_ready(state.params)
            time_per_batch = (time.time() - start_time) / max(n_iter + 1, 1)
            logger.info(
                "Epoch {} done. Loss: {:.3f}, Acc: {:.3f}, Time per batch: {:.3f}[s] Speed: {:.1f}[samples/s]".format(
                    epoch, loss_meter.avg, acc_meter.avg, time_per_batch, bsz / time_per_batch,
                )
            )
            history.append({"epoch": epoch, "loss": loss_meter.avg, "acc": acc_meter.avg})
            out_dir = cfg.OUTPUT_DIR and os.path.join(cfg.OUTPUT_DIR, cfg.DATASETS.EXP_SETTING)
            if out_dir and epoch % checkpoint_period == 0:
                save_checkpoint(os.path.join(out_dir, f"{cfg.MODEL.NAME}_{epoch}"), state, epoch, cfg=cfg)
            if epoch % eval_period == 0 and val_loader is not None:
                run_validation(cfg, model, state.params, state.batch_stats,
                               val_loader, num_query, logger, epoch)
            continue
        n_iter = -1
        pending = []  # device scalars; fetched at log points only
        bsz = train_loader_stage2.batcher.batch_size

        def drain():
            for m in pending:
                loss_meter.update(float(m["loss"]), bsz)
                acc_meter.update(float(m["acc"]), 1)
            pending.clear()

        for n_iter, batch in enumerate(train_loader_stage2.epoch(epoch)):
            key, step_key = jax.random.split(key)
            device_batch = {
                k: batch[k] for k in ("images", "pids", "camids", "trackids")
            }
            if mesh is not None:
                from mpreid_tpu.parallel import shard_batch

                device_batch = shard_batch(device_batch, mesh)
            state, metrics = train_step(state, device_batch, lr, step_key)
            pending.append(metrics)
            if (n_iter + 1) % log_period == 0:
                drain()
                logger.info(
                    "Epoch[{}] Iteration[{}/{}] Loss: {:.3f}, Acc: {:.3f}, Base Lr: {:.2e}".format(
                        epoch, n_iter + 1, len(train_loader_stage2),
                        loss_meter.avg, acc_meter.avg, lr,
                    )
                )
        drain()
        if n_iter < 0:
            raise RuntimeError("empty training epoch — dataset smaller than one batch")

        jax.block_until_ready(state.params)
        time_per_batch = (time.time() - start_time) / (n_iter + 1)
        logger.info(
            "Epoch {} done. Time per batch: {:.3f}[s] Speed: {:.1f}[samples/s]".format(
                epoch, time_per_batch,
                train_loader_stage2.batcher.batch_size / time_per_batch,
            )
        )
        history.append({"epoch": epoch, "loss": loss_meter.avg, "acc": acc_meter.avg})

        out_dir = cfg.OUTPUT_DIR and os.path.join(cfg.OUTPUT_DIR, cfg.DATASETS.EXP_SETTING)
        if out_dir and epoch % checkpoint_period == 0:
            save_checkpoint(os.path.join(out_dir, f"{cfg.MODEL.NAME}_{epoch}"), state, epoch, cfg=cfg)
        if epoch % eval_period == 0 and val_loader is not None:
            run_validation(cfg, model, state.params, state.batch_stats,
                           val_loader, num_query, logger, epoch)

    logger.info(f"Total running time: {timedelta(seconds=time.monotonic() - all_start)}")
    variables = dict(variables)
    variables["params"] = state.params
    variables["batch_stats"] = state.batch_stats
    wait_for_pending_saves()  # surface any async checkpoint-write failure
    return variables, history


def do_inference(cfg, model, variables, val_loader, num_query: int):
    """Uni-Prompt eval (ref processor_uniprompt_stage2.py:225-266) —
    identical flow to the baseline's; delegate."""
    from .processor import do_inference as _base_do_inference

    return _base_do_inference(cfg, model, variables, val_loader, num_query)
