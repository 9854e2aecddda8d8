"""Jitted step builders — the compiled hot loops.

Each builder closes over the model, config statics and optimizer trees and
returns one ``jax.jit``-compiled function; the host epoch drivers
(processor.py / uniprompt.py) just stream batches through them. Augmentation
runs inside the same compiled program as the forward/backward so a training
step is a single device launch per batch.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from mpreid_tpu.losses import center_loss, supcon_loss
from mpreid_tpu.models.moe import load_balancing_loss
from mpreid_tpu.models.uniprompt import UniPromptReID
from mpreid_tpu.ops.augment import eval_preprocess, train_augment

from .train_state import TrainState


def _labels_for(cfg, batch):
    cam = batch["camids"] if cfg.MODEL.SIE_CAMERA else None
    view = batch["trackids"] if cfg.MODEL.SIE_VIEW else None
    return cam, view


def _augment_args(cfg):
    return dict(
        mean=tuple(cfg.INPUT.PIXEL_MEAN),
        std=tuple(cfg.INPUT.PIXEL_STD),
        flip_prob=cfg.INPUT.PROB,
        padding=cfg.INPUT.PADDING,
        re_prob=cfg.INPUT.RE_PROB,
    )


def _train_step_impl(
    model, cfg, loss_fn, optimizer, uniprompt, aug, use_center,
    center_weight, center_lr, aux_coeff,
    train_params, frozen_params, opt_state, batch_stats, centers,
    batch, lr, key, text_feats,
):
    """Shared body of the per-step and whole-epoch train paths."""
    x = train_augment(batch["images"], key, **aug)
    target = batch["pids"]
    cam, view = _labels_for(cfg, batch)

    def inner(train_sub, centers_in):
        params = optimizer.merge(train_sub, frozen_params)
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, target, cam, view, train=True, mutable=["batch_stats"],
        )
        if uniprompt and text_feats is not None:
            score = out["scores"][0]
            feat = out["feats"][1]
            logits_i2t = jnp.dot(
                out["img_feature_proj"].astype(jnp.float32),
                text_feats.astype(jnp.float32).T,
                preferred_element_type=jnp.float32,
            )
            loss = loss_fn(score, feat, target, cam, logits_i2t)
        else:
            loss = loss_fn(out["scores"], out["feats"], target, cam)
        if aux_coeff and "router_logits" in out:
            rl = out["router_logits"]  # (n_gating_blocks, N, E)
            aux = jnp.mean(
                jax.vmap(lambda l: load_balancing_loss(l, cfg.MODEL.MOE.TOP_K))(rl)
            )
            loss = loss + aux_coeff * aux
        if use_center:
            loss = loss + center_weight * center_loss(centers_in, out["feats"][1], target)
        if uniprompt and text_feats is not None:
            # the reference logs stage-2 acc from the i2t logits
            # (ref processor_uniprompt_stage2.py:143)
            acc_logits = logits_i2t
        else:
            acc_logits = out["scores"][0]
        acc = jnp.mean(
            (jnp.argmax(acc_logits, axis=-1) == target).astype(jnp.float32)
        )
        return loss, (mut["batch_stats"], acc)

    if use_center:
        (loss, (bs, acc)), (grads, cgrad) = jax.value_and_grad(
            inner, argnums=(0, 1), has_aux=True
        )(train_params, centers)
        new_centers = centers - center_lr * (cgrad / center_weight)
    else:
        (loss, (bs, acc)), grads = jax.value_and_grad(inner, has_aux=True)(
            train_params, centers
        )
        new_centers = centers

    new_train, new_opt = optimizer.update(grads, opt_state, train_params, lr)
    return new_train, new_opt, bs, new_centers, loss, acc


def make_train_step(
    model,
    cfg,
    loss_fn: Callable,
    optimizer,
    uniprompt: bool = False,
    text_features: Optional[jax.Array] = None,
    center_weight: Optional[float] = None,
    center_lr: Optional[float] = None,
):
    """Baseline/stage-2 train step (ref processor.py:57-88 /
    processor_uniprompt_stage2.py:88-156 hot loops).

    With ``uniprompt`` and precomputed ``text_features`` the step adds the
    image-to-text logits term: ``logits_i2t = img_proj @ text_features.T``
    using score head 0 and feature head 1 only (ref stage2:110-119). MoE
    router logits contribute the load-balancing aux loss with the
    reference's hardcoded 0.01 coefficient made configurable
    (ref stage2:75-77,121-128).
    """
    aug = _augment_args(cfg)
    use_center = center_weight is not None
    aux_coeff = cfg.MODEL.MOE.AUX_LOSS_COEFF if cfg.MODEL.MOE.ENABLED else 0.0

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, lr, key, text_feats=None):
        # differentiate only w.r.t. the trainable partition — frozen params
        # get neither gradients nor optimizer moments
        train_params, frozen_params = optimizer.partition(state.params)
        new_train, new_opt, bs, new_centers, loss, acc = _train_step_impl(
            model, cfg, loss_fn, optimizer, uniprompt, aug, use_center,
            center_weight, center_lr, aux_coeff,
            train_params, frozen_params, state.opt_state, state.batch_stats,
            state.centers, batch, lr, key, text_feats,
        )
        new_state = TrainState(
            params=optimizer.merge(new_train, frozen_params),
            batch_stats=bs, opt_state=new_opt, centers=new_centers,
        )
        return new_state, {"loss": loss, "acc": acc}

    if uniprompt and text_features is not None:
        return functools.partial(step, text_feats=text_features)
    return step


def make_train_epoch(
    model,
    cfg,
    loss_fn: Callable,
    optimizer,
    uniprompt: bool = False,
    text_features: Optional[jax.Array] = None,
    center_weight: Optional[float] = None,
    center_lr: Optional[float] = None,
):
    """Whole training epoch as ONE compiled scan over a device-resident
    dataset (TPU.DEVICE_DATASET mode).

    The uint8 train images live in HBM; per scan step a PK batch is gathered
    by index, augmented, and stepped — no host round-trips or uploads inside
    the epoch. Only the trainable partition + moments + batch_stats +
    centers ride the carry. Returns (state, (losses, accs))."""
    aug = _augment_args(cfg)
    use_center = center_weight is not None
    aux_coeff = cfg.MODEL.MOE.AUX_LOSS_COEFF if cfg.MODEL.MOE.ENABLED else 0.0

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch(state: TrainState, images, pids, camids, trackids, perm, lr, key,
              text_feats=None):
        train0, frozen = optimizer.partition(state.params)

        def body(carry, idx):
            train_sub, opt_state, bstats, centers, k = carry
            k, sk = jax.random.split(k)
            batch = {
                "images": jnp.take(images, idx, axis=0),
                "pids": jnp.take(pids, idx, axis=0),
                "camids": jnp.take(camids, idx, axis=0),
                "trackids": jnp.take(trackids, idx, axis=0),
            }
            new_train, new_opt, bs, new_centers, loss, acc = _train_step_impl(
                model, cfg, loss_fn, optimizer, uniprompt, aug, use_center,
                center_weight, center_lr, aux_coeff,
                train_sub, frozen, opt_state, bstats, centers,
                batch, lr, sk, text_feats,
            )
            return (new_train, new_opt, bs, new_centers, k), (loss, acc)

        init = (train0, state.opt_state, state.batch_stats, state.centers, key)
        (train_f, opt_f, bs_f, centers_f, _), (losses, accs) = jax.lax.scan(
            body, init, perm
        )
        new_state = TrainState(
            params=optimizer.merge(train_f, frozen),
            batch_stats=bs_f, opt_state=opt_f, centers=centers_f,
        )
        return new_state, (losses, accs)

    if uniprompt and text_features is not None:
        return functools.partial(epoch, text_feats=text_features)
    return epoch


def make_eval_step(model, cfg):
    """Eval feature extraction (ref processor.py:187-200 hot loop)."""
    mean, std = tuple(cfg.INPUT.PIXEL_MEAN), tuple(cfg.INPUT.PIXEL_STD)

    @functools.partial(jax.jit, static_argnames=("flip",))
    def step(params, batch_stats, batch, flip: bool = False):
        x = eval_preprocess(batch["images"], mean=mean, std=std)
        if flip:
            x = x[:, :, ::-1, :]
        cam, view = _labels_for(cfg, batch)
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, cam_label=cam, view_label=view, train=False,
        )

    return step


def make_image_bank_step(model, cfg):
    """Frozen-encoder projected features (stage-1 bank build,
    ref processor_uniprompt_stage1.py:41-64)."""
    mean, std = tuple(cfg.INPUT.PIXEL_MEAN), tuple(cfg.INPUT.PIXEL_STD)

    @jax.jit
    def step(params, batch_stats, batch):
        x = eval_preprocess(batch["images"], mean=mean, std=std)
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, method=UniPromptReID.get_image,
        )

    return step


def make_text_step(model, stage: str):
    """Prompted text features for labels (ref make_model_uniprompt.py:160-170)."""

    @functools.partial(jax.jit, static_argnames=("with_view",))
    def step(params, batch_stats, labels, views=None, with_view: bool = False):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            labels, views if with_view else None, stage,
            method=UniPromptReID.get_text,
        )

    return step


def _stage1_step_impl(model, optimizer, stage: str, state: TrainState,
                      image_feats, target, views, lr):
    train_params, frozen_params = optimizer.partition(state.params)

    def inner(train_sub):
        params = optimizer.merge(train_sub, frozen_params)
        text_feats = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            target, views, stage,
            method=UniPromptReID.get_text,
        )
        loss_i2t = supcon_loss(image_feats, text_feats, target, target)
        loss_t2i = supcon_loss(text_feats, image_feats, target, target)
        return loss_i2t + loss_t2i

    loss, grads = jax.value_and_grad(inner)(train_params)
    new_train, new_opt = optimizer.update(grads, state.opt_state, train_params, lr)
    return (
        TrainState(
            params=optimizer.merge(new_train, frozen_params),
            batch_stats=state.batch_stats,
            opt_state=new_opt,
            centers=state.centers,
        ),
        {"loss": loss},
    )


def make_stage1_step(model, cfg, optimizer, stage: str):
    """Prompt-context training step (ref processor_uniprompt_stage1.py:72-98):
    SupCon(i2t) + SupCon(t2i) against a precomputed image-feature bank."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, image_feats, target, views, lr):
        return _stage1_step_impl(model, optimizer, stage, state,
                                 image_feats, target, views, lr)

    return step


def make_stage1_epoch(model, cfg, optimizer, stage: str):
    """Whole stage-1 epoch as ONE compiled scan.

    The image-feature bank is device-resident, so an epoch needs no host
    round-trips at all: scan over the permuted batch indices, one optimizer
    step per batch. Only the trainable partition + optimizer moments ride
    the scan carry — the frozen 150M-param tree is a loop invariant, so the
    carry is a few MB instead of the full model. Returns
    (state, per-batch losses).
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch(state: TrainState, feats_bank, labels_bank, views_bank, perm, lr):
        train0, frozen = optimizer.partition(state.params)

        def body(carry, idx):
            train_sub, opt_state = carry
            f = jnp.take(feats_bank, idx, axis=0)
            t = jnp.take(labels_bank, idx, axis=0)
            vw = jnp.take(views_bank, idx, axis=0) if stage == "1b" else None

            def inner(ts):
                params = optimizer.merge(ts, frozen)
                text_feats = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    t, vw, stage, method=UniPromptReID.get_text,
                )
                return supcon_loss(f, text_feats, t, t) + supcon_loss(
                    text_feats, f, t, t
                )

            loss, grads = jax.value_and_grad(inner)(train_sub)
            new_train, new_opt = optimizer.update(grads, opt_state, train_sub, lr)
            return (new_train, new_opt), loss

        (train_f, opt_f), losses = jax.lax.scan(
            body, (train0, state.opt_state), perm
        )
        new_state = TrainState(
            params=optimizer.merge(train_f, frozen),
            batch_stats=state.batch_stats,
            opt_state=opt_f,
            centers=state.centers,
        )
        return new_state, losses

    return epoch
