"""Test-time augmentation / prompt-tuning eval modes.

Re-implementations of the reference's two TTPT inference paths
(``processor_uniprompt_stage2.py:269-693``) against the *current*
PromptLearner — the reference's versions reference ``prompt_learner.cls_ctx``
which no longer exists there (SURVEY.md §2.2 #33, bitrot). Here the tuned
context is ``ctx_generic``.

* Option A (``do_inference_tta``): image-image retrieval where each query
  feature is the mean over {original, h-flipped, pseudo-IR (channel mean),
  pseudo-RGB (first channel replicated)} views (ref ``:607-650``) — the
  pseudo-modality trick for cross-modality robustness.
* CLIP-style / Option B (``do_inference_ttpt``): per-query-batch the generic
  prompt context is tuned for a few AdamW steps by entropy minimization of
  softmax(image·textᵀ/T) over all classes (ref ``:359-413``); the tuned text
  feature of the most-similar class becomes the query, and retrieval runs
  text→gallery-projection (ref ``:460-476``). The whole tuning loop compiles
  to one XLA program per batch shape (lax.fori_loop over steps).

Metric note: the reference's TTPT paths apply the *standard* same-pid+same-
camera filter (unlike its main eval path) — preserved here via
``camera_filter=True``, and averaging is over valid queries (cmc_map
semantics) rather than the reference's divide-by-all-queries.
"""

from __future__ import annotations

import functools
import logging
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mpreid_tpu.models.uniprompt import UniPromptReID
from mpreid_tpu.ops import cmc_map
from mpreid_tpu.ops.augment import eval_preprocess

from .evaluator import R1mAPEvaluator


def tta_views(x: jax.Array):
    """The four pseudo-modality TTA views of a preprocessed image batch
    (ref ``processor_uniprompt_stage2.py:607-650``): original, h-flip,
    pseudo-IR (channel mean replicated), pseudo-RGB (first channel
    replicated). The ONE copy of this math — ``do_inference_tta`` and the
    bench scan (``utils/benchkit.py::make_tta_scan``) both call it."""
    views = [x, x[:, :, ::-1, :]]
    gray = jnp.mean(x, axis=-1, keepdims=True)
    views.append(jnp.broadcast_to(gray, x.shape))
    views.append(jnp.broadcast_to(x[..., 0:1], x.shape))
    return views


def tta_aggregate(fwd, x: jax.Array):
    """(mean feature over the TTA views, plain-view feature)."""
    feats = [fwd(v) for v in tta_views(x)]
    return jnp.mean(jnp.stack(feats, axis=0), axis=0), feats[0]


@functools.lru_cache(maxsize=8)
def _eval_feature_step_cached(model, feat_norm: bool = False):
    """Jitted eval features from *preprocessed* float images.

    CACHED across inference calls (flax modules hash by structure): a fresh
    ``@jax.jit`` closure per ``do_inference_*`` call re-traces the full
    tower every call — measured ~3 s of host time per TTA inference on this
    1-core host, swamping the 0.6 s of device work. ``feat_norm=True``
    fuses the L2 normalization into the same program."""

    @jax.jit
    def step(params, batch_stats, x, cam, view):
        f = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, cam_label=cam, view_label=view, train=False,
        )
        if feat_norm:
            f = f / jnp.linalg.norm(f, axis=1, keepdims=True)
        return f

    return step


def _eval_feature_step(model, cfg):
    """Eval features from *preprocessed* float images (TTA variants reuse it)."""
    return _eval_feature_step_cached(model)


@functools.lru_cache(maxsize=8)
def _tta_query_step(model, feat_norm: bool):
    """ONE jitted program per batch shape for a TTA query batch: all four
    pseudo-modality view forwards + aggregation + the query/gallery
    boundary select + L2 norm. Replaces 4 separate dispatches plus ~6
    op-by-op device calls (each paying tunnel latency on remote backends).
    ``boundary`` is a traced scalar — straddling batches reuse the same
    executable."""

    @jax.jit
    def step(params, batch_stats, x, cam, view, boundary):
        def fwd(v):
            return model.apply(
                {"params": params, "batch_stats": batch_stats},
                v, cam_label=cam, view_label=view, train=False,
            )

        agg, plain = tta_aggregate(fwd, x)
        row = jnp.arange(agg.shape[0])[:, None]
        feat = jnp.where(row < boundary, agg, plain)
        if feat_norm:
            feat = feat / jnp.linalg.norm(feat, axis=1, keepdims=True)
        return feat

    return step


def _labels(cfg, batch):
    cam = jnp.asarray(batch["camids"]) if cfg.MODEL.SIE_CAMERA else None
    view = jnp.asarray(batch["trackids"]) if cfg.MODEL.SIE_VIEW else None
    return cam, view


def do_inference_tta(cfg, model, variables, val_loader, num_query: int):
    """Option A: TTA + pseudo-modality aggregated image features."""
    logger = logging.getLogger("mpreid_tpu.test_tta")
    logger.info("Enter inferencing with TTA (Option A - Image Feature Evaluation)")

    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    mean, std = tuple(cfg.INPUT.PIXEL_MEAN), tuple(cfg.INPUT.PIXEL_STD)
    feat_norm = cfg.TEST.FEAT_NORM == "yes"
    plain_step = _eval_feature_step_cached(model, feat_norm)
    query_step = _tta_query_step(model, feat_norm)

    evaluator = R1mAPEvaluator(
        num_query, feat_norm=feat_norm, reranking=cfg.TEST.RE_RANKING,
        camera_filter=cfg.TEST.CAMERA_FILTER,
    )
    processed = 0
    for batch in val_loader.iter_sequential():
        x = eval_preprocess(jnp.asarray(batch["images"]), mean=mean, std=std)
        cam, view = _labels(cfg, batch)
        # rows [0, boundary) are queries, the rest gallery — a batch may
        # straddle the split (the reference misclassifies such batches
        # wholesale; here query rows get TTA and gallery rows do not)
        boundary = int(np.clip(num_query - processed, 0, batch["count"]))
        if boundary > 0:
            # TTA-aggregated features for query rows, plain for gallery rows
            feat = query_step(params, bstats, x, cam, view, boundary)
        else:
            feat = plain_step(params, bstats, x, cam, view)
        n = batch["count"]
        # feats stay ON DEVICE — the evaluator concatenates them there,
        # avoiding a host fetch + re-upload of every feature row
        evaluator.update((feat[:n], batch["pids"][:n], batch["camids"][:n]))
        processed += n

    cmc, mAP, *_ = evaluator.compute()
    logger.info("Validation Results (TTA Option A - Image Features)")
    logger.info("mAP: {:.1%}".format(mAP))
    return _log_and_return_ranks(logger, cmc)


def _log_and_return_ranks(logger, cmc):
    """Log Rank-1/5/10 and return (rank1, rank5), clamping to the last
    available rank for tiny galleries: ``cmc`` has only ``min(max_rank,
    num_gallery)`` entries, and jnp's clamped indexing would otherwise
    silently mislabel (numpy would raise)."""
    cmc = np.asarray(cmc)
    for r in (1, 5, 10):
        if r <= len(cmc):
            logger.info("CMC curve, Rank-{:<3}:{:.1%}".format(r, cmc[r - 1]))
    r5 = cmc[4] if len(cmc) > 4 else cmc[-1]
    return float(cmc[0]), float(r5)


def _make_ttpt_tuner(model, cfg, num_classes: int):
    """Jitted per-batch prompt tuner: entropy-minimizing AdamW on ctx_generic."""
    return _make_ttpt_tuner_cached(
        model, num_classes, cfg.TEST.TTPT.LR, cfg.TEST.TTPT.STEPS,
        cfg.TEST.TTPT.TEMPERATURE,
    )


@functools.lru_cache(maxsize=8)
def _make_ttpt_tuner_cached(model, num_classes: int, lr: float, steps: int,
                            temp: float):
    """Cached core of ``_make_ttpt_tuner`` (keyed on the values the trace
    depends on — a fresh closure per ``do_inference_ttpt`` call would
    re-trace the text tower × fwd+bwd × scan every call)."""
    b1, b2, eps, wd = 0.9, 0.999, 1e-8, 1e-2  # torch AdamW defaults

    def text_all(params, bstats, ctx):
        params = dict(params)
        pl = dict(params["prompt_learner"])
        pl["ctx_generic"] = ctx
        params["prompt_learner"] = pl
        labels = jnp.arange(num_classes)
        return model.apply(
            {"params": params, "batch_stats": bstats},
            labels, None, "2", method=UniPromptReID.get_text,
        )

    @jax.jit
    def tune(params, bstats, img_feat_agg):
        """→ (tuned per-query text features, per-step entropy trace).

        The trace (shape ``(steps,)``, mean entropy *before* each update)
        lets callers/tests verify the minimization actually descends."""
        ctx0 = params["prompt_learner"]["ctx_generic"]

        def entropy_loss(ctx):
            tf = text_all(params, bstats, ctx)
            sim = jnp.dot(
                img_feat_agg, tf.astype(jnp.float32).T,
                preferred_element_type=jnp.float32,
            )
            probs = jax.nn.softmax(sim / temp, axis=-1)
            ent = -jnp.sum(probs * jnp.log(probs + 1e-9), axis=-1)
            return jnp.mean(ent), sim

        def body(carry, i):
            ctx, m, v, _ = carry
            (loss, sim), g = jax.value_and_grad(entropy_loss, has_aux=True)(ctx)
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * jnp.square(g)
            t = (i + 1).astype(jnp.float32)
            mh = m / (1 - b1**t)
            vh = v / (1 - b2**t)
            ctx = ctx - lr * (mh / (jnp.sqrt(vh) + eps) + wd * ctx)
            # sim rides the CARRY (only the last step's survives) — stacking
            # it as a scan output would materialize (steps, Q, num_classes)
            return (ctx, m, v, sim), loss

        sim0 = jnp.zeros((img_feat_agg.shape[0], num_classes), jnp.float32)
        init = (ctx0, jnp.zeros_like(ctx0), jnp.zeros_like(ctx0), sim0)
        (ctx, _, _, sim), ent_trace = jax.lax.scan(
            body, init, jnp.arange(steps)
        )
        # class choice mirrors the fori_loop semantics: similarity computed
        # with the context as of the final update's forward pass
        if steps == 0:
            sim = entropy_loss(ctx0)[1]

        final_tf = text_all(params, bstats, ctx)
        final_tf = final_tf / jnp.linalg.norm(final_tf, axis=1, keepdims=True)
        best = jnp.argmax(sim, axis=1)
        return final_tf[best], ent_trace

    return tune


def do_inference_ttpt(cfg, model, variables, val_loader, num_query: int):
    """CLIP-style (Option B) TTPT eval; falls back to Option A when TTPT is off."""
    if not cfg.TEST.TTPT.ENABLED:
        return do_inference_tta(cfg, model, variables, val_loader, num_query)

    logger = logging.getLogger("mpreid_tpu.test_ttpt")
    logger.info("Enter inferencing with TTA, TTPT (CLIP-style Evaluation - Option B)")
    logger.info(
        f"TTPT enabled: LR={cfg.TEST.TTPT.LR}, Steps={cfg.TEST.TTPT.STEPS}, "
        f"Temp={cfg.TEST.TTPT.TEMPERATURE}"
    )

    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    mean, std = tuple(cfg.INPUT.PIXEL_MEAN), tuple(cfg.INPUT.PIXEL_STD)
    feat_norm = cfg.TEST.FEAT_NORM == "yes"
    tta = cfg.TEST.TTA_ENABLED
    feat_dim = model.in_planes_proj
    num_classes = model.num_classes

    step = _eval_feature_step_cached(model)
    tuner = _make_ttpt_tuner(model, cfg, num_classes)

    qf, q_pids, q_camids = [], [], []
    gf, g_pids, g_camids = [], [], []
    processed = 0
    for batch in val_loader.iter_sequential():
        x = eval_preprocess(jnp.asarray(batch["images"]), mean=mean, std=std)
        cam, view = _labels(cfg, batch)
        n = batch["count"]
        # a batch may straddle the query/gallery boundary — split it
        boundary = int(np.clip(num_query - processed, 0, n))
        if boundary > 0:
            feats = [step(params, bstats, x, cam, view)[:, -feat_dim:]]
            if tta:
                feats.append(step(params, bstats, x[:, :, ::-1, :], cam, view)[:, -feat_dim:])
            agg = jnp.mean(jnp.stack(feats, axis=0), axis=0)
            if feat_norm:
                agg = agg / jnp.linalg.norm(agg, axis=1, keepdims=True)
            query_feat, ent = tuner(params, bstats, agg.astype(jnp.float32))
            if len(ent) and logger.isEnabledFor(logging.INFO):
                # one host transfer — per-scalar float() fetches cost ~20 ms
                # each through the remote-TPU tunnel
                ent_np = np.asarray(ent)
                logger.info(
                    "TTPT entropy: %.4f -> %.4f over %d steps",
                    ent_np[0], ent_np[-1], len(ent_np),
                )
            qf.append(query_feat[:boundary])  # stays on device
            q_pids.extend(batch["pids"][:boundary])
            q_camids.extend(batch["camids"][:boundary])
        if boundary < n:
            feat = step(params, bstats, x, cam, view)
            if feat_norm:
                feat = feat / jnp.linalg.norm(feat, axis=1, keepdims=True)
            gf.append(feat[boundary:n])  # stays on device
            g_pids.extend(batch["pids"][boundary:n])
            g_camids.extend(batch["camids"][boundary:n])
        processed += n

    qf = jnp.concatenate(qf)
    gf = jnp.concatenate(gf)
    gf_proj = gf[:, -feat_dim:]
    if feat_norm:
        gf_proj = gf_proj / jnp.linalg.norm(gf_proj, axis=1, keepdims=True)
    distmat = 1.0 - jnp.dot(qf, gf_proj.T, preferred_element_type=jnp.float32)

    cmc, mAP = cmc_map(
        distmat,
        jnp.asarray(np.asarray(q_pids)), jnp.asarray(np.asarray(g_pids)),
        jnp.asarray(np.asarray(q_camids)), jnp.asarray(np.asarray(g_camids)),
        camera_filter=True,
    )
    logger.info("Validation Results (TTPT CLIP-style)")
    logger.info("mAP: {:.1%}".format(float(mAP)))
    return _log_and_return_ranks(logger, cmc)
