"""Loss factory (reference ``loss/make_loss.py:13-87`` semantics).

Builds a pure ``loss_fn(score, feat, target, target_cam, i2tscore=None)``
closure combining:

    ID_LOSS_WEIGHT · Σ xent(scoreᵢ)  +  TRIPLET_LOSS_WEIGHT · Σ triplet(featᵢ)
    [+ I2T_LOSS_WEIGHT · xent(i2tscore)]

Score/feat may be lists (summed per head, ref make_loss.py:41-48). Label
smoothing per MODEL.IF_LABELSMOOTH; soft-margin triplet per MODEL.NO_MARGIN.
The center criterion is returned as an ``(init_fn, loss_fn)`` pair — centers
are parameters of the TrainState (feat_dim hardcoded 2048 as in the
reference, ref make_loss.py:15-16).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .center import center_loss, init_centers
from .softmax import cross_entropy, cross_entropy_label_smooth
from .triplet import triplet_loss

CENTER_FEAT_DIM = 2048


def make_loss(cfg, num_classes: int):
    sampler = cfg.DATALOADER.SAMPLER
    use_label_smooth = cfg.MODEL.IF_LABELSMOOTH == "on"
    margin = None if cfg.MODEL.NO_MARGIN else cfg.SOLVER.MARGIN
    id_w = cfg.MODEL.ID_LOSS_WEIGHT
    tri_w = cfg.MODEL.TRIPLET_LOSS_WEIGHT
    i2t_w = cfg.MODEL.I2T_LOSS_WEIGHT
    metric_type = cfg.MODEL.METRIC_LOSS_TYPE

    if use_label_smooth:
        def xent(logits, target):
            return cross_entropy_label_smooth(logits, target, num_classes)
    else:
        xent = cross_entropy

    if sampler == "softmax":
        def loss_func(score, feat, target, target_cam=None, i2tscore=None):
            del feat, target_cam, i2tscore
            if isinstance(score, (list, tuple)):
                score = score[0]
            return cross_entropy(score, target)

    elif sampler == "softmax_triplet":
        if "triplet" not in metric_type:
            raise ValueError(
                f"expected METRIC_LOSS_TYPE to contain 'triplet' but got {metric_type}"
            )

        def loss_func(score, feat, target, target_cam=None, i2tscore=None):
            del target_cam
            scores = score if isinstance(score, (list, tuple)) else [score]
            feats = feat if isinstance(feat, (list, tuple)) else [feat]
            id_loss = sum(xent(s, target) for s in scores)
            tri_loss = sum(triplet_loss(f, target, margin=margin)[0] for f in feats)
            loss = id_w * id_loss + tri_w * tri_loss
            if i2tscore is not None:
                loss = loss + i2t_w * xent(i2tscore, target)
            return loss

    else:
        raise ValueError(
            "expected sampler to be softmax or softmax_triplet "
            f"but got {sampler}"
        )

    def center_init(key):
        return init_centers(key, num_classes, CENTER_FEAT_DIM)

    return loss_func, (center_init, center_loss)
