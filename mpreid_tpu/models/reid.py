"""Baseline CLIP-ReID model: CLIP visual tower + dual BNNeck + classifiers.

Behavioral contract (reference ``model/make_model.py:30-133``):

* feature dims: ViT-B/16 → (768 tokens, 512 proj); RN50 → (2048, 1024),
* SIE camera/view embedding added to the class token, scaled by ``sie_coe``
  (ref ``make_model.py:68-79,88-96``),
* two BNNecks (bias frozen at zero) and two bias-free classifiers,
* train forward → ``([cls_score, cls_score_proj], [feat_last, feat, feat_proj])``,
* eval forward → 1280-d (ViT) concat of post-BN (``neck_feat='after'``) or
  pre-BN features.

The flax module exposes separate methods (selected via ``apply(...,
method=...)``) instead of the reference's kwarg multiplexing — each method
jits to its own specialized XLA program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .clip_model import CLIPConfig, make_visual_tower
from .layers import (
    BNNeck,
    classifier_init,  # noqa: F401  (re-export; historical import site)
    classifier_scores,
    make_classifier,
)


class ReIDModel(nn.Module):
    clip_config: CLIPConfig
    num_classes: int
    camera_num: int = 0
    view_num: int = 0
    sie_camera: bool = False
    sie_view: bool = False
    sie_coe: float = 3.0
    neck_feat: str = "after"
    # '' = plain Dense classifiers; else a margin head kind
    # (arcface|cosface|amsoftmax|circle) — the wired MODEL.COS_LAYER
    cos_layer: str = ""
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @property
    def in_planes(self) -> int:
        c = self.clip_config
        return c.vision_width if c.is_vit else c.vision_width * 32

    @property
    def in_planes_proj(self) -> int:
        return self.clip_config.embed_dim

    def setup(self):
        self.image_encoder = make_visual_tower(self.clip_config, self.dtype, self.remat)
        self.bottleneck = BNNeck(self.in_planes)
        self.bottleneck_proj = BNNeck(self.in_planes_proj)
        self.classifier = make_classifier(self.num_classes, self.cos_layer)
        self.classifier_proj = make_classifier(self.num_classes, self.cos_layer)
        if self.sie_camera and self.sie_view:
            n_embed = self.camera_num * self.view_num
        elif self.sie_camera:
            n_embed = self.camera_num
        elif self.sie_view:
            n_embed = self.view_num
        else:
            n_embed = 0
        if n_embed:
            self.cv_embed = self.param(
                "cv_embed",
                nn.initializers.truncated_normal(stddev=0.02),
                (n_embed, self.in_planes),
                jnp.float32,
            )

    # ------------------------------------------------------------------ utils
    def _sie(self, cam_label, view_label) -> Optional[jax.Array]:
        """SIE lookup (ref make_model.py:88-96)."""
        if self.sie_camera and self.sie_view:
            assert cam_label is not None and view_label is not None
            idx = cam_label * self.view_num + view_label
        elif self.sie_camera:
            if cam_label is None:
                return None
            idx = cam_label
        elif self.sie_view:
            if view_label is None:
                return None
            idx = view_label
        else:
            return None
        return self.sie_coe * self.cv_embed[idx]

    def backbone_features(self, x, cam_label=None, view_label=None, train: bool = False):
        """→ (feat_last, feat, feat_proj, raw_proj_tokens, router_logits).

        feat/feat_proj are the class-token (ViT) or pooled (RN50) vectors.
        """
        cv = self._sie(cam_label, view_label)
        if self.clip_config.is_vit:
            x11, x12, xproj, router_logits = self.image_encoder(
                x, cv, deterministic=not train
            )
            feat_last = x11[:, 0]
            feat = x12[:, 0]
            feat_proj = xproj[:, 0]
        else:
            x3, x4, xproj, router_logits = self.image_encoder(x, cv, train=train)
            # global average pool over spatial dims (ref make_model.py:84-86)
            feat_last = jnp.mean(x3, axis=(1, 2))
            feat = jnp.mean(x4, axis=(1, 2))
            feat_proj = xproj[0]
            x12 = None
        return feat_last, feat, feat_proj, xproj, router_logits

    # ---------------------------------------------------------------- methods
    def __call__(self, x, label=None, cam_label=None, view_label=None, train: bool = False):
        if train:
            return self.forward_train(x, label, cam_label, view_label)
        return self.forward_eval(x, cam_label, view_label)

    def forward_train(self, x, label=None, cam_label=None, view_label=None):
        feat_last, feat, feat_proj, _, router_logits = self.backbone_features(
            x, cam_label, view_label, train=True
        )
        feat_bn = self.bottleneck(feat, train=True)
        feat_proj_bn = self.bottleneck_proj(feat_proj, train=True)
        cls_score = classifier_scores(
            self.classifier, self.cos_layer, feat_bn.astype(jnp.float32), label
        )
        cls_score_proj = classifier_scores(
            self.classifier_proj, self.cos_layer,
            feat_proj_bn.astype(jnp.float32), label,
        )
        out = {
            "scores": [cls_score, cls_score_proj],
            "feats": [feat_last, feat, feat_proj],
        }
        if router_logits is not None:
            out["router_logits"] = router_logits
        return out

    def forward_eval(self, x, cam_label=None, view_label=None):
        _, feat, feat_proj, _, _ = self.backbone_features(
            x, cam_label, view_label, train=False
        )
        if self.neck_feat == "after":
            feat_bn = self.bottleneck(feat, train=False)
            feat_proj_bn = self.bottleneck_proj(feat_proj, train=False)
            return jnp.concatenate([feat_bn, feat_proj_bn], axis=1)
        return jnp.concatenate([feat, feat_proj], axis=1)
