"""Uni-Prompt ReID model: prompt learner + text encoder + ReID head.

Behavioral contract (reference ``model/make_model_uniprompt.py``):

* ``PromptLearner`` (ref ``:274-377``): per-identity *generic* context
  (num_class × 8 × 512), modality context (2 × 4 × 512) and platform context
  (2 × 4 × 512) spliced into the embedded template ``"X "*16 + "person."``
  between the SOT prefix and the "person. EOT pad…" suffix. Stage '1a' zeroes
  the domain contexts; stage '1b'/'2' selects them from the view label using
  the MMMP camera-layout map (view ≥ 12 → UAV platform; 6 ≤ view < 12 or
  view == 13 → IR modality), falling back to the mean context when no view is
  given.
* ``TextEncoder`` (ref ``:49-68``): CLIP text transformer applied to the
  assembled prompt embeddings, EOT-pooled via the tokenized template.
* Multiplexed forwards (ref ``:159-237``): ``get_text``, ``get_image``,
  ``get_image_vp`` (learned 1×1×512 visual prompt added to projected tokens),
  ``get_more_image``, ``get_image_update`` (MLP fusion of image+text feats),
  plus the default train path which additionally returns
  ``img_feature_proj`` and the raw projected tokens.

Here each forward mode is its own method (specialized XLA program under jit).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from .clip_model import CLIPConfig, make_text_tower, make_visual_tower
from .layers import BNNeck, classifier_scores, make_classifier
from .tokenizer import tokenize

N_GENERIC_CTX = 8
N_MODAL_CTX = 4
N_PLAT_CTX = 4
N_TOTAL_CTX = N_GENERIC_CTX + N_MODAL_CTX + N_PLAT_CTX
PROMPT_SUFFIX = "person."
# The reference hardcodes 512 for three semantically distinct dims that
# coincide for ViT-B/16 (ref :89,279,299): prompt ctx_dim (= text transformer
# width), the visual prompt / fusion dim (= CLIP embed_dim). We derive each
# from the CLIPConfig instead.
CTX_DIM = 512


def prompt_template_tokens() -> np.ndarray:
    """Tokenized ``"X X ... X person."`` template (ref :308-312)."""
    template = " ".join(["X"] * N_TOTAL_CTX) + f" {PROMPT_SUFFIX}"
    return tokenize(template)


def view_to_platform_modality(view: jax.Array):
    """MMMP camera-layout mapping (ref make_model_uniprompt.py:347-363)."""
    plat = (view >= 12).astype(jnp.int32)
    modal = (((view >= 6) & (view < 12)) | (view == 13)).astype(jnp.int32)
    return plat, modal


class PromptLearner(nn.Module):
    num_classes: int
    n_modalities: int = 2
    n_platforms: int = 2
    ctx_dim: int = CTX_DIM
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        init = nn.initializers.normal(stddev=0.02)
        self.ctx_generic = self.param(
            "ctx_generic", init, (self.num_classes, N_GENERIC_CTX, self.ctx_dim), jnp.float32
        )
        self.ctx_modality = self.param(
            "ctx_modality", init, (self.n_modalities, N_MODAL_CTX, self.ctx_dim), jnp.float32
        )
        self.ctx_platform = self.param(
            "ctx_platform", init, (self.n_platforms, N_PLAT_CTX, self.ctx_dim), jnp.float32
        )
        # Visual-enhanced net (ref :298-304). Present in the reference's param
        # surface; the reference's forward never invokes it. Kept (and
        # materialized at init) for checkpoint-surface parity.
        self.ve_linear1 = nn.Dense(
            self.ctx_dim // 16, dtype=self.dtype, param_dtype=jnp.float32, name="ve_linear1"
        )
        self.ve_linear2 = nn.Dense(
            self.ctx_dim, dtype=self.dtype, param_dtype=jnp.float32, name="ve_linear2"
        )

    def visual_enhanced(self, image_feature: jax.Array) -> jax.Array:
        return self.ve_linear2(nn.relu(self.ve_linear1(image_feature)))

    def context(self, label: jax.Array, view: Optional[jax.Array], stage: str) -> jax.Array:
        """Assemble the (B, 16, ctx_dim) context block (ref :334-370)."""
        b = label.shape[0]
        generic = self.ctx_generic[label]
        if stage == "1a":
            modal = jnp.zeros((b, N_MODAL_CTX, self.ctx_dim), generic.dtype)
            plat = jnp.zeros((b, N_PLAT_CTX, self.ctx_dim), generic.dtype)
        elif view is not None:
            plat_idx, modal_idx = view_to_platform_modality(view)
            modal = self.ctx_modality[modal_idx]
            plat = self.ctx_platform[plat_idx]
        else:
            modal = jnp.broadcast_to(
                jnp.mean(self.ctx_modality, axis=0, keepdims=True),
                (b, N_MODAL_CTX, self.ctx_dim),
            )
            plat = jnp.broadcast_to(
                jnp.mean(self.ctx_platform, axis=0, keepdims=True),
                (b, N_PLAT_CTX, self.ctx_dim),
            )
        return jnp.concatenate([generic, modal, plat], axis=1)


class UniPromptReID(nn.Module):
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

    @property
    def ctx_dim(self) -> int:
        return self.clip_config.transformer_width

    def setup(self):
        self.image_encoder = make_visual_tower(self.clip_config, self.dtype, self.remat)
        self.text_encoder = make_text_tower(self.clip_config, self.dtype)
        self.prompt_learner = PromptLearner(
            self.num_classes, ctx_dim=self.ctx_dim, dtype=self.dtype
        )
        self.bottleneck = BNNeck(self.in_planes)
        self.bottleneck_proj = BNNeck(self.in_planes_proj)
        self.classifier = make_classifier(self.num_classes, self.cos_layer)
        self.classifier_proj = make_classifier(self.num_classes, self.cos_layer)
        # learned visual prompt (ref :112-114) — added to projected tokens
        self.visual_prompt = self.param(
            "visual_prompt",
            nn.initializers.normal(stddev=0.02),
            (1, 1, self.in_planes_proj),
            jnp.float32,
        )
        # MLP feature fusion (ref :31-47)
        self.fusion_fc1 = nn.Dense(256, dtype=self.dtype, param_dtype=jnp.float32)
        self.fusion_fc2 = nn.Dense(
            self.in_planes_proj, dtype=self.dtype, param_dtype=jnp.float32
        )

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
        self.tokenized_prompts = jnp.asarray(prompt_template_tokens())

    # ------------------------------------------------------------------ text
    def get_text(self, label, view=None, stage: str = "1a"):
        """Prompted text features for the given identity labels (ref :160-170)."""
        ctx = self.prompt_learner.context(label, view, stage)
        b = label.shape[0]
        d = self.ctx_dim
        embedding = self.text_encoder.embed(self.tokenized_prompts)  # (1, 77, D)
        prefix = jnp.broadcast_to(embedding[:, :1], (b, 1, d))
        suffix = jnp.broadcast_to(
            embedding[:, 1 + N_TOTAL_CTX :],
            (b, embedding.shape[1] - 1 - N_TOTAL_CTX, d),
        )
        prompts = jnp.concatenate([prefix, ctx.astype(prefix.dtype), suffix], axis=1)
        return self.text_encoder.encode_embeddings(prompts, self.tokenized_prompts)

    # ----------------------------------------------------------------- image
    def _encode_image(self, x, cv=None, train: bool = False):
        if self.clip_config.is_vit:
            return self.image_encoder(x, cv, deterministic=not train)
        return self.image_encoder(x, cv, train=train)

    def get_image(self, x):
        """Projected class-token feature from the frozen encoder (ref :172-177)."""
        _, _, xproj, _ = self._encode_image(x)
        return xproj[:, 0] if self.clip_config.is_vit else xproj[0]

    def get_image_vp(self, x):
        """get_image with the learned visual prompt added (ref :178-186)."""
        _, _, xproj, _ = self._encode_image(x)
        xproj = xproj + self.visual_prompt.astype(xproj.dtype)
        return xproj[:, 0] if self.clip_config.is_vit else xproj[0]

    def get_more_image(self, x):
        """Low/mid/high projected tokens (ref :187-198)."""
        _, _, xproj, _ = self._encode_image(x)
        if self.clip_config.is_vit:
            return xproj[:, 0], xproj[:, 1], xproj[:, -1]
        return xproj[0], xproj[1], xproj[-1]

    def get_image_update(self, image_feature, text_feature):
        """MLP fusion of image and text features (ref :31-47, :199-201)."""
        fused = jnp.concatenate([image_feature, text_feature], axis=-1)
        return self.fusion_fc2(nn.relu(self.fusion_fc1(fused.astype(self.dtype))))

    # ------------------------------------------------------------------ main
    def _sie(self, cam_label, view_label):
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
        cv = self._sie(cam_label, view_label)
        if self.clip_config.is_vit:
            x11, x12, xproj, router_logits = self._encode_image(x, cv, train=train)
            return x11[:, 0], x12[:, 0], xproj[:, 0], xproj, router_logits
        x3, x4, xproj, router_logits = self._encode_image(x, cv, train=train)
        return (
            jnp.mean(x3, axis=(1, 2)),
            jnp.mean(x4, axis=(1, 2)),
            xproj[0],
            xproj,
            router_logits,
        )

    def forward_train(self, x, label=None, cam_label=None, view_label=None):
        """Stage-2 train forward (ref :209-230)."""
        feat_last, feat, feat_proj, raw_proj, router_logits = self.backbone_features(
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
            "img_feature_proj": feat_proj,
            "image_features_proj_raw": raw_proj,
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

    def __call__(self, x, label=None, cam_label=None, view_label=None, train: bool = False):
        if train:
            return self.forward_train(x, label, cam_label, view_label)
        return self.forward_eval(x, cam_label, view_label)

    def init_all(self, x, label, view):
        """Touch every parameterized path so ``init`` materializes all params."""
        out = self.forward_train(x, label)
        txt = self.get_text(label, view, stage="1b")
        img = self.get_image_vp(x)
        fused = self.get_image_update(img, txt)
        ve = self.prompt_learner.visual_enhanced(txt)
        _ = self.get_more_image(x)
        return out, txt, fused, ve
