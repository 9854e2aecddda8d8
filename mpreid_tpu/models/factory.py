"""Model factory — the ``make_model`` entry point.

Mirrors reference ``model/make_model.py:131-133`` / ``make_model_uniprompt.py:
252-254``: build from config + dataset statistics. The (h, w) token-grid
resolution follows ``make_model.py:60-62``:
``h_res = (SIZE_TRAIN[0] - 16) // STRIDE[0] + 1`` (and likewise for w).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .clip_model import CLIPConfig, RN50, VIT_B16, load_torch_clip
from .reid import ReIDModel
from .uniprompt import UniPromptReID

_BASE_CONFIGS = {"ViT-B-16": VIT_B16, "RN50": RN50}


def clip_config_from_cfg(cfg) -> CLIPConfig:
    name = cfg.MODEL.NAME
    if name not in _BASE_CONFIGS:
        raise ValueError(f"Unknown MODEL.NAME {name!r}; expected one of {list(_BASE_CONFIGS)}")
    base = _BASE_CONFIGS[name]
    h_res = int((cfg.INPUT.SIZE_TRAIN[0] - 16) // cfg.MODEL.STRIDE_SIZE[0] + 1)
    w_res = int((cfg.INPUT.SIZE_TRAIN[1] - 16) // cfg.MODEL.STRIDE_SIZE[1] + 1)
    moe = cfg.MODEL.MOE
    return dataclasses.replace(
        base,
        h_resolution=h_res,
        w_resolution=w_res,
        vision_stride_size=cfg.MODEL.STRIDE_SIZE[0],
        num_experts=moe.NUM_EXPERTS if moe.ENABLED else 0,
        top_k=moe.TOP_K if moe.ENABLED else 0,
        moe_layers=moe.MOE_LAYERS if moe.ENABLED else 0,
        dropout=moe.DROPOUT,
        shared_routing=moe.SHARED_ROUTING,
    )


def _common_kwargs(cfg, num_class, camera_num, view_num) -> Dict[str, Any]:
    return dict(
        clip_config=clip_config_from_cfg(cfg),
        num_classes=num_class,
        camera_num=camera_num,
        view_num=view_num,
        sie_camera=cfg.MODEL.SIE_CAMERA,
        sie_view=cfg.MODEL.SIE_VIEW,
        sie_coe=cfg.MODEL.SIE_COE,
        neck_feat=cfg.TEST.NECK_FEAT,
        dtype=jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32,
        remat=cfg.TPU.REMAT,
    )


def make_model(cfg, num_class: int, camera_num: int, view_num: int) -> ReIDModel:
    """Baseline CLIP-ReID model (ref make_model.py:131-133)."""
    return ReIDModel(**_common_kwargs(cfg, num_class, camera_num, view_num))


def make_model_uniprompt(cfg, num_class: int, camera_num: int, view_num: int) -> UniPromptReID:
    """Uni-Prompt model (ref make_model_uniprompt.py:252-254)."""
    return UniPromptReID(**_common_kwargs(cfg, num_class, camera_num, view_num))


def init_variables(model, rng: jax.Array, cfg, batch: int = 2) -> Dict[str, Any]:
    """Random-init the full variable tree (params + batch_stats)."""
    h, w = cfg.INPUT.SIZE_TRAIN
    x = jnp.zeros((batch, h, w, 3), jnp.float32)
    label = jnp.zeros((batch,), jnp.int32)
    cam = jnp.zeros((batch,), jnp.int32) if (model.sie_camera or model.sie_view) else None
    view = jnp.zeros((batch,), jnp.int32)
    if isinstance(model, UniPromptReID):
        return model.init(rng, x, label, view, method=UniPromptReID.init_all)
    return model.init(rng, x, label, cam_label=cam, view_label=cam, train=True)


def graft_clip_variables(
    variables: Dict[str, Any], clip_variables: Dict[str, Any]
) -> Dict[str, Any]:
    """Replace the CLIP-derived subtrees of a model's variables.

    ``clip_variables`` comes from ``clip_model.convert_clip_state_dict`` /
    ``load_torch_clip``; both it and the ReID models use the CLIP module
    naming ('visual', 'text') in their param trees. Equivalent of the
    reference's ``load_clip_to_cpu`` + module wiring
    (make_model.py:63-66, make_model_uniprompt.py:110-133).
    """
    import flax

    variables = flax.core.unfreeze(variables)
    src_params = clip_variables["params"]
    variables["params"]["visual"] = src_params["visual"]
    if "text" in variables["params"] and "text" in src_params:
        variables["params"]["text"] = src_params["text"]
    if "batch_stats" in clip_variables:
        variables.setdefault("batch_stats", {})["visual"] = (
            clip_variables["batch_stats"]["visual"]
        )
    return variables


def load_pretrained(
    variables: Dict[str, Any], cfg, path: Optional[str] = None
) -> Dict[str, Any]:
    """Load OpenAI CLIP weights from a local ``.pt`` into model variables."""
    path = path or cfg.MODEL.PRETRAIN_PATH
    c = clip_config_from_cfg(cfg)
    _, clip_vars = load_torch_clip(
        path, c.h_resolution, c.w_resolution, c.vision_stride_size,
        num_experts=c.num_experts, top_k=c.top_k, moe_layers=c.moe_layers,
        dropout=c.dropout,
    )
    return graft_clip_variables(variables, clip_vars)
