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
    if cfg.MODEL.DEBUG_TINY and base.is_vit:
        base = dataclasses.replace(
            base, embed_dim=32, vision_layers=2, vision_width=64,
            transformer_width=64, transformer_heads=1, transformer_layers=2,
        )
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
        lora_rank=cfg.SOLVER.LORA.LORA_R if cfg.SOLVER.LORA.ENABLED else 0,
        lora_alpha=float(cfg.SOLVER.LORA.LORA_ALPHA),
        vision_layout=cfg.MODEL.ATTN_LAYOUT_VISION,
        text_layout=cfg.MODEL.ATTN_LAYOUT_TEXT,
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
        cos_layer=cfg.MODEL.COS_LAYER_TYPE if cfg.MODEL.COS_LAYER else "",
        dtype=jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32,
        remat=cfg.TPU.REMAT,
    )


def make_model(cfg, num_class: int, camera_num: int, view_num: int) -> ReIDModel:
    """Baseline CLIP-ReID model (ref make_model.py:131-133)."""
    return ReIDModel(**_common_kwargs(cfg, num_class, camera_num, view_num))


def make_model_uniprompt(cfg, num_class: int, camera_num: int, view_num: int) -> UniPromptReID:
    """Uni-Prompt model (ref make_model_uniprompt.py:252-254)."""
    return UniPromptReID(**_common_kwargs(cfg, num_class, camera_num, view_num))


def init_variables(model, rng: jax.Array, cfg, batch: int = 2,
                   abstract: bool = False) -> Dict[str, Any]:
    """Init the full variable tree (params + batch_stats).

    ``abstract=True`` returns zero-filled arrays with the right structure
    without running the (expensive) init computation — for eval flows that
    immediately overwrite every weight from a checkpoint.
    """
    h, w = cfg.INPUT.SIZE_TRAIN
    x = jnp.zeros((batch, h, w, 3), jnp.float32)
    label = jnp.zeros((batch,), jnp.int32)
    cam = jnp.zeros((batch,), jnp.int32) if model.sie_camera else None
    view = jnp.zeros((batch,), jnp.int32) if model.sie_view else None

    def do_init(r):
        if isinstance(model, UniPromptReID):
            return model.init(
                r, x, label, view if view is not None else jnp.zeros((batch,), jnp.int32),
                method=UniPromptReID.init_all,
            )
        return model.init(r, x, label, cam_label=cam, view_label=view, train=True)

    if abstract:
        shapes = jax.eval_shape(do_init, rng)
        from mpreid_tpu.solver.optim import path_strings

        def fill(tree):
            names = path_strings(tree)
            # batch-norm running variance must start at ONES (not zeros),
            # matching the real init — var=0 would corrupt BN eval math
            return jax.tree_util.tree_map(
                lambda s, n: jnp.ones(s.shape, s.dtype)
                if n.split("/")[-1] == "var" else jnp.zeros(s.shape, s.dtype),
                tree, names,
            )

        return {k: fill(v) for k, v in shapes.items()}
    return do_init(rng)


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


def switch_to_moe(cfg, model, variables) -> Tuple[Any, Dict[str, Any]]:
    """Convert a trained dense model to its MoE variant ("upcycling").

    The reference calls ``model.switch_to_moe_model(cfg)`` after stage 1
    (ref train_uniprompt.py:128-129) but never defines it — the MoE path is
    dead code as shipped (SURVEY.md §7 defect #1). This is the working
    equivalent: rebuild the model with MoE layers enabled and graft the
    dense weights — each expert MLP initialized from the dense block's MLP,
    gates zero-initialized (uniform routing at step 0), everything else
    copied verbatim.
    """
    import dataclasses as _dc

    import flax

    moe = cfg.MODEL.MOE
    if not moe.ENABLED:
        return model, variables
    if model.clip_config.num_experts > 0:
        # already an MoE model — nothing to upcycle
        return model, variables
    new_clip = _dc.replace(
        model.clip_config,
        num_experts=moe.NUM_EXPERTS,
        top_k=moe.TOP_K,
        moe_layers=moe.MOE_LAYERS,
        dropout=moe.DROPOUT,
        shared_routing=moe.SHARED_ROUTING,
        lora_rank=cfg.SOLVER.LORA.LORA_R if cfg.SOLVER.LORA.ENABLED else 0,
        lora_alpha=float(cfg.SOLVER.LORA.LORA_ALPHA),
        vision_layout=cfg.MODEL.ATTN_LAYOUT_VISION,
        text_layout=cfg.MODEL.ATTN_LAYOUT_TEXT,
    )
    new_model = _dc.replace(model, clip_config=new_clip)
    # every value below is either grafted from the old tree, tiled from the
    # dense MLPs, or zeroed — only the STRUCTURE of new_vars is used
    new_vars = init_variables(new_model, jax.random.PRNGKey(0), cfg, abstract=True)
    new_vars = flax.core.unfreeze(new_vars)

    old_params = variables["params"]
    new_params = new_vars["params"]
    n_moe = new_clip.vision_layers if moe.MOE_LAYERS == -1 else min(
        moe.MOE_LAYERS, new_clip.vision_layers
    )
    e = moe.NUM_EXPERTS
    for key in list(new_params.keys()):
        if key == "visual":
            continue
        if key in old_params:
            new_params[key] = old_params[key]
    old_vis = old_params["visual"]
    new_vis = dict(new_params["visual"])
    for k in new_vis:
        if k.startswith("moe_resblocks_"):
            i = int(k.split("_")[-1])
            src = dict(old_vis[f"resblocks_{i}"])
            mlp = src.pop("mlp")
            src["experts"] = {
                "c_fc_kernel": jnp.tile(mlp["c_fc"]["kernel"][None], (e, 1, 1)),
                "c_fc_bias": jnp.tile(mlp["c_fc"]["bias"][None], (e, 1)),
                "c_proj_kernel": jnp.tile(mlp["c_proj"]["kernel"][None], (e, 1, 1)),
                "c_proj_bias": jnp.tile(mlp["c_proj"]["bias"][None], (e, 1)),
            }
            src["gate_kernel"] = jnp.zeros_like(new_vis[k]["gate_kernel"])
            new_vis[k] = src
        elif k in old_vis:
            new_vis[k] = old_vis[k]
    new_params["visual"] = new_vis
    new_vars["params"] = new_params
    if "batch_stats" in variables:
        new_vars["batch_stats"] = variables["batch_stats"]
    return new_model, new_vars


def load_pretrained(
    variables: Dict[str, Any], cfg, path: Optional[str] = None
) -> Dict[str, Any]:
    """Load OpenAI CLIP weights into model variables.

    Resolution order: explicit ``path`` → ``MODEL.PRETRAIN_PATH`` → the
    SHA256-verified download of the MODEL.NAME checkpoint (ref
    ``model/clip/clip.py:39-68``; requires egress or a pre-seeded
    ``~/.cache/clip``).
    """
    path = path or cfg.MODEL.PRETRAIN_PATH
    if not path:
        from .download import download_clip

        path = download_clip(cfg.MODEL.NAME)
    c = clip_config_from_cfg(cfg)
    _, clip_vars = load_torch_clip(
        path, c.h_resolution, c.w_resolution, c.vision_stride_size,
        num_experts=c.num_experts, top_k=c.top_k, moe_layers=c.moe_layers,
        dropout=c.dropout, vision_layout=c.vision_layout,
        text_layout=c.text_layout,
    )
    return graft_clip_variables(variables, clip_vars)
