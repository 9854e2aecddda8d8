"""Import trained reference (PyTorch) ReID checkpoints.

The reference saves raw ``model.state_dict()`` of its ``build_transformer``
models (ref ``processor/processor.py:107-114``), loaded back by name with a
``module.`` prefix strip (ref ``make_model.py:118-122``). This module maps
those key layouts onto our flax variable tree so a reference-trained
checkpoint can be evaluated (or fine-tuned) here directly:

  * ``image_encoder.*``      → params['visual']  (CLIP visual mapping)
  * ``text_encoder.*``       → params['text']    (transformer + ln_final + proj)
  * ``bottleneck[_proj].*``  → BNNeck params + batch_stats
  * ``classifier[_proj].*``  → dense kernels (transposed)
  * ``prompt_learner.*``     → prompt contexts + visual-enhanced net
  * ``cv_embed`` / ``visual_prompt`` / ``image_fusion_net.*``
  * MoE expert lists         → stacked expert tensors + gate kernels

Not mapped (recomputed here): ``prompt_learner.token_prefix/token_suffix``
buffers — we re-embed the template from ``token_embedding``, so load CLIP
weights first, then overlay the trained checkpoint on top.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from .clip_model import _convert_block, _convert_resnet_visual, _convert_vit_visual, _np


def _strip_module(sd: Dict[str, Any]) -> Dict[str, Any]:
    return {k.replace("module.", "", 1) if k.startswith("module.") else k: v
            for k, v in sd.items()}


def _subdict(sd: Dict[str, Any], prefix: str, rename: str = "") -> Dict[str, Any]:
    plen = len(prefix)
    return {rename + k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def _bn(sd, prefix) -> Tuple[Dict, Dict]:
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def _convert_visual_subtree(sd: Dict[str, Any], clip_config) -> Tuple[Dict, Dict]:
    """image_encoder.* keys → visual param/stats subtrees."""
    vis_sd = _subdict(sd, "image_encoder.", rename="visual.")
    if clip_config.is_vit:
        n_moe = 0
        if clip_config.num_experts > 0 and clip_config.top_k > 0:
            n_moe = (clip_config.vision_layers if clip_config.moe_layers == -1
                     else min(clip_config.moe_layers, clip_config.vision_layers))
        if n_moe == 0:
            return _convert_vit_visual_trained(vis_sd, clip_config)
        return _convert_vit_moe_trained(vis_sd, clip_config, n_moe)
    # trained checkpoints already carry the resized attnpool grid
    return _convert_resnet_visual(vis_sd, clip_config, resize_pos=False)


def _convert_vit_visual_trained(vis_sd, cfg) -> Tuple[Dict, Dict]:
    params = {
        "conv1": {"kernel": _np(vis_sd["visual.conv1.weight"]).transpose(2, 3, 1, 0)},
        "class_embedding": _np(vis_sd["visual.class_embedding"]),
        # trained checkpoints already carry the resized grid — no resize
        "positional_embedding": _np(vis_sd["visual.positional_embedding"]),
        "ln_pre": {"scale": _np(vis_sd["visual.ln_pre.weight"]),
                   "bias": _np(vis_sd["visual.ln_pre.bias"])},
        "ln_post": {"scale": _np(vis_sd["visual.ln_post.weight"]),
                    "bias": _np(vis_sd["visual.ln_post.bias"])},
        "proj": _np(vis_sd["visual.proj"]),
    }
    perm = cfg._perm("vision")
    for i in range(cfg.vision_layers):
        params[f"resblocks_{i}"] = _convert_block(
            vis_sd, f"visual.transformer.resblocks.{i}", perm
        )
    return params, {}


def _convert_vit_moe_trained(vis_sd, cfg, n_moe) -> Tuple[Dict, Dict]:
    params, _ = _convert_vit_visual_trained_moe_base(vis_sd, cfg)
    e = cfg.num_experts
    perm = cfg._perm("vision")
    for i in range(n_moe):
        prefix = f"visual.transformer.resblocks.{i}"
        # attn/ln load + head-major permute shared with every other block
        # conversion path (clip_model._convert_block); only the MoE parts
        # (gate + stacked experts) are specific to this layout
        block = _convert_block(vis_sd, prefix, perm, mlp=False)
        block.update({
            "gate_kernel": _np(vis_sd[f"{prefix}.gate.weight"]).T,
            "experts": {
                "c_fc_kernel": np.stack([
                    _np(vis_sd[f"{prefix}.experts.{m}.c_fc.weight"]).T for m in range(e)
                ]),
                "c_fc_bias": np.stack([
                    _np(vis_sd[f"{prefix}.experts.{m}.c_fc.bias"]) for m in range(e)
                ]),
                "c_proj_kernel": np.stack([
                    _np(vis_sd[f"{prefix}.experts.{m}.c_proj.weight"]).T for m in range(e)
                ]),
                "c_proj_bias": np.stack([
                    _np(vis_sd[f"{prefix}.experts.{m}.c_proj.bias"]) for m in range(e)
                ]),
            },
        })
        params[f"moe_resblocks_{i}"] = block
    return params, {}


def _convert_vit_visual_trained_moe_base(vis_sd, cfg):
    """Shared non-MoE parts for the MoE-trained layout."""
    params = {
        "conv1": {"kernel": _np(vis_sd["visual.conv1.weight"]).transpose(2, 3, 1, 0)},
        "class_embedding": _np(vis_sd["visual.class_embedding"]),
        "positional_embedding": _np(vis_sd["visual.positional_embedding"]),
        "ln_pre": {"scale": _np(vis_sd["visual.ln_pre.weight"]),
                   "bias": _np(vis_sd["visual.ln_pre.bias"])},
        "ln_post": {"scale": _np(vis_sd["visual.ln_post.weight"]),
                    "bias": _np(vis_sd["visual.ln_post.bias"])},
        "proj": _np(vis_sd["visual.proj"]),
    }
    n_moe = (cfg.vision_layers if cfg.moe_layers == -1
             else min(cfg.moe_layers, cfg.vision_layers))
    perm = cfg._perm("vision")
    for i in range(n_moe, cfg.vision_layers):
        params[f"resblocks_{i}"] = _convert_block(
            vis_sd, f"visual.transformer.resblocks.{i}", perm
        )
    return params, {}


def convert_reid_state_dict(sd: Dict[str, Any], model) -> Dict[str, Any]:
    """torch ReID state_dict → overlay for our variable tree.

    ``model`` is the target ReIDModel/UniPromptReID (for clip_config / dims).
    Returns {'params': ..., 'batch_stats': ...} with only the keys present
    in the checkpoint; merge over existing variables with ``apply_overlay``.
    """
    sd = _strip_module(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    if any(k.startswith("image_encoder.") for k in sd):
        vp, vs = _convert_visual_subtree(sd, model.clip_config)
        params["visual"] = vp
        if vs:
            stats["visual"] = vs

    for name in ("bottleneck", "bottleneck_proj"):
        if f"{name}.weight" in sd:
            p, s = _bn(sd, name)
            params[name] = p
            stats[name] = s

    for name in ("classifier", "classifier_proj"):
        if f"{name}.weight" in sd:
            params[name] = {"kernel": _np(sd[f"{name}.weight"]).T}

    if "cv_embed" in sd:
        params["cv_embed"] = _np(sd["cv_embed"])
    if "visual_prompt" in sd:
        params["visual_prompt"] = _np(sd["visual_prompt"])

    if "image_fusion_net.fc1.weight" in sd:
        params["fusion_fc1"] = {"kernel": _np(sd["image_fusion_net.fc1.weight"]).T,
                                "bias": _np(sd["image_fusion_net.fc1.bias"])}
        params["fusion_fc2"] = {"kernel": _np(sd["image_fusion_net.fc2.weight"]).T,
                                "bias": _np(sd["image_fusion_net.fc2.bias"])}

    if "prompt_learner.ctx_generic" in sd:
        pl = {
            "ctx_generic": _np(sd["prompt_learner.ctx_generic"]),
            "ctx_modality": _np(sd["prompt_learner.ctx_modality"]),
            "ctx_platform": _np(sd["prompt_learner.ctx_platform"]),
        }
        ve1 = "prompt_learner.visual_enhanced_net.linear1.weight"
        if ve1 in sd:
            pl["ve_linear1"] = {"kernel": _np(sd[ve1]).T,
                                "bias": _np(sd[ve1.replace("weight", "bias")])}
            ve2 = "prompt_learner.visual_enhanced_net.linear2.weight"
            pl["ve_linear2"] = {"kernel": _np(sd[ve2]).T,
                                "bias": _np(sd[ve2.replace("weight", "bias")])}
        params["prompt_learner"] = pl

    if any(k.startswith("text_encoder.") for k in sd):
        text: Dict[str, Any] = {
            "positional_embedding": _np(sd["text_encoder.positional_embedding"]),
            "ln_final": {"scale": _np(sd["text_encoder.ln_final.weight"]),
                         "bias": _np(sd["text_encoder.ln_final.bias"])},
            "text_projection": _np(sd["text_encoder.text_projection"]),
        }
        text_perm = model.clip_config._perm("text")
        for i in range(model.clip_config.transformer_layers):
            text[f"resblocks_{i}"] = _convert_block(
                sd, f"text_encoder.transformer.resblocks.{i}", text_perm
            )
        params["text"] = text

    out: Dict[str, Any] = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def apply_overlay(variables: Dict[str, Any], overlay: Dict[str, Any]) -> Dict[str, Any]:
    """Deep-merge an overlay into a variable tree (ref load_param semantics:
    copy by name, leave everything else)."""
    import copy

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                merge(dst[k], v)
            else:
                dst[k] = v

    import flax

    out = flax.core.unfreeze(copy.deepcopy(dict(variables)))
    for coll, sub in overlay.items():
        out.setdefault(coll, {})
        merge(out[coll], sub)
    return out


def load_param(path: str, model, variables: Dict[str, Any]) -> Dict[str, Any]:
    """Load a trained reference ``.pth`` into our variables
    (ref make_model.py:118-122)."""
    import jax
    import torch

    sd = torch.load(path, map_location="cpu")
    merged = apply_overlay(variables, convert_reid_state_dict(sd, model))
    return jax.tree_util.tree_map(jax.device_put, merged)


# ---------------------------------------------------------------------------
# export: JAX variables → reference torch state_dict (the exact inverse of
# convert_reid_state_dict, so models trained HERE can be validated by the
# reference's own load_param / load_param_finetune, ref make_model.py:118-128)
# ---------------------------------------------------------------------------


def _t(x):
    import torch

    # np.array copies → the tensor owns writable memory (torch warns on
    # non-writable views of jax buffers otherwise)
    return torch.from_numpy(np.array(x, dtype=np.float32))


def _export_block(sub: Dict[str, Any], prefix: str, out: Dict[str, Any],
                  lora_alpha: float = 16.0, inv_perm=None) -> None:
    """Flax ResidualAttentionBlock subtree → reference torch keys
    (inverse of clip_model._convert_block).

    Trained LoRA adapters have no torch-side key — the reference's
    MultiheadAttention knows nothing of them — so their contribution
    ΔW = (α/r)·A·B is FOLDED into the exported in_proj weight; dropping it
    silently would export wrong effective weights for LoRA-trained models.

    ``inv_perm`` (head_major_perm_inverse) restores torch [q|k|v] column
    packing for "hm_native"-layout models, whose stored params (and lora_b)
    are head-major. The LoRA fold happens first, in the stored layout.
    """
    in_kernel = np.asarray(sub["attn"]["in_proj_kernel"], np.float32)
    in_bias = np.asarray(sub["attn"]["in_proj_bias"], np.float32)
    if "lora_a" in sub["attn"]:
        a = np.asarray(sub["attn"]["lora_a"], np.float32)
        bmat = np.asarray(sub["attn"]["lora_b"], np.float32)
        in_kernel = in_kernel + (lora_alpha / a.shape[1]) * (a @ bmat)
    if inv_perm is not None:
        in_kernel = np.ascontiguousarray(in_kernel[:, inv_perm])
        in_bias = np.ascontiguousarray(in_bias[inv_perm])
    out[f"{prefix}.attn.in_proj_weight"] = _t(in_kernel).T
    out[f"{prefix}.attn.in_proj_bias"] = _t(in_bias)
    out[f"{prefix}.attn.out_proj.weight"] = _t(sub["attn"]["out_proj_kernel"]).T
    out[f"{prefix}.attn.out_proj.bias"] = _t(sub["attn"]["out_proj_bias"])
    out[f"{prefix}.ln_1.weight"] = _t(sub["ln_1"]["scale"])
    out[f"{prefix}.ln_1.bias"] = _t(sub["ln_1"]["bias"])
    out[f"{prefix}.ln_2.weight"] = _t(sub["ln_2"]["scale"])
    out[f"{prefix}.ln_2.bias"] = _t(sub["ln_2"]["bias"])
    if "mlp" in sub:
        out[f"{prefix}.mlp.c_fc.weight"] = _t(sub["mlp"]["c_fc"]["kernel"]).T
        out[f"{prefix}.mlp.c_fc.bias"] = _t(sub["mlp"]["c_fc"]["bias"])
        out[f"{prefix}.mlp.c_proj.weight"] = _t(sub["mlp"]["c_proj"]["kernel"]).T
        out[f"{prefix}.mlp.c_proj.bias"] = _t(sub["mlp"]["c_proj"]["bias"])


def _export_bn(params: Dict, stats: Dict, prefix: str, out: Dict[str, Any]) -> None:
    import torch

    out[f"{prefix}.weight"] = _t(params["scale"])
    out[f"{prefix}.bias"] = _t(params["bias"])
    out[f"{prefix}.running_mean"] = _t(stats["mean"])
    out[f"{prefix}.running_var"] = _t(stats["var"])
    out[f"{prefix}.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)


def _export_vit_visual(vp: Dict, clip_config, out: Dict[str, Any]) -> None:
    pre = "image_encoder"
    out[f"{pre}.conv1.weight"] = _t(
        np.transpose(np.asarray(vp["conv1"]["kernel"], np.float32), (3, 2, 0, 1))
    )
    out[f"{pre}.class_embedding"] = _t(vp["class_embedding"])
    out[f"{pre}.positional_embedding"] = _t(vp["positional_embedding"])
    out[f"{pre}.ln_pre.weight"] = _t(vp["ln_pre"]["scale"])
    out[f"{pre}.ln_pre.bias"] = _t(vp["ln_pre"]["bias"])
    out[f"{pre}.ln_post.weight"] = _t(vp["ln_post"]["scale"])
    out[f"{pre}.ln_post.bias"] = _t(vp["ln_post"]["bias"])
    out[f"{pre}.proj"] = _t(vp["proj"])
    inv_perm = clip_config._perm_inverse("vision")
    for i in range(clip_config.vision_layers):
        prefix = f"{pre}.transformer.resblocks.{i}"
        if f"moe_resblocks_{i}" in vp:
            sub = vp[f"moe_resblocks_{i}"]
            _export_block(sub, prefix, out, clip_config.lora_alpha, inv_perm)
            out[f"{prefix}.gate.weight"] = _t(sub["gate_kernel"]).T
            e = sub["experts"]["c_fc_kernel"].shape[0]
            for m in range(e):
                out[f"{prefix}.experts.{m}.c_fc.weight"] = _t(
                    sub["experts"]["c_fc_kernel"][m]
                ).T
                out[f"{prefix}.experts.{m}.c_fc.bias"] = _t(
                    sub["experts"]["c_fc_bias"][m]
                )
                out[f"{prefix}.experts.{m}.c_proj.weight"] = _t(
                    sub["experts"]["c_proj_kernel"][m]
                ).T
                out[f"{prefix}.experts.{m}.c_proj.bias"] = _t(
                    sub["experts"]["c_proj_bias"][m]
                )
        else:
            _export_block(vp[f"resblocks_{i}"], prefix, out,
                          clip_config.lora_alpha, inv_perm)


def _export_resnet_visual(vp: Dict, vs: Dict, clip_config, out: Dict[str, Any]) -> None:
    pre = "image_encoder"

    def conv(key, sub):
        out[key] = _t(
            np.transpose(np.asarray(sub["kernel"], np.float32), (3, 2, 0, 1))
        )

    for i in (1, 2, 3):
        conv(f"{pre}.conv{i}.weight", vp[f"conv{i}"])
        _export_bn(vp[f"bn{i}"]["bn"], vs[f"bn{i}"]["bn"], f"{pre}.bn{i}", out)

    for stage, blocks in zip(
        ("layer1", "layer2", "layer3", "layer4"), clip_config.vision_layers
    ):
        for b in range(blocks):
            name = f"{stage}_{b}"
            bp, bs = vp[name], vs[name]
            for c in (1, 2, 3):
                conv(f"{pre}.{stage}.{b}.conv{c}.weight", bp[f"conv{c}"])
                _export_bn(bp[f"bn{c}"]["bn"], bs[f"bn{c}"]["bn"],
                           f"{pre}.{stage}.{b}.bn{c}", out)
            if "downsample_conv" in bp:
                conv(f"{pre}.{stage}.{b}.downsample.0.weight",
                     bp["downsample_conv"])
                _export_bn(bp["downsample_bn"]["bn"], bs["downsample_bn"]["bn"],
                           f"{pre}.{stage}.{b}.downsample.1", out)

    ap = vp["attnpool"]
    out[f"{pre}.attnpool.positional_embedding"] = _t(ap["positional_embedding"])
    for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
        out[f"{pre}.attnpool.{proj}.weight"] = _t(ap[proj]["kernel"]).T
        out[f"{pre}.attnpool.{proj}.bias"] = _t(ap[proj]["bias"])


def export_reid_state_dict(variables: Dict[str, Any], model) -> Dict[str, Any]:
    """Our variable tree → a reference-layout torch state_dict.

    The inverse of :func:`convert_reid_state_dict`: the returned dict uses
    the exact key names the reference's ``build_transformer`` /
    ``build_transformer_uniprompt`` modules produce, so the reference's own
    ``load_param`` (ref make_model.py:118-122, copy-by-name with ``module.``
    strip) accepts it directly. Not exported (frozen buffers the reference
    recomputes at init from the CLIP checkpoint): ``prompt_learner.token_prefix``
    / ``token_suffix`` and the text tower's ``token_embedding``.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: Dict[str, Any] = {}

    if "visual" in params:
        if model.clip_config.is_vit:
            _export_vit_visual(params["visual"], model.clip_config, out)
        else:
            _export_resnet_visual(
                params["visual"], stats.get("visual", {}), model.clip_config, out
            )

    for name in ("bottleneck", "bottleneck_proj"):
        if name in params:
            _export_bn(params[name], stats[name], name, out)

    for name in ("classifier", "classifier_proj"):
        if name in params:
            out[f"{name}.weight"] = _t(params[name]["kernel"]).T

    if "cv_embed" in params:
        out["cv_embed"] = _t(params["cv_embed"])
    if "visual_prompt" in params:
        out["visual_prompt"] = _t(params["visual_prompt"])

    if "fusion_fc1" in params:
        out["image_fusion_net.fc1.weight"] = _t(params["fusion_fc1"]["kernel"]).T
        out["image_fusion_net.fc1.bias"] = _t(params["fusion_fc1"]["bias"])
        out["image_fusion_net.fc2.weight"] = _t(params["fusion_fc2"]["kernel"]).T
        out["image_fusion_net.fc2.bias"] = _t(params["fusion_fc2"]["bias"])

    if "prompt_learner" in params:
        pl = params["prompt_learner"]
        out["prompt_learner.ctx_generic"] = _t(pl["ctx_generic"])
        out["prompt_learner.ctx_modality"] = _t(pl["ctx_modality"])
        out["prompt_learner.ctx_platform"] = _t(pl["ctx_platform"])
        if "ve_linear1" in pl:
            out["prompt_learner.visual_enhanced_net.linear1.weight"] = _t(
                pl["ve_linear1"]["kernel"]
            ).T
            out["prompt_learner.visual_enhanced_net.linear1.bias"] = _t(
                pl["ve_linear1"]["bias"]
            )
            out["prompt_learner.visual_enhanced_net.linear2.weight"] = _t(
                pl["ve_linear2"]["kernel"]
            ).T
            out["prompt_learner.visual_enhanced_net.linear2.bias"] = _t(
                pl["ve_linear2"]["bias"]
            )

    if "text" in params:
        tp = params["text"]
        out["text_encoder.positional_embedding"] = _t(tp["positional_embedding"])
        out["text_encoder.ln_final.weight"] = _t(tp["ln_final"]["scale"])
        out["text_encoder.ln_final.bias"] = _t(tp["ln_final"]["bias"])
        out["text_encoder.text_projection"] = _t(tp["text_projection"])
        text_inv = model.clip_config._perm_inverse("text")
        for i in range(model.clip_config.transformer_layers):
            _export_block(
                tp[f"resblocks_{i}"], f"text_encoder.transformer.resblocks.{i}",
                out, model.clip_config.lora_alpha, text_inv,
            )

    return out


def save_param(path: str, model, variables: Dict[str, Any]) -> None:
    """Write a reference-loadable ``.pth`` (inverse of :func:`load_param`)."""
    import torch

    torch.save(export_reid_state_dict(variables, model), path)
