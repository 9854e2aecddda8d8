"""CLIP assembly: vision tower + text tower + builders/converters.

Mirrors the reference's ``build_model`` contract (reference
``model/clip/model.py:678-728``): architecture hyper-parameters are inferred
from the shapes of an OpenAI CLIP torch ``state_dict`` and the vision
positional embedding is bilinearly resized to the ReID (h, w) patch grid.
Unlike the reference we return fp32 JAX parameter pytrees (bf16 is a compute
policy here, not a storage format — TPUs have no fp16 GradScaler story and
bf16 master weights lose accuracy for no speedup).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from .resnet import ModifiedResNet
from .text import TextTransformer
from .vit import VisionTransformer, resize_pos_embed


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int
    # vision
    vision_layers: Any  # int (ViT) or tuple of 4 ints (ResNet)
    vision_width: int
    vision_patch_size: Optional[int]
    vision_stride_size: int
    h_resolution: int
    w_resolution: int
    # text
    context_length: int
    vocab_size: int
    transformer_width: int
    transformer_heads: int
    transformer_layers: int
    # MoE
    num_experts: int = 0
    top_k: int = 0
    moe_layers: int = 0
    dropout: float = 0.0
    shared_routing: bool = True
    # LoRA adapters on attention projections (0 = disabled)
    lora_rank: int = 0
    lora_alpha: float = 16.0
    # Attention QKV param layouts ('' → the tuned defaults in ops.attention:
    # MODEL_LAYOUT for vision, TEXT_LAYOUT for text). "hm_native" stores
    # in_proj params head-major — the converters below permute columns on
    # torch import/export so checkpoints stay reference-compatible.
    vision_layout: str = ""
    text_layout: str = ""

    @property
    def is_vit(self) -> bool:
        return isinstance(self.vision_layers, int)

    def _perm(self, tower: str):
        """Import-time column permutation for a tower (None if packed)."""
        from mpreid_tpu.ops import attention as attn

        if tower == "text":
            layout = attn.resolve_layout(self.text_layout, tower="text")
            d = self.transformer_width
            heads = self.transformer_heads
        else:
            layout = attn.resolve_layout(self.vision_layout, tower="vision")
            d = self.vision_width
            heads = self.vision_width // 64
        if layout != "hm_native":
            return None
        return attn.head_major_perm(d, heads)

    def _perm_inverse(self, tower: str):
        """Export-time inverse permutation (None if packed)."""
        from mpreid_tpu.ops import attention as attn

        if self._perm(tower) is None:
            return None
        if tower == "text":
            return attn.head_major_perm_inverse(
                self.transformer_width, self.transformer_heads
            )
        return attn.head_major_perm_inverse(
            self.vision_width, self.vision_width // 64
        )


VIT_B16 = CLIPConfig(
    embed_dim=512, vision_layers=12, vision_width=768, vision_patch_size=16,
    vision_stride_size=16, h_resolution=16, w_resolution=8,
    context_length=77, vocab_size=49408, transformer_width=512,
    transformer_heads=8, transformer_layers=12,
)

RN50 = CLIPConfig(
    embed_dim=1024, vision_layers=(3, 4, 6, 3), vision_width=64,
    vision_patch_size=None, vision_stride_size=16, h_resolution=16,
    w_resolution=8, context_length=77, vocab_size=49408,
    transformer_width=512, transformer_heads=8, transformer_layers=12,
)


def make_visual_tower(cfg: CLIPConfig, dtype=jnp.float32, remat: bool = False):
    if cfg.is_vit:
        return VisionTransformer(
            h_resolution=cfg.h_resolution,
            w_resolution=cfg.w_resolution,
            patch_size=cfg.vision_patch_size,
            stride_size=cfg.vision_stride_size,
            width=cfg.vision_width,
            layers=cfg.vision_layers,
            heads=cfg.vision_width // 64,
            output_dim=cfg.embed_dim,
            num_experts=cfg.num_experts,
            top_k=cfg.top_k,
            moe_layers=cfg.moe_layers,
            dropout=cfg.dropout,
            shared_routing=cfg.shared_routing,
            dtype=dtype,
            remat=remat,
            lora_rank=cfg.lora_rank,
            lora_alpha=cfg.lora_alpha,
            layout=cfg.vision_layout or None,
            name="visual",
        )
    return ModifiedResNet(
        layers=tuple(cfg.vision_layers),
        output_dim=cfg.embed_dim,
        heads=cfg.vision_width * 32 // 64,
        input_resolution=cfg.h_resolution * cfg.w_resolution,
        width=cfg.vision_width,
        dtype=dtype,
        name="visual",
    )


def make_text_tower(cfg: CLIPConfig, dtype=jnp.float32):
    return TextTransformer(
        context_length=cfg.context_length,
        vocab_size=cfg.vocab_size,
        width=cfg.transformer_width,
        heads=cfg.transformer_heads,
        layers=cfg.transformer_layers,
        embed_dim=cfg.embed_dim,
        dtype=dtype,
        lora_rank=cfg.lora_rank,
        lora_alpha=cfg.lora_alpha,
        layout=cfg.text_layout or None,
        name="text",
    )


class CLIP(nn.Module):
    """Full CLIP (image + text) for contrastive use (ref model.py:481-651)."""

    config: CLIPConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.visual = make_visual_tower(self.config, self.dtype)
        self.text = make_text_tower(self.config, self.dtype)
        self.logit_scale = self.param(
            "logit_scale",
            lambda key: jnp.asarray(np.log(1 / 0.07), jnp.float32),
        )

    def encode_image(self, image, cv_emb=None, train: bool = False):
        if self.config.is_vit:
            return self.visual(image, cv_emb, deterministic=not train)
        return self.visual(image, cv_emb, train=train)

    def encode_text(self, tokens):
        return self.text.encode_tokens(tokens)

    def __call__(self, image, tokens, train: bool = False):
        _, _, image_tokens, router_logits = self.encode_image(image, train=train)
        image_features = image_tokens[:, 0] if self.config.is_vit else image_tokens[0]
        text_features = self.encode_text(tokens)
        image_features = image_features / jnp.linalg.norm(
            image_features, axis=-1, keepdims=True
        )
        text_features = text_features / jnp.linalg.norm(
            text_features, axis=-1, keepdims=True
        )
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * image_features @ text_features.T
        return logits_per_image, logits_per_image.T, router_logits


# ---------------------------------------------------------------------------
# torch state_dict → (config, flax variables)
# ---------------------------------------------------------------------------

def config_from_state_dict(
    sd: Dict[str, Any], h_resolution: int, w_resolution: int, vision_stride_size: int,
    num_experts: int = 0, top_k: int = 0, moe_layers: int = 0, dropout: float = 0.0,
    vision_layout: str = "", text_layout: str = "",
) -> CLIPConfig:
    """Infer architecture from checkpoint shapes (ref model.py:678-702)."""
    vit = "visual.proj" in sd
    if vit:
        vision_width = sd["visual.conv1.weight"].shape[0]
        vision_layers = len(
            [k for k in sd if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")]
        )
        vision_patch_size = sd["visual.conv1.weight"].shape[-1]
    else:
        counts = [
            len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")})
            for b in [1, 2, 3, 4]
        ]
        vision_layers = tuple(counts)
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        vision_patch_size = None
    embed_dim = sd["text_projection"].shape[1]
    context_length = sd["positional_embedding"].shape[0]
    vocab_size = sd["token_embedding.weight"].shape[0]
    transformer_width = sd["ln_final.weight"].shape[0]
    transformer_layers = len(
        {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")}
    )
    return CLIPConfig(
        embed_dim=embed_dim,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        vision_stride_size=vision_stride_size,
        h_resolution=h_resolution,
        w_resolution=w_resolution,
        context_length=context_length,
        vocab_size=vocab_size,
        transformer_width=transformer_width,
        transformer_heads=transformer_width // 64,
        transformer_layers=transformer_layers,
        num_experts=num_experts,
        top_k=top_k,
        moe_layers=moe_layers,
        dropout=dropout,
        vision_layout=vision_layout,
        text_layout=text_layout,
    )


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def _convert_block(sd: Dict[str, Any], prefix: str, perm=None,
                   mlp: bool = True) -> Dict[str, Any]:
    """One ResidualAttentionBlock: torch keys → flax param subtree.

    ``perm`` (a head_major_perm array) re-orders the in_proj columns for
    models whose attention layout is "hm_native" (params stored head-major).
    ``mlp=False`` skips the dense-MLP keys (MoE blocks replace them with
    gate + stacked experts, converted by the caller).
    """
    in_kernel = _np(sd[f"{prefix}.attn.in_proj_weight"]).T
    in_bias = _np(sd[f"{prefix}.attn.in_proj_bias"])
    if perm is not None:
        in_kernel = np.ascontiguousarray(in_kernel[:, perm])
        in_bias = np.ascontiguousarray(in_bias[perm])
    block = {
        "attn": {
            "in_proj_kernel": in_kernel,
            "in_proj_bias": in_bias,
            "out_proj_kernel": _np(sd[f"{prefix}.attn.out_proj.weight"]).T,
            "out_proj_bias": _np(sd[f"{prefix}.attn.out_proj.bias"]),
        },
        "ln_1": {
            "scale": _np(sd[f"{prefix}.ln_1.weight"]),
            "bias": _np(sd[f"{prefix}.ln_1.bias"]),
        },
        "ln_2": {
            "scale": _np(sd[f"{prefix}.ln_2.weight"]),
            "bias": _np(sd[f"{prefix}.ln_2.bias"]),
        },
    }
    if mlp:
        block["mlp"] = {
            "c_fc": {
                "kernel": _np(sd[f"{prefix}.mlp.c_fc.weight"]).T,
                "bias": _np(sd[f"{prefix}.mlp.c_fc.bias"]),
            },
            "c_proj": {
                "kernel": _np(sd[f"{prefix}.mlp.c_proj.weight"]).T,
                "bias": _np(sd[f"{prefix}.mlp.c_proj.bias"]),
            },
        }
    return block


def _convert_bn(sd, prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def _convert_resnet_visual(sd, cfg: CLIPConfig, resize_pos: bool = True) -> Tuple[Dict, Dict]:
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv(key):
        return {"kernel": _np(sd[key]).transpose(2, 3, 1, 0)}

    for i in (1, 2, 3):
        params[f"conv{i}"] = conv(f"visual.conv{i}.weight")
        p, s = _convert_bn(sd, f"visual.bn{i}")
        params[f"bn{i}"] = {"bn": p}
        stats[f"bn{i}"] = {"bn": s}

    for stage, blocks in zip(("layer1", "layer2", "layer3", "layer4"), cfg.vision_layers):
        for b in range(blocks):
            src = f"visual.{stage}.{b}"
            name = f"{stage}_{b}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for c in (1, 2, 3):
                bp[f"conv{c}"] = conv(f"{src}.conv{c}.weight")
                p, s = _convert_bn(sd, f"{src}.bn{c}")
                bp[f"bn{c}"] = {"bn": p}
                bs[f"bn{c}"] = {"bn": s}
            if f"{src}.downsample.0.weight" in sd:
                bp["downsample_conv"] = conv(f"{src}.downsample.0.weight")
                p, s = _convert_bn(sd, f"{src}.downsample.1")
                bp["downsample_bn"] = {"bn": p}
                bs["downsample_bn"] = {"bn": s}
            params[name] = bp
            stats[name] = bs

    ap = "visual.attnpool"
    pos = _np(sd[f"{ap}.positional_embedding"])
    if resize_pos:
        # original CLIP checkpoints carry a square grid that must be resized;
        # trained ReID checkpoints already carry the target grid
        pos = np.asarray(
            resize_pos_embed(jnp.asarray(pos), cfg.h_resolution, cfg.w_resolution)
        )
    params["attnpool"] = {
        "positional_embedding": pos,
        "q_proj": {"kernel": _np(sd[f"{ap}.q_proj.weight"]).T, "bias": _np(sd[f"{ap}.q_proj.bias"])},
        "k_proj": {"kernel": _np(sd[f"{ap}.k_proj.weight"]).T, "bias": _np(sd[f"{ap}.k_proj.bias"])},
        "v_proj": {"kernel": _np(sd[f"{ap}.v_proj.weight"]).T, "bias": _np(sd[f"{ap}.v_proj.bias"])},
        "c_proj": {"kernel": _np(sd[f"{ap}.c_proj.weight"]).T, "bias": _np(sd[f"{ap}.c_proj.bias"])},
    }
    return params, stats


def _convert_vit_visual(sd, cfg: CLIPConfig) -> Tuple[Dict, Dict]:
    params: Dict[str, Any] = {
        # torch conv weight (out, in, kh, kw) → flax (kh, kw, in, out)
        "conv1": {"kernel": _np(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0)},
        "class_embedding": _np(sd["visual.class_embedding"]),
        "positional_embedding": np.asarray(
            resize_pos_embed(
                jnp.asarray(_np(sd["visual.positional_embedding"])),
                cfg.h_resolution,
                cfg.w_resolution,
            )
        ),
        "ln_pre": {
            "scale": _np(sd["visual.ln_pre.weight"]),
            "bias": _np(sd["visual.ln_pre.bias"]),
        },
        "ln_post": {
            "scale": _np(sd["visual.ln_post.weight"]),
            "bias": _np(sd["visual.ln_post.bias"]),
        },
        "proj": _np(sd["visual.proj"]),
    }
    n_moe = 0
    if cfg.num_experts > 0 and cfg.top_k > 0:
        n_moe = cfg.vision_layers if cfg.moe_layers == -1 else min(cfg.moe_layers, cfg.vision_layers)
    perm = cfg._perm("vision")
    for i in range(cfg.vision_layers):
        block = _convert_block(sd, f"visual.transformer.resblocks.{i}", perm)
        if i < n_moe:
            # Initialize every expert MLP from the dense checkpoint MLP
            # (standard upcycling; the reference loads non-strict instead).
            e, d = cfg.num_experts, cfg.vision_width
            mlp = block.pop("mlp")
            block["experts"] = {
                "c_fc_kernel": np.tile(mlp["c_fc"]["kernel"][None], (e, 1, 1)),
                "c_fc_bias": np.tile(mlp["c_fc"]["bias"][None], (e, 1)),
                "c_proj_kernel": np.tile(mlp["c_proj"]["kernel"][None], (e, 1, 1)),
                "c_proj_bias": np.tile(mlp["c_proj"]["bias"][None], (e, 1)),
            }
            block["gate_kernel"] = np.zeros((d, e), np.float32)
            params[f"moe_resblocks_{i}"] = block
        else:
            params[f"resblocks_{i}"] = block
    return params, {}


def convert_clip_state_dict(
    sd: Dict[str, Any],
    h_resolution: int,
    w_resolution: int,
    vision_stride_size: int,
    **moe_kwargs,
) -> Tuple[CLIPConfig, Dict[str, Any]]:
    """Full conversion. Returns (config, {'params': ..., 'batch_stats': ...}).

    The returned variable tree matches ``CLIP`` module naming ('visual', 'text',
    'logit_scale'); downstream models re-root the subtrees as needed.
    """
    cfg = config_from_state_dict(sd, h_resolution, w_resolution, vision_stride_size, **moe_kwargs)
    if cfg.is_vit:
        vis_params, vis_stats = _convert_vit_visual(sd, cfg)
    else:
        vis_params, vis_stats = _convert_resnet_visual(sd, cfg)

    text_params: Dict[str, Any] = {
        "token_embedding": {"embedding": _np(sd["token_embedding.weight"])},
        "positional_embedding": _np(sd["positional_embedding"]),
        "ln_final": {
            "scale": _np(sd["ln_final.weight"]),
            "bias": _np(sd["ln_final.bias"]),
        },
        "text_projection": _np(sd["text_projection"]),
    }
    text_perm = cfg._perm("text")
    for i in range(cfg.transformer_layers):
        text_params[f"resblocks_{i}"] = _convert_block(
            sd, f"transformer.resblocks.{i}", text_perm
        )

    variables = {
        "params": {
            "visual": vis_params,
            "text": text_params,
            "logit_scale": _np(sd["logit_scale"]),
        }
    }
    if vis_stats:
        variables["batch_stats"] = {"visual": vis_stats}
    return cfg, variables


def load_torch_clip(
    path: str, h_resolution: int, w_resolution: int, vision_stride_size: int, **moe_kwargs
) -> Tuple[CLIPConfig, Dict[str, Any]]:
    """Load an OpenAI CLIP ``.pt`` (jit archive or plain state_dict) from disk.

    Equivalent of reference ``make_model.py:137-150`` minus the download —
    supply the file (e.g. from ``~/.cache/clip``). Requires CPU torch.
    """
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu").eval()
        sd = model.state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu")
    for key in ("input_resolution", "context_length", "vocab_size"):
        sd.pop(key, None)
    return convert_clip_state_dict(
        sd, h_resolution, w_resolution, vision_stride_size, **moe_kwargs
    )
