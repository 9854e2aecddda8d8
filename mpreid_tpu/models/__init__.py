from .clip_model import (
    CLIP,
    CLIPConfig,
    RN50,
    VIT_B16,
    config_from_state_dict,
    convert_clip_state_dict,
    load_torch_clip,
)
from .factory import (
    clip_config_from_cfg,
    graft_clip_variables,
    init_variables,
    load_pretrained,
    make_model,
    make_model_uniprompt,
    switch_to_moe,
)
from .layers import BNNeck, LayerNorm, MultiHeadAttention, ResidualAttentionBlock
from .moe import load_balancing_loss, topk_routing
from .reid import ReIDModel
from .text import TextTransformer
from .tokenizer import tokenize, get_tokenizer
from .uniprompt import PromptLearner, UniPromptReID
from .vit import VisionTransformer, resize_pos_embed
from .convert import apply_overlay, convert_reid_state_dict, load_param
