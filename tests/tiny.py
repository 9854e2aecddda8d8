"""Tiny model/config helpers shared by engine tests."""

import dataclasses

from mpreid_tpu.config import get_default_cfg
from mpreid_tpu.models.clip_model import VIT_B16


def tiny_cfg(**overrides):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "ViT-B-16"
    cfg.INPUT.SIZE_TRAIN = [32, 16]
    cfg.INPUT.SIZE_TEST = [32, 16]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DATALOADER.SAMPLER = "softmax_triplet"
    cfg.DATALOADER.NUM_INSTANCE = 4
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.SOLVER.STAGE1.IMS_PER_BATCH = 8
    cfg.SOLVER.STAGE2.IMS_PER_BATCH = 8
    cfg.SOLVER.LOG_PERIOD = 1000
    cfg.TEST.IMS_PER_BATCH = 16
    for k, v in overrides.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return cfg


def tiny_clip_config(**overrides):
    """A 2-layer, 64-wide CLIP so CPU tests init in seconds."""
    kwargs = dict(
        embed_dim=32,
        vision_layers=2,
        vision_width=64,
        vision_patch_size=16,
        vision_stride_size=16,
        h_resolution=2,
        w_resolution=1,
        context_length=77,
        vocab_size=49408,
        transformer_width=64,
        transformer_heads=1,
        transformer_layers=2,
    )
    kwargs.update(overrides)
    return dataclasses.replace(VIT_B16, **kwargs)


def tiny_model(cfg, num_classes=8, uniprompt=False, **model_overrides):
    import jax
    from mpreid_tpu.models.reid import ReIDModel
    from mpreid_tpu.models.uniprompt import UniPromptReID
    from mpreid_tpu.models.factory import init_variables

    clip_config = tiny_clip_config(
        **{k: v for k, v in model_overrides.pop("clip_overrides", {}).items()}
    )
    # ctx_dim of the prompt learner must equal the text width for tiny models
    cls = UniPromptReID if uniprompt else ReIDModel
    kwargs = dict(
        clip_config=clip_config,
        num_classes=num_classes,
        camera_num=14,
        view_num=1,
        sie_camera=cfg.MODEL.SIE_CAMERA,
        sie_view=cfg.MODEL.SIE_VIEW,
        sie_coe=cfg.MODEL.SIE_COE,
        neck_feat=cfg.TEST.NECK_FEAT,
    )
    kwargs.update(model_overrides)
    model = cls(**kwargs)
    variables = init_variables(model, jax.random.PRNGKey(0), cfg)
    return model, variables
