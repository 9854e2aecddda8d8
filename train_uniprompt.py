"""Uni-Prompt four-phase training entry point (reference
``train_uniprompt.py`` CLI surface): stage 1a → 1b → (MoE switch) → 2a →
2b → final inference.

Unlike the reference, the MoE switch actually works
(``switch_to_moe_model`` is undefined in the reference —
ref train_uniprompt.py:128-129; see models.factory.switch_to_moe).
"""

import argparse
import os
import random

import numpy as np

from mpreid_tpu.config import get_default_cfg
from mpreid_tpu.data import make_dataloader
from mpreid_tpu.engine import (
    build_image_bank,
    do_inference_uniprompt,
    do_train_stage1,
    do_train_stage2,
)
from mpreid_tpu.losses import make_loss
from mpreid_tpu.models import (
    init_variables,
    load_pretrained,
    make_model_uniprompt,
    switch_to_moe,
)
from mpreid_tpu.solver import make_optimizer, make_scheduler
from mpreid_tpu.utils import setup_logger


def main():
    parser = argparse.ArgumentParser(description="Uni-Prompt ReID Training")
    parser.add_argument("--config_file",
                        default="configs/ours/cctv_ir_cctv_rgb.yml", type=str)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    cfg = get_default_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()

    from mpreid_tpu.utils.platform import apply_device
    apply_device(cfg)

    np.random.seed(cfg.SOLVER.SEED)
    random.seed(cfg.SOLVER.SEED)

    output_dir = cfg.OUTPUT_DIR
    if output_dir:
        output_dir = os.path.join(output_dir, cfg.DATASETS.EXP_SETTING)
        os.makedirs(output_dir, exist_ok=True)
    logger = setup_logger("mpreid_tpu", output_dir, if_train=True)
    logger.info(f"Saving model in the path :{cfg.OUTPUT_DIR}")
    logger.info(f"Running with config:\n{cfg}")

    import jax

    (train_loader_stage2, train_loader_stage1, val_loader, num_query,
     num_classes, camera_num, view_num) = make_dataloader(cfg)

    # Stage 1 trains against the dense model; the MoE switch (upcycling)
    # happens after stage 1 — build dense first even when MOE.ENABLED.
    stage1_cfg = cfg.clone()
    stage1_cfg.MODEL.MOE.ENABLED = False
    stage1_cfg.freeze()
    model = make_model_uniprompt(stage1_cfg, num_class=num_classes,
                                 camera_num=camera_num, view_num=view_num)
    variables = init_variables(model, jax.random.PRNGKey(cfg.SOLVER.SEED), cfg)
    if cfg.MODEL.PRETRAIN_PATH or cfg.MODEL.PRETRAIN_AUTO:
        # use the dense stage-1 config: with MOE enabled, cfg would make the
        # converter emit an MoE-structured visual tree that cannot graft
        # into the dense stage-1 model
        variables = load_pretrained(variables, stage1_cfg)
        logger.info(f"Loaded CLIP weights from "
                    f"{cfg.MODEL.PRETRAIN_PATH or 'auto-downloaded checkpoint'}")

    loss_fn, (center_init, _) = make_loss(cfg, num_classes=num_classes)
    centers = None
    if "center" in cfg.MODEL.METRIC_LOSS_TYPE:
        centers = center_init(jax.random.PRNGKey(cfg.SOLVER.SEED + 1))

    # ----- Stage 1: shared frozen-encoder feature bank -----
    logger.info("===== Configuring and starting Stage 1a training =====")
    bank = build_image_bank(cfg, model, variables, train_loader_stage1)
    opt_1a = make_optimizer(cfg.SOLVER.STAGE1A, variables["params"], stage="stage1a")
    sched_1a = make_scheduler(cfg.SOLVER.STAGE1A, "cosine")
    variables, _ = do_train_stage1(
        cfg, model, variables, train_loader_stage1, opt_1a, sched_1a,
        is_stage1b=False, bank=bank, stage_cfg=cfg.SOLVER.STAGE1A,
    )

    logger.info("===== Configuring and starting Stage 1b training =====")
    opt_1b = make_optimizer(cfg.SOLVER.STAGE1B, variables["params"], stage="stage1b")
    sched_1b = make_scheduler(cfg.SOLVER.STAGE1B, "cosine")
    variables, _ = do_train_stage1(
        cfg, model, variables, train_loader_stage1, opt_1b, sched_1b,
        is_stage1b=True, bank=bank, stage_cfg=cfg.SOLVER.STAGE1B,
    )

    # ----- Optional dense→MoE upcycling -----
    if cfg.MODEL.MOE.ENABLED:
        logger.info("Switching to MoE vision transformer")
        model, variables = switch_to_moe(cfg, model, variables)

    # ----- Stage 2a: fine-tune all but text encoder / experts / prompts -----
    logger.info("2a stage, train parameters marked as trainable...")
    opt_2a = make_optimizer(cfg.SOLVER.STAGE2, variables["params"], stage="stage2a")
    sched_2 = make_scheduler(cfg.SOLVER.STAGE2, "multistep")
    variables, _ = do_train_stage2(
        cfg, model, variables, train_loader_stage2, val_loader, opt_2a, sched_2,
        loss_fn, num_query, num_classes, centers=centers,
    )

    # ----- Stage 2b: gates + image encoder minus experts -----
    logger.info("2b stage, train gate and image_encoder mlp (except experts)")
    opt_2b = make_optimizer(cfg.SOLVER.STAGE2, variables["params"], stage="stage2b")
    variables, _ = do_train_stage2(
        cfg, model, variables, train_loader_stage2, val_loader, opt_2b, sched_2,
        loss_fn, num_query, num_classes, centers=centers,
    )

    do_inference_uniprompt(cfg, model, variables, val_loader, num_query)


if __name__ == "__main__":
    main()
