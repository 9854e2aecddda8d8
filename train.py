"""Baseline training entry point (reference ``train.py`` CLI surface).

Usage: python train.py --config_file configs/person/vit_base.yml [KEY VALUE ...]
"""

import argparse
import os
import random

import numpy as np

from mpreid_tpu.config import get_default_cfg
from mpreid_tpu.data import make_dataloader
from mpreid_tpu.engine import do_train
from mpreid_tpu.losses import make_loss
from mpreid_tpu.models import init_variables, load_pretrained, make_model
from mpreid_tpu.solver import make_optimizer, warmup_multistep
from mpreid_tpu.utils import setup_logger


def set_seed(seed: int):
    # JAX randomness is key-threaded; host-side numpy/random drive sampling.
    np.random.seed(seed)
    random.seed(seed)


def main():
    parser = argparse.ArgumentParser(description="ReID Baseline Training")
    parser.add_argument("--config_file", default="", type=str,
                        help="path to config file")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                        help="Modify config options from the command line")
    args = parser.parse_args()

    cfg = get_default_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    # baseline uses the flat SOLVER block for loaders built on stage fields
    cfg.SOLVER.STAGE2.IMS_PER_BATCH = cfg.SOLVER.IMS_PER_BATCH
    cfg.freeze()

    from mpreid_tpu.utils.platform import apply_device
    apply_device(cfg)

    set_seed(cfg.SOLVER.SEED)
    output_dir = cfg.OUTPUT_DIR
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
    logger = setup_logger("mpreid_tpu", output_dir, if_train=True)
    logger.info(f"Saving model in the path :{cfg.OUTPUT_DIR}")
    if args.config_file:
        logger.info(f"Loaded configuration file {args.config_file}")
    logger.info(f"Running with config:\n{cfg}")

    import jax

    (train_loader, _, val_loader, num_query, num_classes,
     camera_num, view_num) = make_dataloader(cfg)

    model = make_model(cfg, num_class=num_classes, camera_num=camera_num,
                       view_num=view_num)
    variables = init_variables(model, jax.random.PRNGKey(cfg.SOLVER.SEED), cfg)
    if cfg.MODEL.PRETRAIN_PATH or cfg.MODEL.PRETRAIN_AUTO:
        variables = load_pretrained(variables, cfg)
        logger.info(f"Loaded CLIP weights from "
                    f"{cfg.MODEL.PRETRAIN_PATH or 'auto-downloaded checkpoint'}")

    loss_fn, (center_init, _) = make_loss(cfg, num_classes=num_classes)
    centers = None
    if "center" in cfg.MODEL.METRIC_LOSS_TYPE:
        centers = center_init(jax.random.PRNGKey(cfg.SOLVER.SEED + 1))

    optimizer = make_optimizer(cfg.SOLVER, variables["params"], stage="baseline")
    scheduler = warmup_multistep(
        cfg.SOLVER.BASE_LR, cfg.SOLVER.STEPS, cfg.SOLVER.GAMMA,
        cfg.SOLVER.WARMUP_FACTOR, cfg.SOLVER.WARMUP_ITERS, cfg.SOLVER.WARMUP_METHOD,
    )

    do_train(cfg, model, variables, train_loader, val_loader, optimizer,
             scheduler, loss_fn, num_query, centers=centers)


if __name__ == "__main__":
    main()
