"""Baseline evaluation entry point (reference ``test.py`` CLI surface).

Handles the VehicleID 10-trial averaging protocol (ref test.py:46-63).
"""

import argparse
import os

import numpy as np

from mpreid_tpu.config import get_default_cfg
from mpreid_tpu.data import build_dataset, make_dataloader
from mpreid_tpu.engine import do_inference
from mpreid_tpu.models import init_variables, make_model
from mpreid_tpu.utils import setup_logger
from mpreid_tpu.utils.checkpoint import load_weights


def main():
    parser = argparse.ArgumentParser(description="ReID Baseline Testing")
    parser.add_argument("--config_file", default="", type=str)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    cfg = get_default_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()

    from mpreid_tpu.utils.platform import apply_device
    apply_device(cfg)

    output_dir = cfg.OUTPUT_DIR
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
    logger = setup_logger("mpreid_tpu", output_dir, if_train=False)
    logger.info(f"Running with config:\n{cfg}")

    import jax

    if cfg.DATASETS.NAMES == "VehicleID":
        dataset = build_dataset("VehicleID", cfg.DATASETS.ROOT_DIR, seed=cfg.SOLVER.SEED)
        (_, _, val_loader, num_query, num_classes,
         camera_num, view_num) = make_dataloader(cfg, dataset=dataset)
    else:
        dataset = None
        (_, _, val_loader, num_query, num_classes,
         camera_num, view_num) = make_dataloader(cfg)

    model = make_model(cfg, num_class=num_classes, camera_num=camera_num,
                       view_num=view_num)
    # full orbax checkpoints overwrite every weight — skip the expensive
    # init computation and materialize structure only
    from mpreid_tpu.utils.checkpoint import is_torch_weight

    full_ckpt = bool(cfg.TEST.WEIGHT) and not is_torch_weight(cfg.TEST.WEIGHT)
    variables = init_variables(model, jax.random.PRNGKey(0), cfg, abstract=full_ckpt)
    if cfg.TEST.WEIGHT:
        if is_torch_weight(cfg.TEST.WEIGHT):
            # trained reference (torch) checkpoint
            from mpreid_tpu.models.convert import load_param

            variables = load_param(cfg.TEST.WEIGHT, model, variables)
        else:
            variables = load_weights(cfg.TEST.WEIGHT, variables, cfg)
        logger.info(f"Loading pretrained model from {cfg.TEST.WEIGHT}")

    if cfg.DATASETS.NAMES == "VehicleID":
        # 10 random gallery trials, averaged (ref test.py:46-63)
        from mpreid_tpu.data import ImageBatcher
        from mpreid_tpu.engine import run_validation

        all_r1, all_r5, all_map = [], [], []
        for trial in range(10):
            dataset.resample()
            records = list(dataset.query) + list(dataset.gallery)
            val_loader = ImageBatcher(
                records, tuple(cfg.INPUT.SIZE_TEST), cfg.TEST.IMS_PER_BATCH,
                cfg.DATALOADER.NUM_WORKERS,
            )
            cmc, mAP = run_validation(
                cfg, model, variables["params"], variables.get("batch_stats", {}),
                val_loader, len(dataset.query), logger,
            )
            logger.info(
                f"Trial {trial}: Rank-1 {cmc[0]:.1%} Rank-5 {cmc[4]:.1%} mAP {mAP:.1%}"
            )
            all_r1.append(float(cmc[0]))
            all_r5.append(float(cmc[4]))
            all_map.append(float(mAP))
        logger.info(
            f"Averaged over 10 trials: Rank-1 {np.mean(all_r1):.1%} "
            f"Rank-5 {np.mean(all_r5):.1%} mAP {np.mean(all_map):.1%}"
        )
    else:
        do_inference(cfg, model, variables, val_loader, num_query)


if __name__ == "__main__":
    main()
