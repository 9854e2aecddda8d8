"""Uni-Prompt evaluation entry point (reference ``test_uniprompt.py``).

Supports plain inference plus the TTA / TTPT eval modes
(``TEST.TTA_ENABLED`` / ``TEST.TTPT.ENABLED``).
"""

import argparse
import os

from mpreid_tpu.config import get_default_cfg
from mpreid_tpu.data import make_dataloader
from mpreid_tpu.engine import do_inference_uniprompt
from mpreid_tpu.models import init_variables, make_model_uniprompt, switch_to_moe
from mpreid_tpu.utils import setup_logger
from mpreid_tpu.utils.checkpoint import load_weights


def main():
    parser = argparse.ArgumentParser(description="Uni-Prompt ReID Testing")
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

    (_, _, val_loader, num_query, num_classes,
     camera_num, view_num) = make_dataloader(cfg)

    model = make_model_uniprompt(cfg, num_class=num_classes,
                                 camera_num=camera_num, view_num=view_num)
    # full orbax checkpoints overwrite every weight — skip the expensive
    # init computation and materialize structure only
    from mpreid_tpu.utils.checkpoint import is_torch_weight

    full_ckpt = bool(cfg.TEST.WEIGHT) and not is_torch_weight(cfg.TEST.WEIGHT)
    variables = init_variables(model, jax.random.PRNGKey(0), cfg, abstract=full_ckpt)
    if cfg.MODEL.MOE.ENABLED:
        model, variables = switch_to_moe(cfg, model, variables)
    if cfg.TEST.WEIGHT:
        if is_torch_weight(cfg.TEST.WEIGHT):
            # trained reference (torch) checkpoint
            from mpreid_tpu.models.convert import load_param

            variables = load_param(cfg.TEST.WEIGHT, model, variables)
        else:
            variables = load_weights(cfg.TEST.WEIGHT, variables)
        logger.info(f"Loading pretrained model from {cfg.TEST.WEIGHT}")

    if cfg.TEST.TTPT.ENABLED or cfg.TEST.TTA_ENABLED:
        from mpreid_tpu.engine.ttpt import do_inference_ttpt

        do_inference_ttpt(cfg, model, variables, val_loader, num_query)
    else:
        do_inference_uniprompt(cfg, model, variables, val_loader, num_query)


if __name__ == "__main__":
    main()
