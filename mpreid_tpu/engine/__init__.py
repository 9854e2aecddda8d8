from .evaluator import R1mAPEvaluator
from .processor import do_inference, do_train, run_validation
from .steps import (
    make_eval_step,
    make_image_bank_step,
    make_stage1_epoch,
    make_stage1_step,
    make_text_step,
    make_train_epoch,
    make_train_step,
)
from .train_state import TrainState, initial_state
from .uniprompt import (
    build_image_bank,
    do_train_stage1,
    do_train_stage2,
    precompute_text_features,
)
from .uniprompt import do_inference as do_inference_uniprompt
from .ttpt import do_inference_tta, do_inference_ttpt
