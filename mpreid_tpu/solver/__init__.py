from .optim import (
    CenterOptimizer,
    Optimizer,
    OptState,
    group_trees,
    make_optimizer,
    path_strings,
    stage_trainable,
)
from .schedules import make_scheduler, warmup_cosine, warmup_multistep, with_lr_noise
