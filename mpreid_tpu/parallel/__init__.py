from .sharded_eval import sharded_cmc_map, sharded_distmat, sharded_topk
from .mesh import (
    init_distributed,
    batch_sharding,
    make_mesh,
    mesh_from_cfg,
    param_spec,
    replicated,
    shard_batch,
    shard_variables,
)
from .zero import ZeroOptimizer, zero_sharded
from .pipeline import (
    gpipe_apply,
    pipe_mesh,
    pipelined_blocks,
    stack_block_params,
    unstack_block_params,
)
