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
