from .mesh import (
    batch_sharding,
    make_mesh,
    mesh_from_cfg,
    param_spec,
    replicated,
    shard_batch,
    shard_variables,
)
