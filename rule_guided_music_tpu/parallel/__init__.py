from .mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    dit_param_spec,
    shard_params,
)
