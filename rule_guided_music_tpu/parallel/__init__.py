from .mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    dit_param_spec,
    shard_params,
)
from .pipeline import (
    gpipe_apply,
    pipelined_dit_rotary_apply,
    stack_block_params,
    unstack_block_params,
)
