from .mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_params,
    shard_params_fsdp,
    fsdp_spec,
    is_host0,
)
from .pipeline import gpipe_apply
