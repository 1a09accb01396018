"""Device-mesh construction and sharding rules."""

from .mesh import (
    make_mesh,
    data_sharding,
    replicated,
    shard_batch,
    replicate_params,
    all_gather_host,
)
