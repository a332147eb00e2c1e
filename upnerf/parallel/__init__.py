from .mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "make_mesh",
    "replicated_sharding",
    "shard_batch",
]
