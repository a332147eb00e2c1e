from .distributed import (
    fetch,
    initialize,
    is_main_process,
    is_multiprocess,
    put_local_shards,
    put_replicated,
    sync,
)
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
    "initialize",
    "is_multiprocess",
    "is_main_process",
    "put_replicated",
    "put_local_shards",
    "fetch",
    "sync",
]
