from .mesh import (
    make_mesh,
    batch_sharding,
    replicate_sharding,
    shard_batch,
    replicate,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicate_sharding",
    "shard_batch",
    "replicate",
]
