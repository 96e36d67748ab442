from .mesh import (
    MeshConfig,
    batch_sharding,
    host_local_mesh,
    make_mesh,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "MeshConfig",
    "batch_sharding",
    "host_local_mesh",
    "make_mesh",
    "replicated_sharding",
    "shard_batch",
]
