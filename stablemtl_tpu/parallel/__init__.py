from .mesh import (
    MeshConfig,
    batch_sharding,
    host_local_mesh,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from .tensor_parallel import (
    tp_param_shardings,
    tp_param_specs,
    tp_spec,
)

__all__ = [
    "MeshConfig",
    "batch_sharding",
    "host_local_mesh",
    "make_mesh",
    "replicated_sharding",
    "shard_batch",
    "tp_param_shardings",
    "tp_param_specs",
    "tp_spec",
]
