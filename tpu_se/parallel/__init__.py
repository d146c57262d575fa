from tpu_se.parallel.mesh import (
    MeshConfig, make_mesh, batch_sharding, replicated_sharding,
    shard_train_args, param_shardings,
)
from tpu_se.parallel.distributed import initialize_distributed

__all__ = [
    "MeshConfig", "make_mesh", "batch_sharding", "replicated_sharding",
    "shard_train_args", "param_shardings", "initialize_distributed",
]
