from .mesh import (batch_sharding, create_mesh, local_device_count,
                   mesh_from_config, replicated, shard_batch)

__all__ = ["batch_sharding", "create_mesh", "local_device_count",
           "mesh_from_config", "replicated", "shard_batch"]
