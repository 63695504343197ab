from .infer import make_dp_segmenter, segment_cohort
from .mesh import (batch_sharding, create_mesh, local_device_count,
                   mesh_from_config, replicated, shard_batch)

__all__ = ["batch_sharding", "create_mesh", "local_device_count",
           "make_dp_segmenter", "mesh_from_config", "replicated",
           "segment_cohort", "shard_batch"]
