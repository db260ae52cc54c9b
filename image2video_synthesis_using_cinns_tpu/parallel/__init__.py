from .mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_parallel_sharding,
)
from .spatial import spatial_sharding, constrain_spatial

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_parallel_sharding",
    "spatial_sharding",
    "constrain_spatial",
]
