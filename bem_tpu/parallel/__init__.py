from .mesh import make_mesh, shard_batch, replicate
from .spatial import spatial_apply, spatial_sharding

__all__ = ["make_mesh", "shard_batch", "replicate", "spatial_apply",
           "spatial_sharding"]
