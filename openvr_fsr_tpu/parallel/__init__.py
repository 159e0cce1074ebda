from .sharding import make_mesh, shard_batch, ShardedPipeline
from .spatial import SpatialFsrPipeline, split_bands

__all__ = ["make_mesh", "shard_batch", "ShardedPipeline",
           "SpatialFsrPipeline", "split_bands"]
