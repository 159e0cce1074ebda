from .sharding import make_mesh, shard_batch, ShardedPipeline

__all__ = ["make_mesh", "shard_batch", "ShardedPipeline"]
