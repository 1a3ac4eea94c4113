from .batch import BatchEngine, make_batch_mesh, shard_batch

__all__ = ["BatchEngine", "make_batch_mesh", "shard_batch"]
