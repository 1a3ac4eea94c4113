from .batch import BatchEngine, BatchError, make_batch_mesh, shard_batch

__all__ = ["BatchEngine", "BatchError", "make_batch_mesh", "shard_batch"]
