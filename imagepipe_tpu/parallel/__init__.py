from .batch import BatchEngine, BatchError, make_batch_mesh, shard_batch
from .multihost import (MultiHostBatchEngine, global_batch_mesh,
                        partition_files)

__all__ = ["BatchEngine", "BatchError", "make_batch_mesh", "shard_batch",
           "MultiHostBatchEngine", "global_batch_mesh", "partition_files"]
