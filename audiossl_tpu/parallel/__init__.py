from audiossl_tpu.parallel.mesh import (
    data_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    replicate_tree,
    global_batch_size,
)

__all__ = [
    "data_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate_tree",
    "global_batch_size",
]
