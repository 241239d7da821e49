from .mesh import (
    make_mesh,
    batch_sharding,
    memory_sharding,
    replicated,
    shard_train_step,
    shard_eval_step,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "memory_sharding",
    "replicated",
    "shard_train_step",
    "shard_eval_step",
]
