"""Device-mesh parallelism utilities.

The reference's only distribution strategy is single-node DataParallel
(PL ``accelerator='dp'``, gin/train/train_newt.gin:13). Here the
equivalent is first-class: a ``jax.sharding.Mesh`` over all visible
TPU devices, batches sharded on the ``data`` axis, parameters
replicated, and gradient/metric reduction riding ICI collectives that
GSPMD inserts under jit. A ``model`` axis is reserved for generality
(the 267k-param model never needs tensor parallelism, but the mesh API
shouldn't change if a bigger model family lands).
"""
from .mesh import (
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    local_batch_size,
)
from .time_shard import make_time_sharded_renderer

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "local_batch_size",
    "make_time_sharded_renderer",
]
