"""Mesh construction and sharding helpers.

Replaces the reference's PL DataParallel layer (SURVEY.md §2c): batch
sharded over a 1-D (or 2-D data x model) mesh; all collectives are
implicit — GSPMD inserts ``psum`` for gradient/loss reduction over ICI.
"""
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    n_devices: Optional[int] = None,
    model_parallelism: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh over the visible devices.

    With ``model_parallelism=1`` (always, for the 267k-param NEWT) this
    degenerates to pure data parallelism, but the two-axis shape keeps
    the sharding annotations stable if a model axis is ever used.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallelism == 0, (n, model_parallelism)
    grid = np.asarray(devices).reshape(n // model_parallelism, model_parallelism)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n_data = mesh.shape[DATA_AXIS]
    assert global_batch % n_data == 0, (
        f"global batch {global_batch} not divisible by data-parallel "
        f"degree {n_data}"
    )
    return global_batch // n_data


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Place a host batch dict onto the mesh, sharded on the batch axis."""
    n_data = mesh.shape[DATA_AXIS]
    leaves = jax.tree_util.tree_leaves(batch)
    if leaves and leaves[0].shape[0] % n_data != 0:
        raise ValueError(
            f"batch size {leaves[0].shape[0]} is not divisible by the "
            f"data-parallel degree {n_data}; adjust batch_size or build a "
            f"smaller mesh with create_mesh(n_devices=...)"
        )
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
