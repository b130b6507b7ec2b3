"""Device mesh + sharding helpers.

The reference has no distributed backend (SURVEY §2.8) — its parallelism
is thread pools + batched GPU inference. The TPU-native equivalent:
data-parallel sharding of crop/tile batches over a 1-D (or 2-D) device
mesh via jax.sharding; collectives (psum for gradients) ride ICI and are
inserted by XLA from the shardings.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names=("data",)) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if len(axis_names) == 1:
        return Mesh(np.array(devices), axis_names)
    # 2-D mesh: split as square as possible (data x model)
    n = len(devices)
    a = int(np.floor(np.sqrt(n)))
    while n % a:
        a -= 1
    return Mesh(np.array(devices).reshape(a, n // a), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host array batch-sharded on the mesh (pads to a multiple
    of the axis size if needed; returns (array, real_n))."""
    import jax.numpy as jnp

    n = batch.shape[0]
    size = mesh.shape[axis]
    pad = (-n) % size
    if pad:
        batch = np.concatenate(
            [batch, np.zeros((pad, *batch.shape[1:]), batch.dtype)])
    arr = jax.device_put(batch, batch_sharding(mesh, axis))
    return arr, n


def shard_params(mesh: Mesh, tree):
    """Replicate a parameter tree across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
