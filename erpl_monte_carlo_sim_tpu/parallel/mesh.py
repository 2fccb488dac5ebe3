"""Device-mesh construction and batch sharding helpers.

The reference's entire distributed layer is a single-host
``ProcessPoolExecutor`` moving pickled scenes (`monte_carlo.py:63-141`). The
TPU-native replacement: put the Monte Carlo batch axis on a
``jax.sharding.Mesh`` and let XLA insert ICI collectives. There is exactly
one parallelism in this problem — data parallelism over Monte Carlo lanes
(SURVEY.md §2) — so the mesh is 1-D and every batched leaf is sharded along
it; scene tables stay replicated.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "pad_to_devices", "BATCH_AXIS"]

BATCH_AXIS = "batch"


def make_mesh(devices: Optional[Sequence] = None, n_devices: Optional[int] = None,
              axis_name: str = BATCH_AXIS) -> Mesh:
    """1-D mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.array(devices), (axis_name,))


def pad_to_devices(n: int, mesh: Mesh, axis_name: str = BATCH_AXIS) -> int:
    """Smallest multiple of the mesh axis size >= n (lane padding)."""
    size = mesh.shape[axis_name]
    return ((n + size - 1) // size) * size


def shard_batch(tree, mesh: Mesh, batch_size: int, axis_name: str = BATCH_AXIS):
    """Place leaves with a leading ``batch_size`` axis on the mesh (sharded
    along it); everything else is replicated."""
    sharded = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    def put(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == batch_size:
            return jax.device_put(x, sharded)
        return jax.device_put(x, repl)

    return jax.tree.map(put, tree)


def replicate(tree, mesh: Mesh):
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), repl), tree)
