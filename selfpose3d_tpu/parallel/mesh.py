"""Device mesh + sharding helpers.

The reference's only parallelism is single-process DataParallel over 2 GPUs
(ref: tools/train_3d.py:140). The TPU-native equivalent is SPMD data
parallelism over ICI: one jit-compiled program, batch sharded over the 'data'
mesh axis, parameters replicated, gradient reduction compiled in by XLA.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device-put every array leaf with its leading dim sharded over ``axis``.

    Scalars / 0-d leaves are replicated. In a multi-host mesh
    (``jax.distributed.initialize`` + ``sp3d-train --distributed``) each
    process passes only its own stripe of the global batch (the loader
    already stripes by ``jax.process_index``, data/loader.py) and the
    leaves are assembled into global arrays.
    """
    bs = batch_sharding(mesh, axis)
    rep = replicated(mesh)
    multihost = jax.process_count() > 1

    def put(x):
        import jax.numpy as jnp

        x = jnp.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, rep)
        if multihost:
            return jax.make_array_from_process_local_data(bs, np.asarray(x))
        return jax.device_put(x, bs)

    return jax.tree.map(put, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)
