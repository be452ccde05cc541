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


def local_batch_size(mesh: Optional[Mesh], per_device_batch: int) -> int:
    """Per-HOST batch for the input pipeline.

    Loaders/``shard_batch`` treat their batch as process-local: in a
    multi-host mesh ``make_array_from_process_local_data`` assembles the
    global batch as per-host x process_count, so each host must feed
    ``per_device_batch x len(local devices)`` — NOT x mesh.size, which would
    inflate the per-device batch process_count-fold.
    """
    if mesh is None:
        return per_device_batch
    return per_device_batch * mesh.local_mesh.size


def local_rows(global_array) -> np.ndarray:
    """This process's rows of a batch-sharded global array, in feed order.

    Mirrors ``shard_batch``'s placement: with the mesh built from
    ``jax.devices()`` a process's local devices are contiguous and in-order,
    so sorting addressable shards by global start offset recovers exactly the
    rows this host fed in. Safe under ``np.asarray`` where the global array
    itself is not fully addressable.
    """
    shards = sorted(
        global_array.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def process_allgather_tree(tree: Any) -> Any:
    """All-gather host-local numpy data across processes (concat on axis 0).

    Identity on single-host. Used by validate_3d so every host holds the
    full prediction set before ``dataset.evaluate`` (whose
    ``len(preds) == gt_num`` assert otherwise fails on P>1 hosts).
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(tree, tiled=False)
    # process_allgather stacks a new leading process axis; flatten it into
    # the batch axis.
    return jax.tree.map(
        lambda x: np.asarray(x).reshape((-1,) + np.asarray(x).shape[2:]), gathered
    )
