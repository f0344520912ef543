"""Device mesh + sharding helpers.

The reference's only distribution mechanism is DDP data parallelism over
NCCL (SURVEY.md §2d). TPU-native equivalent: a 1-D `data` mesh over ICI
(multi-slice adds a DCN axis), params replicated, batch sharded, gradient
averaging as a jit-internal pmean — no DDP object, no explicit collectives
in user code (XLA inserts them from shardings).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if len(axis_names) == 1:
        return Mesh(np.asarray(devs), axis_names)
    raise NotImplementedError("only a 1-D data mesh is needed (DP-only ref)")


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree, mesh: Mesh):
    s = replicated_sharding(mesh)
    return jax.device_put(tree, s)


def shard_batch(tree, mesh: Mesh):
    """Put every array in the tree with its leading axis sharded on 'data'."""
    s = batch_sharding(mesh)
    return jax.device_put(tree, s)
