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


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-process bring-up (the reference's torch.distributed init via
    dist_train.sh/multi_dist_train.sh:6-12 env:// rendezvous). With no args
    jax.distributed.initialize auto-detects cluster env (TPU pods, SLURM —
    the reference's slurm_train.sh path); explicit args cover manual
    launches. Safe to skip for single-process runs."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1-D 'data' mesh (DP — the reference's only parallelism), or a 2-D
    ('dcn', 'data') mesh for multi-process runs: the outer axis spans
    processes/slices over DCN, the inner axis local chips over ICI. With
    DP-only sharding (batch over both axes) XLA keeps gradient psums
    hierarchical: reduce over ICI first, then DCN."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if len(axis_names) == 1:
        return Mesh(np.asarray(devs), axis_names)
    if len(axis_names) == 2:
        nproc = jax.process_count()
        arr = np.asarray(devs)
        assert arr.size % nproc == 0, (arr.size, nproc)
        return Mesh(arr.reshape(nproc, -1), axis_names)
    raise NotImplementedError("ToC3D needs at most (dcn, data) (DP-only ref)")


def dp_spec(mesh: Mesh) -> P:
    """Batch partition spec over every mesh axis (1-D or (dcn, data))."""
    return P(mesh.axis_names if len(mesh.axis_names) > 1
             else mesh.axis_names[0])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over every mesh axis."""
    return NamedSharding(mesh, dp_spec(mesh))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree, mesh: Mesh):
    s = replicated_sharding(mesh)
    return jax.device_put(tree, s)


def shard_batch(tree, mesh: Mesh):
    """Put every array in the tree with its leading axis sharded on 'data'."""
    s = batch_sharding(mesh)
    return jax.device_put(tree, s)
