"""Device mesh + sharding utilities — the framework's "communication backend".

The reference's distributed layer is torch DDP over NCCL (SURVEY.md §2.5);
here every collective is emitted by XLA under jit over a
``jax.sharding.Mesh``: gradient all-reduce and cross-replica BN statistics
fall out of batch-sharded means automatically (GSPMD), eval gather is an
``all_gather`` on the data axis. This module is the one home for mesh
construction and sharding specs so future multi-slice / model-parallel axes
have a single place to land.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(axis_names=("data",), shape=None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None or all(s == -1 for s in shape):
        shape = [n] + [1] * (len(axis_names) - 1)
    else:
        shape = [n // abs(int(np.prod([s for s in shape if s != -1])))
                 if s == -1 else s for s in shape]
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the batch axis sharded on 'data'."""
    ds = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, ds), batch)


def replicate(mesh: Mesh, tree):
    rs = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rs), tree)
