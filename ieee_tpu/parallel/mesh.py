"""Device mesh + sharding helpers — the distributed layer.

Reference analog: the reference's ONE parallelism strategy is single-process
``nn.DataParallel`` (``scripts/mainMultiModal.py:219-220``; SURVEY §2.8).
TPU-native replacement: one jitted SPMD program with the batch sharded over a
1-D ``data`` mesh axis. XLA emits the gradient all-reduce over ICI (and DCN
across hosts) automatically — there is no NCCL/MPI analog to port.

The mesh is built once and threaded through the engine; params/opt_state are
replicated, batches are sharded on axis 0. A second ``model`` axis slot is
reserved for tensor-parallel experiments (unused by the reference workloads,
which are ResNet-50-scale).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicate_sharding",
    "shard_batch",
    "replicate",
]


def make_mesh(
    mesh_shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a device mesh. Default: all local devices on one ``data`` axis."""
    if devices is None:
        devices = jax.devices()
    if not mesh_shape:
        mesh_shape = [len(devices)]
    mesh_shape = list(mesh_shape)
    if len(mesh_shape) != len(axis_names):
        raise ValueError(
            f"mesh_shape {mesh_shape} and axis_names {axis_names} differ in rank"
        )
    n = int(np.prod(mesh_shape))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, only {len(devices)} available")
    dev_array = np.asarray(devices[:n]).reshape(mesh_shape)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard axis 0 over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """device_put a (pytree of) host array(s) with axis-0 sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """device_put a pytree fully replicated over the mesh."""
    sh = replicate_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
