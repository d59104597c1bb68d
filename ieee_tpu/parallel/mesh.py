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
    "tp_shardings",
    "zero_shardings",
    "shard_tree",
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


def tp_shardings(mesh: Mesh, tree, axis: str = "model", min_size: int = 512):
    """Column-parallel tensor-parallel sharding rules for a param/state tree.

    The reference has no tensor parallelism (its one strategy is
    nn.DataParallel); this is TPU-native extra capability: on a 2-D
    ``(data, model)`` mesh, wide layers are sharded over the ``model`` axis
    and XLA/GSPMD inserts the collectives. The rule is purely structural —
    any leaf whose LAST dim is >= ``min_size`` and divisible by the axis
    size shards that dim (conv kernels [kh,kw,cin,cout] -> cout; Dense
    [f,c] -> c; the matching BN/bias [c] vectors shard consistently);
    everything else (small heads, odd class counts, scalars, optimizer
    hyperparams) stays replicated. Correctness never depends on the rule:
    GSPMD reshards as needed; the rule only decides what is distributed.
    """
    n = mesh.shape.get(axis, 1)

    def rule(x):
        shape = tuple(getattr(x, "shape", ()))
        if (
            n > 1
            and len(shape) >= 1
            and shape[-1] >= min_size
            and shape[-1] % n == 0
        ):
            spec = P(*([None] * (len(shape) - 1) + [axis]))
            return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, tree)


def zero_shardings(mesh: Mesh, tree, axis: str = "data",
                   min_elems: int = 4096):
    """ZeRO-1-style sharding rules for an optimizer-state tree.

    The reference replicates optimizer state per GPU (torch semantics under
    nn.DataParallel); on a TPU mesh the moments (2x the params for
    adam-family) can instead shard over the ``data`` axis — each chip owns
    1/N of every moment, GSPMD partitions the elementwise optimizer update
    across chips, and the applied param update is all-gathered over ICI.
    Params themselves stay replicated (ZeRO stage 1, not 2/3).

    Rule (structural, like ``tp_shardings``): a leaf with >= ``min_elems``
    elements shards its LAST dimension divisible by the axis size (conv
    kernels [kh,kw,cin,cout] -> cout; Dense [f,c] -> c; BN vectors [c] ->
    c); scalars, step counters, and small leaves stay replicated.
    Correctness never depends on the rule — GSPMD reshards as needed; the
    rule only decides what is distributed.
    """
    n = mesh.shape.get(axis, 1)

    def rule(x):
        shape = tuple(getattr(x, "shape", ()))
        if n > 1 and shape and int(np.prod(shape)) >= min_elems:
            for d in range(len(shape) - 1, -1, -1):
                if shape[d] % n == 0 and shape[d] >= n:
                    spec = [None] * len(shape)
                    spec[d] = axis
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, tree)


def shard_tree(mesh: Mesh, tree, shardings):
    """device_put a pytree leaf-by-leaf onto matching shardings."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), tree, shardings
    )
