"""Tiled Pallas kernel for the query-gallery squared-euclidean distmat.

TPU-native replacement for the reference's host-side torch ``addmm_``
(``torchreid/metrics/distance.py:60-64``): each (TILE_Q, TILE_G) output block is
computed by one grid step — the q.g^T contraction runs on the MXU and the
||q||^2 / ||g||^2 rank-1 correction fuses into the same VMEM-resident epilogue,
so the distmat never round-trips through HBM in float32 pieces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Q = 256
TILE_G = 256
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# The kernel keeps the whole feature dim resident per block: VMEM holds
# (TILE_Q + TILE_G) * K_padded elements double-buffered, so K is bounded to
# keep within the 16 MB budget (reID features are <= 2304-d; larger K falls
# back to the fused XLA expression rather than risking a VMEM OOM)
MAX_K = 4096


def pallas_supported(shape1, shape2) -> bool:
    """Use the Pallas path on TPU for non-trivial problem sizes; tiny shapes,
    very wide features (> MAX_K), and CPU test meshes fall back to the fused
    XLA expression."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    m, k = shape1
    n, _ = shape2
    return m * n >= 512 * 512 and _LANE <= k <= MAX_K


def _distmat_kernel(q_ref, g_ref, out_ref):
    q = q_ref[:]  # (TILE_Q, K)
    g = g_ref[:]  # (TILE_G, K)
    prod = jax.lax.dot_general(
        q,
        g,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    qn = jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True)  # (TILE_Q, 1)
    gn = jnp.sum(g.astype(jnp.float32) ** 2, axis=1, keepdims=True)  # (TILE_G, 1)
    out_ref[:] = qn + gn.T - 2.0 * prod


@functools.partial(jax.jit, static_argnames=())
def euclidean_sq_pallas(q: jax.Array, g: jax.Array) -> jax.Array:
    """(m, k), (n, k) -> (m, n) squared euclidean distances, fp32."""
    m, k = q.shape
    n, _ = g.shape
    mp = _round_up(m, TILE_Q)
    np_ = _round_up(n, TILE_G)
    kp = _round_up(k, _LANE)
    qp = jnp.zeros((mp, kp), q.dtype).at[:m, :k].set(q)
    gp = jnp.zeros((np_, kp), g.dtype).at[:n, :k].set(g)

    grid = (mp // TILE_Q, np_ // TILE_G)
    out = pl.pallas_call(
        _distmat_kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_Q, kp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_G, kp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TILE_Q, TILE_G), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp + 3 * mp * np_,
            bytes_accessed=(mp * kp + np_ * kp) * q.dtype.itemsize + mp * np_ * 4,
            transcendentals=0,
        ),
    )(qp, gp)
    return out[:m, :n]
