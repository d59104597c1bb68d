"""Fused part-pooling + projection Pallas kernel (inference path).

North-star kernel (BASELINE.json): the IEEE head's
``global/part avgpool -> 1x1 conv 2048->768 -> BN -> ReLU`` chain
(reference ``ieee3modalPart.py:449-455``) fused into ONE VMEM-resident pass:

    out[b, p, :] = relu( pool_p(x[b]) @ W * s + t )

where pool_0 is the global average and pool_1..P are the P horizontal part
stripes, and (s, t) are the BN running statistics folded into an affine
(inference only — training needs live batch stats and gradients, which the
XLA path handles).

Each grid step owns a tile of the batch: the (H, W, C) block is pooled into
(P+1, C) accumulators in VMEM and hits the MXU once as a
(TILE_B*(P+1), C) x (C, F) matmul — the pooled intermediate never travels
back to HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_partpool_project", "fold_bn"]


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """Fold BN running stats into (s, t): y = x_proj * s + t."""
    inv = scale / jnp.sqrt(var + eps)
    return inv, bias - mean * inv


def _pool_matrix(h: int, w: int, parts: int):
    """(parts+1, H*W) uniform pooling weights: row 0 = global mean, row 1+p =
    adaptive stripe-p mean (torch AdaptiveAvgPool2d buckets
    [floor(p*H/P), ceil((p+1)*H/P)); stripes may overlap when P does not
    divide H)."""
    import numpy as np

    m = np.zeros((parts + 1, h, w), np.float32)
    m[0] = 1.0 / (h * w)
    for p in range(parts):
        h0 = (p * h) // parts
        h1 = -(-((p + 1) * h) // parts)
        m[p + 1, h0:h1, :] = 1.0 / ((h1 - h0) * w)
    return m.reshape(parts + 1, h * w)


def _kernel(x_ref, pool_ref, w_ref, s_ref, t_ref, out_ref, *, parts: int):
    # x: (TILE_B, H*W, C); pool: (parts+1, H*W); out: (TILE_B, parts+1, F)
    tb, hw, c = x_ref.shape
    f = out_ref.shape[-1]
    pool = pool_ref[:]

    # pooling as an MXU matmul per sample: (P+1, HW) @ (HW, C)
    pooled = []
    for b in range(tb):  # static tile loop
        pooled.append(
            jax.lax.dot_general(
                pool, x_ref[b].astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    pooled = jnp.concatenate(pooled, axis=0)  # (TILE_B*(P+1), C)

    proj = jax.lax.dot_general(
        pooled.astype(jnp.bfloat16),
        w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE_B*(parts+1), F)
    y = proj * s_ref[:] + t_ref[:]
    out_ref[:] = jnp.maximum(y, 0.0).reshape(tb, parts + 1, f)


@functools.partial(jax.jit,
                   static_argnames=("parts", "tile_b", "stream_bf16"))
def fused_partpool_project(x, w, s, t, parts: int = 6, tile_b: int = None,
                           stream_bf16: bool = True):
    """x: (B, H, W, C) feature map; w: (C, F); s, t: (F,) folded BN.

    Returns (B, parts+1, F): row 0 = global feature, rows 1..parts = parts.
    ``tile_b=None`` picks the largest batch tile whose double-buffered input
    block + the resident projection weights fit the 16 MB scoped-VMEM stack
    (at f32 256x128-map shapes tile_b=8 allocates 16.04 MB and the compiler
    rejects it — caught by a real-chip eval run). ``stream_bf16=False``
    keeps an f32 input in f32 (exact pooling; smaller adaptive tile).
    """
    b, h, w_dim, c = x.shape
    f = w.shape[1]
    # stream the map in bf16: the kernel pools in f32 regardless, the input
    # is a bf16-computed feature map upstream, and halving the block size
    # keeps tile_b=8 (full MXU tile) inside the scoped-VMEM stack — with
    # f32 blocks the adaptive tile drops to 4 and the kernel loses ~10%
    if stream_bf16 and x.dtype == jnp.float32:
        x = x.astype(jnp.bfloat16)
    if tile_b is None:
        budget = 12 * 1024 * 1024  # leave headroom under the 16 MiB stack
        tile_b = 8
        while tile_b > 1 and (2 * tile_b * h * w_dim * c * x.dtype.itemsize
                              + c * f * 2) > budget:
            tile_b //= 2
    # h < parts is fine: the adaptive buckets [floor(p*h/P), ceil((p+1)*h/P))
    # are always non-empty and may overlap, exactly like AdaptiveAvgPool2d
    pad_b = (-b) % tile_b
    if pad_b:
        x = jnp.concatenate([x, jnp.zeros((pad_b, h, w_dim, c), x.dtype)])
    bp = x.shape[0]
    x2 = x.reshape(bp, h * w_dim, c)
    pool_mat = jnp.asarray(_pool_matrix(h, w_dim, parts))

    out = pl.pallas_call(
        functools.partial(_kernel, parts=parts),
        out_shape=jax.ShapeDtypeStruct((bp, parts + 1, f), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(bp // tile_b,),
            in_specs=[
                pl.BlockSpec((tile_b, h * w_dim, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((parts + 1, h * w_dim), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c, f), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((f,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((f,), lambda i: (0,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_b, parts + 1, f),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * (parts + 1) * c * (f + h * w_dim),
            bytes_accessed=bp * h * w_dim * c * x.dtype.itemsize
            + c * f * 2 + bp * (parts + 1) * f * 4,
            transcendentals=0,
        ),
        # interpret mode lets the CPU test mesh exercise the kernel
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(x2, pool_mat, w.astype(jnp.bfloat16), s.astype(jnp.float32),
      t.astype(jnp.float32))
    return out[:b]
