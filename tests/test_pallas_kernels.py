"""Pallas kernel parity tests (interpret mode on the CPU test mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ieee_tpu.ops.pallas.distmat import euclidean_sq_pallas
from ieee_tpu.ops.pallas.partpool import fold_bn, fused_partpool_project


def test_distmat_pallas_interpret_matches_numpy():
    # force the kernel path in interpret mode via direct call
    rng = np.random.default_rng(0)
    a = rng.standard_normal((64, 32)).astype(np.float32)
    b = rng.standard_normal((96, 32)).astype(np.float32)
    import ieee_tpu.ops.pallas.distmat as dm

    out = np.asarray(_interpret_distmat(dm, a, b))
    want = ((a[:, None] - b[None]) ** 2).sum(-1)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def _interpret_distmat(dm, a, b):
    # rebuild the pallas_call with interpret=True on CPU
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = a.shape
    n, _ = b.shape
    mp = ((m + dm.TILE_Q - 1) // dm.TILE_Q) * dm.TILE_Q
    np_ = ((n + dm.TILE_G - 1) // dm.TILE_G) * dm.TILE_G
    kp = ((k + 127) // 128) * 128
    qp = jnp.zeros((mp, kp), a.dtype).at[:m, :k].set(a)
    gp = jnp.zeros((np_, kp), b.dtype).at[:n, :k].set(b)
    out = pl.pallas_call(
        dm._distmat_kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(mp // dm.TILE_Q, np_ // dm.TILE_G),
            in_specs=[
                pl.BlockSpec((dm.TILE_Q, kp), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((dm.TILE_G, kp), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((dm.TILE_Q, dm.TILE_G),
                                   lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=True,
    )(qp, gp)
    return out[:m, :n]


def test_fused_partpool_matches_xla_chain():
    B, H, W, C, F, P = 4, 16, 8, 256, 128, 6
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (C, F)) * 0.02
    scale = jnp.abs(jax.random.normal(jax.random.fold_in(key, 2), (F,))) + 0.5
    bias = jax.random.normal(jax.random.fold_in(key, 3), (F,)) * 0.1
    mean = jax.random.normal(jax.random.fold_in(key, 4), (F,)) * 0.1
    var = jnp.abs(jax.random.normal(jax.random.fold_in(key, 5), (F,))) + 0.5
    s, t = fold_bn(scale, bias, mean, var)

    out = np.asarray(fused_partpool_project(x, w, s, t, parts=P, tile_b=4))
    assert out.shape == (B, P + 1, F)

    xf = np.asarray(x, np.float64)
    gp = xf.mean(axis=(1, 2))
    stripes = [
        xf[:, (p * H) // P: -(-((p + 1) * H) // P), :, :].mean(axis=(1, 2))
        for p in range(P)
    ]
    pooled = np.stack([gp] + stripes, axis=1)
    # kernel computes the projection in bf16 — compare at bf16 tolerance
    proj = pooled @ np.asarray(w, np.float64)
    want = np.maximum(proj * np.asarray(s) + np.asarray(t), 0.0)
    np.testing.assert_allclose(out, want, rtol=2e-2, atol=2e-2)
    # relu zeros must agree exactly
    assert ((out == 0) == (want < 1e-6)).mean() > 0.95


def test_fused_partpool_adaptive_tile_at_eval_shape():
    """Regression for the real-chip scoped-VMEM OOM: at the fused-eval
    shape (B=104 f32 maps of 16x8x2048 -> 768) the default tile_b=8 blocks
    double-buffer past the 16 MiB scoped-VMEM stack; tile_b=None must pick
    a smaller tile and still match the tile_b-agnostic math."""
    B, H, W, C, F, P = 104, 16, 8, 2048, 768, 6
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (B, H, W, C), jnp.float32) * 0.1
    w = jax.random.normal(jax.random.fold_in(key, 1), (C, F)) * 0.01
    s = jnp.ones((F,), jnp.float32)
    t = jnp.zeros((F,), jnp.float32)

    auto = np.asarray(fused_partpool_project(x, w, s, t, parts=P))
    assert auto.shape == (B, P + 1, F)
    # the adaptive tile must fit the budget: 2 * tile * H*W*C * 4 + C*F*2
    budget = 12 * 1024 * 1024
    for tile in (8, 4, 2, 1):
        if 2 * tile * H * W * C * 4 + C * F * 2 <= budget:
            break
    small = np.asarray(fused_partpool_project(x[:8], w, s, t, parts=P,
                                              tile_b=tile))
    np.testing.assert_allclose(auto[:8], small, rtol=1e-5, atol=1e-5)


def test_fused_partpool_stream_bf16_opt_out():
    """stream_bf16=False keeps an f32 input in f32 inside the kernel: the
    pooling stage is then exact and the result matches the f64 oracle at
    pure projection-bf16 tolerance, tighter than the streamed variant."""
    B, H, W, C, F, P = 4, 16, 8, 256, 128, 6
    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (B, H, W, C), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (C, F)) * 0.02
    s = jnp.ones((F,), jnp.float32)
    t = jnp.zeros((F,), jnp.float32)

    exact = np.asarray(fused_partpool_project(x, w, s, t, parts=P, tile_b=2,
                                              stream_bf16=False))
    xf = np.asarray(x, np.float64)
    gp = xf.mean(axis=(1, 2))
    stripes = [
        xf[:, (p * H) // P: -(-((p + 1) * H) // P), :, :].mean(axis=(1, 2))
        for p in range(P)
    ]
    pooled = np.stack([gp] + stripes, axis=1)
    want = np.maximum(pooled @ np.asarray(w, np.float64), 0.0)
    np.testing.assert_allclose(exact, want, rtol=8e-3, atol=8e-3)
    # and the streamed path is reproducibly different (bf16-pooled input)
    streamed = np.asarray(fused_partpool_project(x, w, s, t, parts=P,
                                                 tile_b=2))
    assert not np.allclose(exact, streamed, rtol=0, atol=1e-7)
