"""Validate the fused-matmul-epilogue thesis before building the real kernel:

 1. XLA baseline: y = x @ w; stats = (sum y, sum y^2); z = relu(bn(y))
    (stats + normalize as separate passes over y, as the train step today).
 2. Pallas producer: one kernel computing y tiles on the MXU and accumulating
    the channel stats in VMEM scratch while tiles are resident (y written
    once, stats free).
 3. Pallas consumer: matmul whose INPUT loads apply bn+relu (normalize pass
    fused into the consumer).
 4. dW = x^T dy as plain dot_general (the custom-VJP backward shape).

Shapes: [16384, 2048] x [2048, 2048] — the CIM conv as matmul.
MUST run alone on the host (1 core): concurrent processes poison timings.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, n=10):
    out = fn(*args)
    s = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(s).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    s = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(s).astype(jnp.float32))
    return (time.perf_counter() - t0) / n


N, K, C = 16384, 2048, 2048
TN, TC, TK = 512, 512, 512


def xla_baseline(x, w, scale, bias):
    y = jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
    yf = y.astype(jnp.float32)
    m = jnp.mean(yf, axis=0)
    v = jnp.mean(yf * yf, axis=0) - m * m
    inv = jax.lax.rsqrt(v + 1e-5) * scale
    sh = bias - m * inv
    z = jnp.maximum(y.astype(jnp.float32) * inv + sh, 0.0).astype(jnp.bfloat16)
    return z, m, v


def mm_stats_kernel(x_ref, w_ref, y_ref, st_ref, acc_ref, s_ref):
    j, i, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    ni, nk = pl.num_programs(1), pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when((i == 0) & (k == 0))
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        y = acc_ref[:]
        y_ref[:] = y.astype(jnp.bfloat16)
        s_ref[0:1, :] += jnp.sum(y, axis=0, keepdims=True)
        s_ref[1:2, :] += jnp.sum(y * y, axis=0, keepdims=True)

    @pl.when((i == ni - 1) & (k == nk - 1))
    def _():
        st_ref[:] = s_ref[:]


def pallas_mm_stats(x, w):
    y, st = pl.pallas_call(
        mm_stats_kernel,
        grid=(C // TC, N // TN, K // TK),
        in_specs=[
            pl.BlockSpec((TN, TK), lambda j, i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, TC), lambda j, i, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TN, TC), lambda j, i, k: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TC), lambda j, i, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, C), jnp.bfloat16),
            jax.ShapeDtypeStruct((8, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TN, TC), jnp.float32),
            pltpu.VMEM((8, TC), jnp.float32),
        ],
    )(x, w)
    m = st[0] / N
    v = st[1] / N - m * m
    return y, m, v


def bn_mm_kernel(y_ref, inv_ref, sh_ref, w_ref, o_ref, acc_ref):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a = jnp.maximum(
        y_ref[:].astype(jnp.float32) * inv_ref[0:1, :] + sh_ref[0:1, :], 0.0
    ).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(a, w_ref[:], preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.bfloat16)


def pallas_bn_mm(y, inv, sh, w2):
    inv8 = jnp.broadcast_to(inv.reshape(1, -1), (8, C))
    sh8 = jnp.broadcast_to(sh.reshape(1, -1), (8, C))
    return pl.pallas_call(
        bn_mm_kernel,
        grid=(N // TN, C // TC, C // TK),
        in_specs=[
            pl.BlockSpec((TN, TK), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TK), lambda i, j, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TK), lambda i, j, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, TC), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, TC), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((TN, TC), jnp.float32)],
    )(y, inv8, sh8, w2)


def main():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (N, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(k, 1), (K, C),
                          jnp.bfloat16) * 0.02
    w2 = jax.random.normal(jax.random.fold_in(k, 2), (C, C),
                           jnp.bfloat16) * 0.02
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    fl = 2 * N * K * C

    # pure matmul for reference
    mm = jax.jit(lambda x, w: jnp.dot(x, w,
                                      preferred_element_type=jnp.bfloat16))
    dt = timed(mm, x, w)
    print(f"pure mm: {dt*1e3:.3f} ms ({fl/dt/1e12:.0f} TF/s)")

    base = jax.jit(xla_baseline)
    dt = timed(base, x, w, scale, bias)
    print(f"XLA mm+stats+bnrelu: {dt*1e3:.3f} ms ({fl/dt/1e12:.0f} TF/s eq)")

    pk = jax.jit(pallas_mm_stats)
    dt_p = timed(pk, x, w)
    print(f"pallas mm+stats epilogue: {dt_p*1e3:.3f} ms "
          f"({fl/dt_p/1e12:.0f} TF/s eq)")

    z, m, v = base(x, w, scale, bias)
    y2, m2, v2 = pk(x, w)
    print("mean err:", float(jnp.max(jnp.abs(m - m2))),
          "var err:", float(jnp.max(jnp.abs(v - v2))))

    def xla_cons(y, inv, sh, w2):
        a = jnp.maximum(y.astype(jnp.float32) * inv + sh, 0.0).astype(
            jnp.bfloat16)
        return jnp.dot(a, w2, preferred_element_type=jnp.bfloat16)

    inv = jax.lax.rsqrt(v + 1e-5)
    sh = -m * inv
    dt = timed(jax.jit(xla_cons), y2, inv, sh, w2)
    print(f"XLA bnrelu+mm consumer: {dt*1e3:.3f} ms")
    dt = timed(jax.jit(pallas_bn_mm), y2, inv, sh, w2)
    print(f"pallas fused-affine mm consumer: {dt*1e3:.3f} ms")
    a = np.asarray(xla_cons(y2, inv, sh, w2), np.float32)
    b = np.asarray(pallas_bn_mm(y2, inv, sh, w2), np.float32)
    print("consumer max err:", np.max(np.abs(a - b)))

    dy = jax.random.normal(jax.random.fold_in(k, 3), (N, C), jnp.bfloat16)

    def dw_dot(x, dy):
        return jax.lax.dot_general(
            x, dy, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dt = timed(jax.jit(dw_dot), x, dy)
    print(f"dW x^T@dy dot_general: {dt*1e3:.3f} ms "
          f"({2*N*K*C/dt/1e12:.0f} TF/s)")


if __name__ == "__main__":
    main()
