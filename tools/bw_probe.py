"""Pin down the chip's real HBM bandwidth ceiling across access patterns:
dtype, donation, pallas streaming copy, reduction-only. Calibrates whether
~138 GB/s (first probe) is the machine's true ceiling or an XLA artifact.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed_scalar(fn, *args):
    float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


def main():
    print("devices:", jax.devices())
    N = 20
    M = 8192

    k = jax.random.PRNGKey(0)

    for dtype, name in [(jnp.bfloat16, "bf16"), (jnp.float32, "f32")]:
        x = jax.random.normal(k, (M, M), dtype)
        nbytes = x.size * x.dtype.itemsize

        # reduction only: one read pass
        def red(x):
            def f(c, _):
                return c + 1e-6, jnp.sum(c.astype(jnp.float32))
            c, sums = jax.lax.scan(f, x, None, length=N)
            return jnp.sum(sums) + jnp.sum(c.astype(jnp.float32))

        dt = timed_scalar(jax.jit(red), x) / N
        print(f"reduce-1pass {name} ({nbytes>>20} MB): {dt*1e3:.2f} ms "
              f"-> {2*nbytes/dt/1e9:.0f} GB/s (R+W carry)")

        # pure elementwise add of two arrays
        y = jax.random.normal(jax.random.fold_in(k, 1), (M, M), dtype)

        def add2(x, y):
            def f(c, _):
                return c + y, None
            c, _ = jax.lax.scan(f, x, None, length=N)
            return jnp.sum(c.astype(jnp.float32))

        dt = timed_scalar(jax.jit(add2), x, y) / N
        print(f"add2 {name}: {dt*1e3:.2f} ms -> {3*nbytes/dt/1e9:.0f} GB/s "
              f"(2R+1W)")

    # pallas streaming scale kernel, bf16
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = jax.random.normal(k, (M, M), jnp.bfloat16)

    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:] * jnp.bfloat16(1.0001)

    def pallas_scale(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(M // 512,),
            in_specs=[pl.BlockSpec((512, M), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((512, M), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(x)

    def pl_loop(x):
        def f(c, _):
            return pallas_scale(c), None
        c, _ = jax.lax.scan(f, x, None, length=N)
        return jnp.sum(c.astype(jnp.float32))

    nbytes = x.size * 2
    dt = timed_scalar(jax.jit(pl_loop), x) / N
    print(f"pallas scale bf16: {dt*1e3:.2f} ms -> {2*nbytes/dt/1e9:.0f} GB/s "
          f"(1R+1W)")

    # bigger block pallas
    def pallas_scale_b(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(M // 2048,),
            in_specs=[pl.BlockSpec((2048, M), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((2048, M), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(x)

    def pl_loop_b(x):
        def f(c, _):
            return pallas_scale_b(c), None
        c, _ = jax.lax.scan(f, x, None, length=N)
        return jnp.sum(c.astype(jnp.float32))

    dt = timed_scalar(jax.jit(pl_loop_b), x) / N
    print(f"pallas scale bf16 (2048 blk, 32MB VMEM... may spill): "
          f"{dt*1e3:.2f} ms -> {2*nbytes/dt/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
