"""BW probe with ~1 GB per-iteration work so the ~2 ms scan-step overhead
is negligible. Also re-times the BN-stats shape with a 16x batch to
overhead-correct the earlier per-op numbers."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def timed_scalar(fn, *args):
    float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


def main():
    N = 8
    # 1 GB f32
    x = jax.random.normal(jax.random.PRNGKey(0), (16384, 16384), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(1), (16384, 16384), jnp.float32)
    nbytes = x.size * 4

    def add2(x, y):
        def f(c, _):
            return c + y, None
        c, _ = jax.lax.scan(f, x, None, length=N)
        return jnp.sum(c)

    dt = timed_scalar(jax.jit(add2), x, y) / N
    print(f"add2 f32 1GB: {dt*1e3:.2f} ms/iter -> {3*nbytes/dt/1e9:.0f} GB/s (2R+1W)")

    xb = x.astype(jnp.bfloat16)
    yb = y.astype(jnp.bfloat16)

    def add2b(x, y):
        def f(c, _):
            return c + y, None
        c, _ = jax.lax.scan(f, x, None, length=N)
        return jnp.sum(c.astype(jnp.float32))

    dt = timed_scalar(jax.jit(add2b), xb, yb) / N
    print(f"add2 bf16 512MB: {dt*1e3:.2f} ms/iter -> "
          f"{3*x.size*2/dt/1e9:.0f} GB/s (2R+1W)")

    # BN-stats + normalize shape at 16x batch: bf16[2048,16,8,2048] (1 GB)
    z = jax.random.normal(jax.random.PRNGKey(2), (2048, 16, 8, 2048),
                          jnp.bfloat16)

    def bn(z):
        def f(c, _):
            xf = c.astype(jnp.float32)
            m = jnp.mean(xf, axis=(0, 1, 2))
            v = jnp.mean(xf * xf, axis=(0, 1, 2)) - m * m
            inv = jax.lax.rsqrt(v + 1e-5)
            return ((c.astype(jnp.float32) - m) * inv).astype(c.dtype), None
        c, _ = jax.lax.scan(f, z, None, length=N)
        return jnp.sum(c.astype(jnp.float32))

    nb = z.size * 2
    dt = timed_scalar(jax.jit(bn), z) / N
    print(f"bn stats+normalize bf16 1GB map: {dt*1e3:.2f} ms/iter -> "
          f"{3*nb/dt/1e9:.0f} GB/s apparent (2R+1W min)")


if __name__ == "__main__":
    main()
