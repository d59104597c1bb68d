"""Measure achievable MXU FLOPs, HBM bandwidth, and BN-shaped reduction
throughput on the attached TPU — the empirical roofline that perf work
calibrates against. Each probe runs N iterations inside ONE jitted scan so
the ~2ms per-dispatch tunnel cost is amortized away.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=1):
    float(fn(*args))  # compile + sync (scalar pull: tunnel-safe)
    t0 = time.perf_counter()
    float(fn(*args))
    return (time.perf_counter() - t0) / iters


def scan_op(body, x, n):
    def f(c, _):
        return body(c), None

    def run(x):
        y, _ = jax.lax.scan(f, x, None, length=n)
        return jnp.sum(y.astype(jnp.float32))  # scalar output only

    return jax.jit(run)


def main():
    print("devices:", jax.devices())
    N = 20

    # --- MXU: bf16 matmul 8192^3 ---------------------------------------
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (8192, 8192), jnp.bfloat16)

    def mm(c):
        return jnp.dot(c, a, preferred_element_type=jnp.bfloat16)

    dt = timed(scan_op(mm, a, N), a, iters=N)
    fl = 2 * 8192**3
    print(f"matmul bf16 8192^3: {dt*1e3:.2f} ms/iter -> {fl/dt/1e12:.1f} TFLOP/s")

    # --- HBM BW: elementwise on 128 MB bf16 -----------------------------
    x = jax.random.normal(k, (8192, 8192), jnp.bfloat16)

    def ew(c):
        return c * 1.0001 + 0.5

    dt = timed(scan_op(ew, x, N), x, iters=N)
    by = 2 * x.size * 2  # read + write
    print(f"elementwise 128MB bf16: {dt*1e3:.2f} ms/iter -> {by/dt/1e9:.0f} GB/s")

    # --- BN-shaped stat reduce: (B,H,W,C) -> (C,) mean+meansq -----------
    y0 = jax.random.normal(k, (128, 16, 8, 2048), jnp.bfloat16)

    def bnstats(c):
        xf = c.astype(jnp.float32)
        m = jnp.mean(xf, axis=(0, 1, 2))
        v = jnp.mean(xf * xf, axis=(0, 1, 2))
        return (c + m.astype(c.dtype) * 1e-6 + v.astype(c.dtype) * 1e-6)

    dt = timed(scan_op(bnstats, y0, N), y0, iters=N)
    by = 2 * y0.size * 2  # read for stats + write of c'
    print(f"bn stats+write [128,16,8,2048]: {dt*1e3:.3f} ms/iter -> "
          f"{by/dt/1e9:.0f} GB/s effective")

    # same but channel-last larger spatial (layer1 shape)
    y1 = jax.random.normal(k, (128, 64, 32, 256), jnp.bfloat16)
    dt = timed(scan_op(bnstats, y1, N), y1, iters=N)
    by = 2 * y1.size * 2
    print(f"bn stats+write [128,64,32,256]: {dt*1e3:.3f} ms/iter -> "
          f"{by/dt/1e9:.0f} GB/s effective")

    # --- conv probe: 3x3 256->256 on 64x32 (layer2-ish, bf16) -----------
    w = jax.random.normal(k, (3, 3, 256, 256), jnp.bfloat16)
    xc = jax.random.normal(k, (128, 64, 32, 256), jnp.bfloat16)

    def conv(c):
        return jax.lax.conv_general_dilated(
            c, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )

    dt = timed(scan_op(conv, xc, N), xc, iters=N)
    fl = 2 * 128 * 64 * 32 * 256 * 256 * 9
    print(f"conv3x3 [128,64,32,256]: {dt*1e3:.3f} ms/iter -> "
          f"{fl/dt/1e12:.1f} TFLOP/s")

    # --- 1x1 conv 2048->512 on 16x8 (layer4 pointwise) ------------------
    w2 = jax.random.normal(k, (1, 1, 2048, 512), jnp.bfloat16)
    x2 = jax.random.normal(k, (128, 16, 8, 2048), jnp.bfloat16)

    def conv2(c):
        y = jax.lax.conv_general_dilated(
            c, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )
        return jnp.concatenate([y, y, y, y], axis=-1)

    dt = timed(scan_op(conv2, x2, N), x2, iters=N)
    fl = 2 * 128 * 16 * 8 * 2048 * 512
    print(f"conv1x1 2048->512 [128,16,8]: {dt*1e3:.3f} ms/iter -> "
          f"{fl/dt/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
