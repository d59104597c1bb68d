"""Probe whether XLA:TPU lowers int8 dots/convs to the MXU's double-rate
int8 path on this chip/libtpu — the go/no-go measurement for a quantized
(PTQ) inference fast path.

v5e peak is ~394 TOPS int8 vs ~197 TFLOP/s bf16; if s8 x s8 -> s32 ops
measure ~2x the bf16 rate at model shapes, an int8 serving path is worth
building. If they measure AT or BELOW bf16, XLA is converting to a wider
type internally and the path is dead on this stack.

Same measurement hygiene as tools/roofline_probe.py: N iterations inside
one jitted lax.scan (single dispatch; the axon tunnel costs ~2-3 ms/call).
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
        return jnp.sum(y.astype(jnp.float32))

    return jax.jit(run)


def _requant8(y32):
    """int32 accumulator -> int8, as a real quantized pipeline would."""
    return jnp.clip(y32 >> 12, -127, 127).astype(jnp.int8)


def main():
    print("devices:", jax.devices())
    N = 20
    k = jax.random.PRNGKey(0)

    # --- dot: (16384, 2048) x (2048, 2048) — the model's flattened 1x1 ----
    M, K, C = 16384, 2048, 2048
    fl = 2 * M * K * C

    wb = jax.random.normal(k, (K, C), jnp.bfloat16)
    xb = jax.random.normal(k, (M, K), jnp.bfloat16)

    def dot_bf16(c):
        return jnp.dot(c, wb, preferred_element_type=jnp.bfloat16)

    dt = timed(scan_op(dot_bf16, xb, N), xb, iters=N)
    print(f"dot bf16 ({M},{K})x({K},{C}): {dt*1e3:.3f} ms/iter -> "
          f"{fl/dt/1e12:.1f} TFLOP/s")

    w8 = np.random.default_rng(0).integers(-127, 128, (K, C), dtype=np.int8)
    x8 = np.random.default_rng(1).integers(-127, 128, (M, K), dtype=np.int8)
    w8, x8 = jnp.asarray(w8), jnp.asarray(x8)

    def dot_int8(c):
        y = jax.lax.dot_general(
            c, w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return _requant8(y)

    dt = timed(scan_op(dot_int8, x8, N), x8, iters=N)
    print(f"dot int8 ({M},{K})x({K},{C}): {dt*1e3:.3f} ms/iter -> "
          f"{fl/dt/1e12:.1f} TOP/s")

    # mixed precision serving style: int8 weights, bf16 activations
    def dot_w8abf16(c):
        y = jnp.dot(c, w8.astype(jnp.bfloat16),
                    preferred_element_type=jnp.bfloat16)
        return y

    dt = timed(scan_op(dot_w8abf16, xb, N), xb, iters=N)
    print(f"dot bf16 x dequant-int8-w: {dt*1e3:.3f} ms/iter -> "
          f"{fl/dt/1e12:.1f} TFLOP/s")

    # --- conv 3x3 512->512 on 32x16 (stage-3 shape) -----------------------
    B, H, W, Cc = 128, 32, 16, 512
    flc = 2 * B * H * W * Cc * Cc * 9

    wcb = jax.random.normal(k, (3, 3, Cc, Cc), jnp.bfloat16)
    xcb = jax.random.normal(k, (B, H, W, Cc), jnp.bfloat16)

    def conv_bf16(c):
        return jax.lax.conv_general_dilated(
            c, wcb, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    dt = timed(scan_op(conv_bf16, xcb, N), xcb, iters=N)
    print(f"conv3x3 bf16 [{B},{H},{W},{Cc}]: {dt*1e3:.3f} ms/iter -> "
          f"{flc/dt/1e12:.1f} TFLOP/s")

    wc8 = jnp.asarray(np.random.default_rng(2).integers(
        -127, 128, (3, 3, Cc, Cc), dtype=np.int8))
    xc8 = jnp.asarray(np.random.default_rng(3).integers(
        -127, 128, (B, H, W, Cc), dtype=np.int8))

    def conv_int8(c):
        y = jax.lax.conv_general_dilated(
            c, wc8, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return _requant8(y)

    try:
        dt = timed(scan_op(conv_int8, xc8, N), xc8, iters=N)
        print(f"conv3x3 int8 [{B},{H},{W},{Cc}]: {dt*1e3:.3f} ms/iter -> "
              f"{flc/dt/1e12:.1f} TOP/s")
    except Exception as e:  # unsupported lowering is a valid probe result
        print(f"conv3x3 int8: FAILED to lower/run: {type(e).__name__}: "
              f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
