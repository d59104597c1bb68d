"""Compile-only probe of the block-backward megakernel on the REAL backend.

The r04 chip measurement (`tools/exp_variants.py megakernel 128`) produced no
output with stderr discarded — interpret-mode tests pass, so the failure is
almost certainly Mosaic lowering / VMEM at real stage shapes. This probes
each of the four pallas_call wrappers AND the full bottleneck VJP per
ResNet-50 stage shape (IEEE trunk, batch per modality 128, 256x128 input,
last_stride=1) using AOT lower().compile() — no data movement, no execution
— and prints the first error per case.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/megakernel_probe.py [batch]
"""

from __future__ import annotations

import sys
import traceback

import jax
import jax.numpy as jnp

from ieee_tpu.ops.pallas import block_bwd as bb


# (tag, h, w, cm=width, c=c_out); stride-1 no-downsample blocks only
STAGES = [
    ("layer1", 64, 32, 64, 256),
    ("layer2", 32, 16, 128, 512),
    ("layer3", 16, 8, 256, 1024),
    ("layer4", 16, 8, 512, 2048),
]


def probe(tag, fn, *shapes_dtypes):
    args = [jax.ShapeDtypeStruct(s, d) for s, d in shapes_dtypes]
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"  {tag}: OK", flush=True)
        return True
    except Exception as e:  # noqa: BLE001 — we want every failure class
        lines = str(e).split("\n")
        msg = lines[0][:300]
        # the remote-compile tunnel wraps Mosaic errors in an opaque HTTP
        # 500 — surface any diagnostic lines buried deeper in the message
        keys = ("mosaic", "comparison", "vmem", "exceeds", "mlir",
                "unsupported", "not support", "alloc")
        extra = [ln.strip()[:300] for ln in lines[1:]
                 if any(k in ln.lower() for k in keys)][:4]
        print(f"  {tag}: FAIL {type(e).__name__}: {msg}", flush=True)
        for ln in extra:
            print(f"      | {ln}", flush=True)
        return False


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    bf, f32 = jnp.bfloat16, jnp.float32
    print(f"devices: {jax.devices()}  batch={b}", flush=True)
    for name, h, w, cm, c in STAGES:
        print(f"[{name}] b={b} h={h} w={w} cm={cm} c={c}", flush=True)
        x4c = ((b, h, w, c), bf)
        x4m = ((b, h, w, cm), bf)
        vec_c = ((8, c), f32)
        vec_m = ((8, cm), f32)
        probe("reduce3 ", lambda dy, y, a3, mu, rstd: bb._reduce3(
            dy, y, a3, mu, rstd), x4c, x4c, x4c, ((c,), f32), ((c,), f32))
        probe("bn3_apply", lambda d3, a3, a2, w3, v3, v2: bb._bn3_apply(
            d3, a3, a2, w3, v3, v2),
            x4c, x4c, x4m, ((cm, c), f32), (vec_c[0], f32), (vec_m[0], f32))
        probe("conv2_bwd", lambda d2, a2, a1, w2, v2, v1: bb._conv2_bwd(
            d2, a2, a1, w2, v2, v1),
            x4m, x4m, x4m, ((3, 3, cm, cm), f32), (vec_m[0], f32),
            (vec_m[0], f32))
        probe("bn1_apply", lambda d1, a1, x, d3, w1, v1: bb._bn1_apply(
            d1, a1, x, d3, w1, v1),
            x4m, x4m, x4c, x4c, ((c, cm), f32), (vec_m[0], f32))

        def full_vjp(x, k1, s1, b1, k2, s2, b2, k3, s3, b3):
            (y, stats), pull = jax.vjp(
                bb.bottleneck_train, x, k1, s1, b1, k2, s2, b2, k3, s3, b3)
            zs = tuple(jnp.zeros_like(s) for s in stats)
            return pull((jnp.ones_like(y), zs))

        probe("full vjp ", full_vjp,
              x4c, ((1, 1, c, cm), f32), ((cm,), f32), ((cm,), f32),
              ((3, 3, cm, cm), f32), ((cm,), f32), ((cm,), f32),
              ((1, 1, cm, c), f32), ((c,), f32), ((c,), f32))


if __name__ == "__main__":
    main()
