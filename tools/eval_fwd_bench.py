"""Eval-forward benchmark on the real chip: plain flax apply vs the fused
folded-BN + Pallas part-pool path (``models/fast_eval.py``, opt-in
cfg.tpu.fused_eval) vs the w8a8 PTQ path (``models/int8_eval.py``, opt-in
cfg.tpu.int8_eval; int8 MXU).

Usage: python tools/eval_fwd_bench.py [batch]
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 100

    from ieee_tpu.data.transforms import build_transforms
    from ieee_tpu.models import build_model
    from ieee_tpu.models.fast_eval import build_fast_ieee_eval_step
    from ieee_tpu.models.int8_eval import build_int8_ieee_eval_step

    model = build_model("ieee3modalPart", num_classes=171, loss="margin",
                        pretrained=False)
    variables = model.init_variables(jax.random.PRNGKey(0), batch=2,
                                     height=256, width=128)
    params, stats = variables["params"], variables["batch_stats"]
    _, tfm_te = build_transforms(256, 128, transforms=None, verbose=False)

    rng = np.random.default_rng(0)
    imgs = tuple(
        jax.device_put(rng.integers(0, 256, (batch, 256, 128, 3),
                                    dtype=np.uint8))
        for _ in range(3)
    )

    fused = build_fast_ieee_eval_step(model, transform=tfm_te)
    int8 = build_int8_ieee_eval_step(model, transform=tfm_te)

    @jax.jit
    def plain(params, stats, imgs):
        x = tuple(tfm_te(m) for m in imgs)
        return model.module.apply({"params": params, "batch_stats": stats},
                                  x, train=False)

    for name, fn in (("plain flax", plain), ("fused", fused),
                     ("int8 PTQ", int8)):
        f = fn(params, stats, imgs)
        float(f[0, 0])  # compile + sync
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            f = fn(params, stats, imgs)
        float(f[0, 0])
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt*1e3:.1f} ms/batch ({batch/dt:.0f} triplets/s)",
              flush=True)
        ref = np.asarray(f, np.float32)
    # parity of the paths on the same weights
    a = np.asarray(plain(params, stats, imgs), np.float32)
    b = np.asarray(fused(params, stats, imgs), np.float32)
    err = np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-6)
    print(f"max rel deviation fused vs plain: {err:.4f}")
    q = np.asarray(int8(params, stats, imgs), np.float32)
    cos = (a * q).sum(-1) / np.maximum(
        np.linalg.norm(a, axis=-1) * np.linalg.norm(q, axis=-1), 1e-12)
    print(f"int8 vs plain feature cosine: min {cos.min():.4f} "
          f"mean {cos.mean():.4f}")


if __name__ == "__main__":
    main()
