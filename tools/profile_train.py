"""Profile the IEEE train step on the real TPU and print an xprof-style
per-op summary (via ieee_tpu.utils.xplane — no TF dependency).

Usage: python tools/profile_train.py [batch] [--trace-dir DIR] [--top N]

Prints wall-clock steps/s first (same protocol as bench.py), then the
aggregated device-op table for a 3-step trace.
"""

from __future__ import annotations

import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("batch", nargs="?", type=int, default=128)
    ap.add_argument("--trace-dir", default="/tmp/ieee_trace")
    ap.add_argument("--top", type=int, default=60)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--option", action="append", default=[],
                    help="XLA compiler option as flag=value (repeatable); "
                         "default = bench.py's measured winner")
    args = ap.parse_args()
    options = (dict(s.split("=", 1) for s in args.option) if args.option
               else {"xla_tpu_scoped_vmem_limit_kib": "32768"})

    import jax

    from ieee_tpu.engine import Image3MEngine
    from ieee_tpu.models import build_model
    from ieee_tpu.optim import build_lr_scheduler, build_optimizer
    from ieee_tpu.data import ImageDataManager

    batch = args.batch
    num_pids = 171
    dm = ImageDataManager(
        sources="synthetic_mm", height=256, width=128,
        batch_size_train=batch, batch_size_test=100, workers=0,
        train_sampler="RandomIdentitySampler", num_instances=4,
        num_pids=num_pids, imgs_per_pid=8, verbose=False, seed=0,
    )
    model = build_model("ieee3modalPart", num_classes=num_pids, loss="margin",
                        pretrained=False)
    tx = build_optimizer(optim="sgd", lr=0.001, momentum=0.9, weight_decay=5e-4)
    sched = build_lr_scheduler("multi_step", stepsize=[20, 40], base_lr=0.001)
    eng = Image3MEngine(dm, model, optimizer=tx, scheduler=sched, margin=1.0,
                        seed=0)
    eng.max_epoch = 1

    data = next(iter(dm.train_loader))
    imgs, pids = eng._put_batch(data)
    step_fn = eng._build_train_step(compiler_options=options)
    key = jax.random.PRNGKey(0)

    print("compiling ...", flush=True)
    for i in range(3):
        eng.state, m = step_fn(eng.state, imgs, pids,
                               jax.random.fold_in(key, i), 0.001, None)
        float(m["loss"])
    print("compiled; timing ...", flush=True)

    t0 = time.perf_counter()
    for i in range(args.steps):
        eng.state, m = step_fn(eng.state, imgs, pids,
                               jax.random.fold_in(key, 100 + i), 0.001, None)
    float(m["loss"])
    dt = time.perf_counter() - t0
    print(f"steady state: {args.steps / dt:.3f} steps/s, "
          f"{args.steps * batch / dt:.1f} triplets/s, "
          f"{dt / args.steps * 1e3:.1f} ms/step", flush=True)

    with jax.profiler.trace(args.trace_dir):
        for i in range(3):
            eng.state, m = step_fn(eng.state, imgs, pids,
                                   jax.random.fold_in(key, 200 + i), 0.001,
                                   None)
        float(m["loss"])

    from ieee_tpu.utils.xplane import op_summary

    rows = op_summary(args.trace_dir)
    total = sum(r["total_ms"] for r in rows)
    print(f"\ndevice op total over trace: {total:.1f} ms "
          f"({total / 3:.1f} ms/step)")
    print(f"{'op':<72} {'total_ms':>9} {'count':>6} {'avg_us':>9}")
    for r in rows[: args.top]:
        print(f"{r['name'][:72]:<72} {r['total_ms']:>9.2f} "
              f"{r['count']:>6} {r['avg_us']:>9.1f}")


if __name__ == "__main__":
    main()
