"""Host decode-throughput benchmark: measures loader batches/sec at each
worker count and compares against a target train-step rate (SURVEY §7
requirement: decode throughput >= train step rate, i.e. the input pipeline
never starves the chip).

Usage:
    python tools/loader_bench.py [--root DIR --sources rgbnt201] \
        [--batch 128] [--step-rate 7.3]

Without --root it uses the synthetic multimodal dataset (array generation
stands in for jpeg decode; on the real datasets PIL decode dominates and
scales with --workers since PIL releases the GIL).
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="")
    ap.add_argument("--sources", default="synthetic_mm")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--step-rate", type=float, default=None,
                    help="train steps/sec to compare against "
                         "(e.g. 7.3 for the v5e IEEE step at batch 128)")
    args = ap.parse_args()

    from ieee_tpu.data import ImageDataManager

    results = {}
    for workers, cache in ((0, False), (1, False), (2, False), (4, False),
                           (0, True), (2, True)):
        dm = ImageDataManager(
            root=args.root, sources=args.sources, height=args.height,
            width=args.width, batch_size_train=args.batch,
            batch_size_test=args.batch, workers=workers,
            train_sampler="RandomIdentitySampler", num_instances=4,
            num_pids=171, imgs_per_pid=8, verbose=False, seed=0,
            decode_cache=cache,
        )
        if cache:
            # pre-fill pass: the cache decodes through on first touch;
            # steady-state (epoch >= 2) is what training sees
            for _ in dm.train_loader:
                pass
        it = iter(dm.train_loader)
        next(it)  # warm (thread pool spin-up, caches)
        t0 = time.perf_counter()
        n = 0
        for _ in range(args.batches - 1):
            b = next(it, None)
            if b is None:
                break
            n += 1
        dt = time.perf_counter() - t0
        rate = n / dt if dt > 0 else float("inf")
        tag = f"workers={workers}" + (" +cache" if cache else "")
        results[tag] = rate
        print(f"{tag}: {rate:.2f} batches/s "
              f"({rate * args.batch:.0f} imgs-or-triplets/s)")

    if args.step_rate is not None:
        best = max(results.values())
        ok = best >= args.step_rate
        print(f"decode {best:.2f} batches/s vs step rate "
              f"{args.step_rate:.2f}/s -> {'OK' if ok else 'STARVED'}")
        raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
