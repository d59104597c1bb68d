"""Speed/consistency harness for the CMC/mAP implementations.

Reference analog: ``torchreid/metrics/rank_cylib/test_cython.py`` — compares
the Cython fast path vs python on synthetic data. Here the contenders are:
numpy oracle, native C++ (ctypes), and the vectorized on-device (XLA) path.

Usage: python tools/rank_speed_test.py [--num-q 500 --num-g 5000]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import timeit

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-q", type=int, default=500)
    parser.add_argument("--num-g", type=int, default=5000)
    parser.add_argument("--max-rank", type=int, default=50)
    parser.add_argument("--repeat", type=int, default=3)
    args = parser.parse_args()

    from ieee_tpu.native.ranking import eval_market1501_native
    from ieee_tpu.ops.ranking import (
        eval_market1501_device,
        eval_market1501_numpy,
    )

    rng = np.random.default_rng(0)
    distmat = rng.random((args.num_q, args.num_g)).astype(np.float32)
    q_pids = rng.integers(0, 100, args.num_q)
    g_pids = rng.integers(0, 100, args.num_g)
    q_camids = rng.integers(0, 5, args.num_q)
    g_camids = rng.integers(0, 5, args.num_g)
    prob = (distmat, q_pids, g_pids, q_camids, g_camids)

    print(f"problem: {args.num_q} x {args.num_g}, max_rank {args.max_rank}\n")

    results = {}
    for name, fn in (
        ("numpy", eval_market1501_numpy),
        ("native C++", eval_market1501_native),
        ("device (XLA)", eval_market1501_device),
    ):
        fn(*prob, args.max_rank)  # warmup / compile
        t = timeit.timeit(lambda: fn(*prob, args.max_rank),
                          number=args.repeat) / args.repeat
        cmc, mAP = fn(*prob, args.max_rank)
        results[name] = (t, cmc, mAP)
        print(f"{name:>12}: {t * 1000:8.1f} ms   mAP {mAP:.4f}  "
              f"R1 {cmc[0]:.4f}")

    base = results["numpy"][0]
    print()
    for name, (t, _, _) in results.items():
        print(f"{name:>12}: {base / t:6.1f}x vs numpy")

    # consistency
    ref = results["numpy"]
    for name, (_, cmc, mAP) in results.items():
        np.testing.assert_allclose(cmc, ref[1], atol=1e-4)
        assert abs(mAP - ref[2]) < 1e-4, name
    print("\nall implementations agree")


if __name__ == "__main__":
    main()
