"""Eval-pipeline benchmark: query-gallery distmat + CMC/mAP wall-clock.

North-star metric (BASELINE.json): the reference computes the distmat with
host torch ``addmm_`` and ranks with per-query numpy loops (or the Cython
path, ">10x" — ``rank.py:274-276``); here both run on-device as one compiled
program each (tiled Pallas distmat + vectorized ranking).

Usage: python tools/eval_bench.py [--num-q 3368 --num-g 15913 --dim 2304]
(defaults = Market1501 scale with the IEEE 2304-d feature)
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-q", type=int, default=3368)
    parser.add_argument("--num-g", type=int, default=15913)
    parser.add_argument("--dim", type=int, default=2304)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from ieee_tpu.ops import compute_distance_matrix
    from ieee_tpu.ops.ranking import _device_rank, eval_market1501_numpy

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    qf = jax.device_put(jax.random.normal(key, (args.num_q, args.dim),
                                          jnp.float32))
    gf = jax.device_put(jax.random.normal(jax.random.fold_in(key, 1),
                                          (args.num_g, args.dim), jnp.float32))
    q_pids = jnp.asarray(rng.integers(0, 750, args.num_q))
    g_pids = jnp.asarray(rng.integers(0, 750, args.num_g))
    q_cams = jnp.asarray(rng.integers(0, 6, args.num_q))
    g_cams = jnp.asarray(rng.integers(0, 6, args.num_g))

    def run_once():
        distmat = compute_distance_matrix(qf, gf, "euclidean")
        cmc, mAP, nv = _device_rank(distmat, q_pids, g_pids, q_cams, g_cams,
                                    50)
        return float(mAP), np.asarray(cmc)

    mAP, cmc = run_once()  # compile
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        mAP, cmc = run_once()
    dt = (time.perf_counter() - t0) / n
    print(f"device distmat+CMC/mAP ({args.num_q}x{args.num_g}, "
          f"{args.dim}-d): {dt * 1000:.1f} ms   mAP={mAP:.4f} R1={cmc[0]:.4f}")

    # host oracle comparison at reduced scale (the full numpy loop at Market
    # scale takes minutes)
    small_q = min(args.num_q, 500)
    dm_small = np.asarray(
        compute_distance_matrix(qf[:small_q], gf, "euclidean"))
    t0 = time.perf_counter()
    eval_market1501_numpy(dm_small, np.asarray(q_pids[:small_q]),
                          np.asarray(g_pids), np.asarray(q_cams[:small_q]),
                          np.asarray(g_cams), 50)
    t_np = time.perf_counter() - t0
    est_full = t_np * args.num_q / small_q
    print(f"numpy oracle (rank only, {small_q} queries): {t_np * 1000:.1f} ms"
          f" -> estimated full-scale {est_full:.1f} s")
    print(f"device speedup vs numpy ranking: ~{est_full / dt:.0f}x")


if __name__ == "__main__":
    main()
