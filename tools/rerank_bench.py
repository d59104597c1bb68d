"""Re-ranking benchmarks at Market1501 scale on the device.

Times (a) the on-device k-reciprocal re-rank (ops/rerank_device.py — the
engine's TPU path for ``test.rerank True``) and (b) the GNN re-rank scores
program (ops/gnn_rerank.py), against the reference's published numbers
(~89.2 s CPU k-reciprocal loop, ``GPU-Re-Ranking/gnn_reranking.py:12-16``).

Usage: python tools/rerank_bench.py [--num-q 3368 --num-g 15913 --dim 512]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-q", type=int, default=3368)
    ap.add_argument("--num-g", type=int, default=15913)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--k1", type=int, default=20)
    ap.add_argument("--k2", type=int, default=6)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax.numpy as jnp

    from ieee_tpu.ops.gnn_rerank import _gnn_rerank_scores
    from ieee_tpu.ops.rerank_device import _rerank_core

    rng = np.random.default_rng(0)
    Q = jnp.asarray(rng.standard_normal((args.num_q, args.dim)), jnp.float32)
    G = jnp.asarray(rng.standard_normal((args.num_g, args.dim)), jnp.float32)

    def sqd(a, b):
        return (jnp.sum(a * a, 1)[:, None] + jnp.sum(b * b, 1)[None, :]
                - 2 * jnp.dot(a, b.T, preferred_element_type=jnp.float32))

    qg, qq, gg = sqd(Q, G), sqd(Q, Q), sqd(G, G)

    for bf16 in (False, True):
        j, _ = _rerank_core(qg, qq, gg, args.k1, args.k2, bf16)
        float(jnp.sum(j))  # compile + sync (scalar pull; see CLAUDE.md)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            j, _ = _rerank_core(qg, qq, gg, args.k1, args.k2, bf16)
        float(jnp.sum(j))
        dt = (time.perf_counter() - t0) / args.reps
        tag = "bf16 minsum" if bf16 else "f32 exact"
        print(f"k-reciprocal device [{tag}] ({args.num_q}x{args.num_g}, "
              f"k1={args.k1} k2={args.k2}): {dt:.2f} s/call "
              f"(reference CPU loop: ~89 s at this scale)")

    Qn = Q / jnp.linalg.norm(Q, axis=1, keepdims=True)
    Gn = G / jnp.linalg.norm(G, axis=1, keepdims=True)
    for track in (False, True):
        s = _gnn_rerank_scores(Qn, Gn, 26, 7, track)
        float(jnp.sum(s))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            s = _gnn_rerank_scores(Qn, Gn, 26, 7, track)
        float(jnp.sum(s))
        dt = (time.perf_counter() - t0) / args.reps
        tag = "transpose-free" if track else "A+A.T"
        print(f"gnn re-rank scores device [{tag}] (k1=26 k2=7): "
              f"{dt * 1e3:.0f} ms/call")


if __name__ == "__main__":
    main()
