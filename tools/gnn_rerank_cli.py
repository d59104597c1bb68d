"""Standalone GNN re-ranking CLI over pickled features.

Reference analog: ``torchreid/utils/GPU-Re-Ranking/main.py:52-68`` — loads a
pickle of {query feature, gallery feature, pids...}, runs GNN re-ranking,
and scores CMC/mAP.

Usage:
    python tools/gnn_rerank_cli.py --data features.pkl [--k1 26 --k2 7]

The pickle must contain a dict with keys: 'query_f' (Nq, D), 'gallery_f'
(Ng, D), 'query_pid', 'gallery_pid', 'query_cam', 'gallery_cam'.
"""

from __future__ import annotations

import argparse
import os.path as osp
import pickle
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, required=True,
                        help="path to pickled features")
    parser.add_argument("--k1", type=int, default=26)
    parser.add_argument("--k2", type=int, default=7)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (a JAX_PLATFORMS=cpu "
                             "env var is overridden by the container's "
                             "sitecustomize; this flag flips the config "
                             "before backends initialize)")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ieee_tpu.ops.gnn_rerank import gnn_reranking
    from ieee_tpu.ops.ranking import eval_market1501_device

    with open(args.data, "rb") as f:
        data = pickle.load(f)

    qf = np.asarray(data["query_f"], np.float32)
    gf = np.asarray(data["gallery_f"], np.float32)
    qf /= np.maximum(np.linalg.norm(qf, axis=1, keepdims=True), 1e-12)
    gf /= np.maximum(np.linalg.norm(gf, axis=1, keepdims=True), 1e-12)

    t0 = time.perf_counter()
    L = gnn_reranking(qf, gf, k1=args.k1, k2=args.k2)
    dt = time.perf_counter() - t0
    print(f"GNN re-ranking: {dt * 1000:.1f} ms for "
          f"{qf.shape[0]}x{gf.shape[0]}")

    # score the re-ranked order: distance = rank position
    distmat = np.empty_like(L, dtype=np.float32)
    rows = np.arange(L.shape[0])[:, None]
    distmat[rows, L] = np.arange(L.shape[1], dtype=np.float32)[None, :]
    cmc, mAP = eval_market1501_device(
        distmat, data["query_pid"], data["gallery_pid"],
        data["query_cam"], data["gallery_cam"], max_rank=20,
    )
    print(f"mAP: {mAP:.1%}  Rank-1: {cmc[0]:.1%}  Rank-5: {cmc[4]:.1%}")


if __name__ == "__main__":
    main()
