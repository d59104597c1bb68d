"""k-reciprocal re-ranking (Zhong et al., CVPR 2017) — on-device.

Exactly the protocol of ``torchreid/utils/rerank.py:31-113`` (and of our
numpy port ``ops/rerank.py``, which is bit-matched to the reference),
re-expressed as static-shape masked matrix algebra so the whole re-rank
runs as one XLA program on the TPU:

 - per-probe k-reciprocal neighbor SETS become boolean mask matrices:
   ``R = F & F.T`` with F the top-(k1+1) membership mask;
 - the candidate-expansion loop ("add Rh(j) when it overlaps R(i) by
   > 2/3") becomes two mask matmuls on the MXU: overlap counts
   ``R @ Rh.T`` (bf16 is exact: counts are small integers) and the union
   ``cond @ Rh > 0``;
 - the gaussian membership vectors V and the k2 local-query-expansion are
   dense row ops / a k2-term gather-sum;
 - the Jaccard min-sum becomes a blocked broadcast-min-reduce (an XLA loop
   fusion — the (block, n, n) intermediate is never materialized).

The reference's Python loop takes ~90 s at Market1501 scale on CPU
(``GPU-Re-Ranking/gnn_reranking.py:12-16`` cites 89.2 s); this program is
seconds-class on a v5e. The numpy port stays as the parity oracle and the
small-problem / no-accelerator path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["re_ranking_device"]


def _top_idx(neg_dist, k):
    """Indices of each row's k smallest distances. ``approx_max_k`` with
    recall_target=1.0 is EXACT and uses the tiled TPU top-k algorithm;
    ``lax.top_k`` lowers to a full (n, n) variadic sort on this XLA build
    (the sort overlaps with other work, so wall-clock is ~equal — the
    tiled form is kept as it frees the overlap window)."""
    _, idx = jax.lax.approx_max_k(neg_dist, k, recall_target=1.0)
    return idx


def _topk_mask(neg_dist, k, n):
    """Boolean (n, n) mask of each row's k smallest distances."""
    idx = _top_idx(neg_dist, k)
    rows = jnp.repeat(jnp.arange(n), k)
    return jnp.zeros((n, n), jnp.bool_).at[rows, idx.reshape(-1)].set(True)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _rerank_core(q_g, q_q, g_g, k1: int, k2: int, minsum_bf16: bool = False):
    qn = q_q.shape[0]
    top = jnp.concatenate([q_q, q_g], axis=1)
    bot = jnp.concatenate([q_g.T, g_g], axis=1)
    orig = jnp.concatenate([top, bot], axis=0).astype(jnp.float32)
    n = orig.shape[0]

    # square then column-max normalize then transpose (rerank.py:44-47)
    orig = orig * orig
    D = (orig / jnp.max(orig, axis=0)).T

    neg = -D
    F = _topk_mask(neg, k1 + 1, n)           # forward top-(k1+1), incl self
    R = F & F.T                               # k-reciprocal sets
    kh = int(np.around(k1 / 2.0)) + 1
    Fh = _topk_mask(neg, kh, n)
    Rh = Fh & Fh.T                            # half-k reciprocal sets

    # candidate expansion: for j in R(i), add Rh(j) when
    # |Rh(j) & R(i)| > 2/3 |Rh(j)|  (strict, as the reference)
    Rb = R.astype(jnp.bfloat16)               # 0/1; counts <= k1+1 exact
    Rhb = Rh.astype(jnp.bfloat16)
    inter = jnp.dot(Rb, Rhb.T, preferred_element_type=jnp.float32)
    sizes_h = jnp.sum(Rhb.astype(jnp.float32), axis=1)  # |Rh(j)|
    cond = R & (inter > (2.0 / 3.0) * sizes_h[None, :])
    union = jnp.dot(cond.astype(jnp.bfloat16), Rhb,
                    preferred_element_type=jnp.float32) > 0
    E = R | union

    # gaussian membership vectors, row-normalized over the expanded set
    W = jnp.where(E, jnp.exp(-D), 0.0)
    V = W / jnp.sum(W, axis=1, keepdims=True)

    # local query expansion: mean of V over the k2 nearest rows
    if k2 != 1:
        idx2 = _top_idx(neg, k2)

        def body(j, acc):
            return acc + jnp.take(V, idx2[:, j], axis=0)

        V = jax.lax.fori_loop(0, k2, body, jnp.zeros_like(V)) / k2

    # jaccard over (query, all): minsum[i, g] = sum_k min(V[i,k], V[g,k]);
    # blocked so the broadcast-min-reduce stays a loop fusion.
    # minsum_bf16 (opt-in, cfg.tpu.rerank_bf16): stream V in bf16 during
    # the sweep, ~1e-3 relative error in the jaccard (breaks the 1e-4
    # oracle parity, hence not the default). MEASURED round 3 at Market
    # scale: 1.51 s vs 1.56 s exact — the sweep is latency-not-bandwidth
    # bound at this n, so the win is only ~3% (tools/rerank_bench.py)
    if minsum_bf16:
        V_min = V.astype(jnp.bfloat16)
    else:
        V_min = V
    Vq = V_min[:qn]

    def min_block(vq_block):
        return jnp.sum(jnp.minimum(vq_block[:, None, :], V_min[None, :, :]),
                       axis=-1, dtype=jnp.float32)

    # bigger blocks amortize the full-V read per map iteration
    block = 32
    pad = (-qn) % block
    Vq_p = jnp.pad(Vq, ((0, pad), (0, 0)))
    minsum = jax.lax.map(min_block,
                         Vq_p.reshape(-1, block, V.shape[1]))
    minsum = minsum.reshape(-1, n)[:qn]
    jaccard = 1.0 - minsum / (2.0 - minsum)

    return jaccard, D[:qn]


def re_ranking_device(q_g_dist, q_q_dist, g_g_dist, k1: int = 20,
                      k2: int = 6, lambda_value: float = 0.3,
                      minsum_bf16: bool = False) -> np.ndarray:
    """Drop-in for ``ops.rerank.re_ranking`` computed on the default JAX
    backend. Returns the (num_q, num_g) re-ranked distance matrix.
    ``minsum_bf16`` trades the 1e-4 oracle parity for a faster jaccard
    sweep (see _rerank_core)."""
    qn = np.asarray(q_q_dist).shape[0]
    n = qn + np.asarray(g_g_dist).shape[0]
    if n <= max(k1 + 1, k2):
        # approx_max_k requires k < n; tiny problems go to the numpy
        # oracle (bit-matched to the reference, fast at this scale) —
        # the documented small-problem path.
        from .rerank import re_ranking

        return re_ranking(np.asarray(q_g_dist), np.asarray(q_q_dist),
                          np.asarray(g_g_dist), k1=k1, k2=k2,
                          lambda_value=lambda_value)
    jaccard, Dq = _rerank_core(
        jnp.asarray(q_g_dist, jnp.float32),
        jnp.asarray(q_q_dist, jnp.float32),
        jnp.asarray(g_g_dist, jnp.float32), int(k1), int(k2),
        bool(minsum_bf16),
    )
    final = (np.asarray(jaccard) * (1 - lambda_value)
             + np.asarray(Dq) * lambda_value)
    return final[:, qn:]
