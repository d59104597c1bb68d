"""CMC / mAP ranking metrics.

Reference analog: ``torchreid/metrics/rank.py`` (per-query numpy loops,
``eval_market1501`` at ``rank.py:103-171``) plus the Cython fast path
(``metrics/rank_cylib/rank_cy.pyx``). Here the roles flip: the default path is
a fully-vectorized masked computation that runs as ONE XLA program on the TPU
(argsort + prefix sums over the gallery axis, batched over queries — no
per-query Python loop), and the numpy implementation is kept as the parity
oracle. A C++ oracle (``ieee_tpu/native/ranking``) plays the Cython role.

Protocol notes (must match the reference bit-for-bit for mAP parity):
 - gallery entries with the query's (pid, camid) are removed per query;
 - queries with no remaining positive are dropped from both CMC and mAP;
 - CMC is computed over the *compressed* kept-gallery ranking;
 - distances are squared euclidean (no sqrt) by default upstream.

Tie-breaking divergence (documented): all sorts here are STABLE (numpy
``kind="stable"``; ``jnp.argsort`` is stable), so exactly-tied distances
rank by gallery index, deterministically, and the numpy oracle and the
device program agree. The reference's default ``np.argsort`` quicksort
gives an arbitrary, platform-dependent tie order — there is no canonical
behavior to match; real-valued distmats tie with probability ~0.
"""

from __future__ import annotations

import warnings
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["evaluate_rank", "eval_market1501_numpy", "eval_market1501_device",
           "eval_regdb"]


# ---------------------------------------------------------------------------
# numpy oracle (reference semantics, loop-free where cheap)
# ---------------------------------------------------------------------------

def eval_market1501_numpy(distmat, q_pids, g_pids, q_camids, g_camids, max_rank):
    """Market1501 protocol: same-(pid, camid) gallery removed per query
    (reference ``rank.py:103-171``)."""
    distmat = np.asarray(distmat)
    q_pids, g_pids = np.asarray(q_pids), np.asarray(g_pids)
    q_camids, g_camids = np.asarray(q_camids), np.asarray(g_camids)
    num_q, num_g = distmat.shape
    if num_g < max_rank:
        max_rank = num_g
        print(f"Note: number of gallery samples is quite small, got {num_g}")

    indices = np.argsort(distmat, axis=1, kind="stable")
    matches = (g_pids[indices] == q_pids[:, np.newaxis]).astype(np.int32)

    all_cmc, all_AP = [], []
    num_valid_q = 0.0
    for q_idx in range(num_q):
        order = indices[q_idx]
        remove = (g_pids[order] == q_pids[q_idx]) & (g_camids[order] == q_camids[q_idx])
        keep = ~remove
        raw_cmc = matches[q_idx][keep]
        if not np.any(raw_cmc):
            continue
        cmc = raw_cmc.cumsum()
        cmc[cmc > 1] = 1
        cmc = cmc[:max_rank]
        if len(cmc) < max_rank:
            # queries keeping fewer than max_rank gallery entries: extend with
            # the final hit state (matches the device path's padded semantics;
            # np.asarray on a ragged list raises on modern numpy)
            cmc = np.concatenate(
                [cmc, np.full(max_rank - len(cmc), cmc[-1], cmc.dtype)]
            )
        all_cmc.append(cmc)
        num_valid_q += 1.0
        num_rel = raw_cmc.sum()
        tmp_cmc = raw_cmc.cumsum() / (np.arange(len(raw_cmc)) + 1.0)
        AP = (tmp_cmc * raw_cmc).sum() / num_rel
        all_AP.append(AP)

    assert num_valid_q > 0, "Error: all query identities do not appear in gallery"
    all_cmc = np.asarray(all_cmc, dtype=np.float32).sum(0) / num_valid_q
    return all_cmc, float(np.mean(all_AP))


def eval_regdb(distmat, q_pids, g_pids, q_timeids=None, g_timeids=None,
               max_rank: int = 20):
    """RegDB protocol (reference ``rank.py:175-230``): visible<->thermal
    cross-modal eval. The reference hardwires q_camid=1 / g_camid=2, so the
    same-(pid, camid) removal never fires — equivalently, market1501 eval
    with no camera filtering. ``q_timeids``/``g_timeids`` are accepted and
    ignored, as the reference does."""
    num_q, num_g = np.asarray(distmat).shape
    q_camids = np.ones(num_q, np.int32)
    g_camids = 2 * np.ones(num_g, np.int32)
    return eval_market1501_numpy(
        distmat, q_pids, g_pids, q_camids, g_camids, max_rank
    )


def eval_cuhk03_numpy(
    distmat, q_pids, g_pids, q_camids, g_camids, max_rank, num_repeats=10, rng=None
):
    """CUHK03 protocol: single-gallery-shot, averaged over ``num_repeats``
    random samplings (reference ``rank.py:24-100``; this rebuild drops the
    fork's extra timeid mask whose call site was broken, ``rank.py:236-243``)."""
    distmat = np.asarray(distmat)
    q_pids, g_pids = np.asarray(q_pids), np.asarray(g_pids)
    q_camids, g_camids = np.asarray(q_camids), np.asarray(g_camids)
    rng = np.random.default_rng(rng)
    num_q, num_g = distmat.shape
    if num_g < max_rank:
        max_rank = num_g
        print(f"Note: number of gallery samples is quite small, got {num_g}")

    indices = np.argsort(distmat, axis=1, kind="stable")
    matches = (g_pids[indices] == q_pids[:, np.newaxis]).astype(np.int32)

    all_cmc, all_AP = [], []
    num_valid_q = 0.0
    for q_idx in range(num_q):
        order = indices[q_idx]
        remove = (g_pids[order] == q_pids[q_idx]) & (g_camids[order] == q_camids[q_idx])
        keep = ~remove
        raw_cmc = matches[q_idx][keep]
        if not np.any(raw_cmc):
            continue
        kept_g_pids = g_pids[order][keep]
        g_pids_dict = defaultdict(list)
        for idx, pid in enumerate(kept_g_pids):
            g_pids_dict[pid].append(idx)
        cmc = np.zeros(max_rank, dtype=np.float64)
        for _ in range(num_repeats):
            mask = np.zeros(len(raw_cmc), dtype=bool)
            for _, idxs in g_pids_dict.items():
                mask[rng.choice(idxs)] = True
            masked = raw_cmc[mask]
            _cmc = masked.cumsum()
            _cmc[_cmc > 1] = 1
            pad = np.zeros(max_rank, dtype=np.float64)
            upto = min(max_rank, len(_cmc))
            pad[:upto] = _cmc[:upto]
            if upto < max_rank and upto > 0:
                pad[upto:] = _cmc[upto - 1]
            cmc += pad
        all_cmc.append(cmc / num_repeats)
        num_rel = raw_cmc.sum()
        tmp_cmc = raw_cmc.cumsum() / (np.arange(len(raw_cmc)) + 1.0)
        all_AP.append((tmp_cmc * raw_cmc).sum() / num_rel)
        num_valid_q += 1.0

    assert num_valid_q > 0, "Error: all query identities do not appear in gallery"
    all_cmc = np.asarray(all_cmc, dtype=np.float32).sum(0) / num_valid_q
    return all_cmc, float(np.mean(all_AP))


# ---------------------------------------------------------------------------
# device fast path — one XLA program, no per-query host loop
# ---------------------------------------------------------------------------

def _device_rank_impl(distmat, q_pids, g_pids, q_camids, g_camids, max_rank: int):
    num_q, num_g = distmat.shape
    order = jnp.argsort(distmat, axis=1, stable=True)  # (Q, G)
    g_pid_sorted = jnp.take(g_pids, order)  # (Q, G)
    g_cam_sorted = jnp.take(g_camids, order)

    match = (g_pid_sorted == q_pids[:, None]).astype(jnp.float32)
    remove = (g_pid_sorted == q_pids[:, None]) & (g_cam_sorted == q_camids[:, None])
    keep = (~remove).astype(jnp.float32)

    kept_match = keep * match
    # compressed position of each kept entry = inclusive prefix count of keeps
    pos = jnp.cumsum(keep, axis=1)  # 1-indexed among kept
    cum_match = jnp.cumsum(kept_match, axis=1)

    num_rel = jnp.sum(kept_match, axis=1)  # positives per query
    valid = num_rel > 0

    # AP: sum over kept matches of precision-at-that-compressed-rank
    prec = jnp.where(pos > 0, cum_match / jnp.maximum(pos, 1.0), 0.0)
    AP = jnp.sum(prec * kept_match, axis=1) / jnp.maximum(num_rel, 1.0)

    # CMC: rank (0-indexed, compressed) of the first kept match
    first_pos = jnp.min(
        jnp.where(kept_match > 0, pos - 1.0, jnp.inf), axis=1
    )  # (Q,)
    ranks = jnp.arange(max_rank, dtype=jnp.float32)  # (R,)
    cmc_per_q = (first_pos[:, None] <= ranks[None, :]).astype(jnp.float32)

    num_valid = jnp.sum(valid.astype(jnp.float32))
    all_cmc = jnp.sum(cmc_per_q * valid[:, None], axis=0) / jnp.maximum(num_valid, 1.0)
    mAP = jnp.sum(AP * valid) / jnp.maximum(num_valid, 1.0)
    return all_cmc, mAP, num_valid


_device_rank = jax.jit(_device_rank_impl, static_argnums=(5,))


def eval_market1501_device(distmat, q_pids, g_pids, q_camids, g_camids, max_rank):
    """Vectorized market1501 CMC/mAP on device. Exactly matches the numpy
    oracle (tested) but runs as a single compiled program."""
    distmat = jnp.asarray(distmat)
    num_g = distmat.shape[1]
    max_rank = min(int(max_rank), num_g)
    cmc, mAP, num_valid = _device_rank(
        distmat,
        jnp.asarray(q_pids),
        jnp.asarray(g_pids),
        jnp.asarray(q_camids),
        jnp.asarray(g_camids),
        max_rank,
    )
    nv = float(num_valid)
    assert nv > 0, "Error: all query identities do not appear in gallery"
    return np.asarray(cmc), float(mAP)


def evaluate_rank(
    distmat,
    q_pids,
    g_pids,
    q_camids,
    g_camids,
    max_rank=50,
    use_metric_cuhk03=False,
    use_cython=False,  # API parity; the device path replaces Cython
    use_device=True,
):
    """Evaluate CMC and mAP (reference ``rank.py:246-287`` dispatch)."""
    if use_metric_cuhk03:
        return eval_cuhk03_numpy(distmat, q_pids, g_pids, q_camids, g_camids, max_rank)
    if use_cython:
        try:
            from ieee_tpu.native.ranking import eval_market1501_native

            return eval_market1501_native(
                distmat, q_pids, g_pids, q_camids, g_camids, max_rank
            )
        except (ImportError, OSError) as e:
            warnings.warn(f"native ranking unavailable ({e}); using device path")
    if use_device:
        return eval_market1501_device(
            distmat, q_pids, g_pids, q_camids, g_camids, max_rank
        )
    return eval_market1501_numpy(distmat, q_pids, g_pids, q_camids, g_camids, max_rank)
