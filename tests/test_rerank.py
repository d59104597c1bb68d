import numpy as np
import pytest

from ieee_tpu.ops.gnn_rerank import gnn_reranking
from ieee_tpu.ops.rerank import re_ranking


def _clustered_features(num_pids=8, per_pid=6, dim=32, noise=0.15, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((num_pids, dim))
    feats, pids = [], []
    for p in range(num_pids):
        f = centers[p] + noise * rng.standard_normal((per_pid, dim))
        feats.append(f)
        pids.extend([p] * per_pid)
    feats = np.concatenate(feats).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    return feats, np.asarray(pids)


def test_k_reciprocal_rerank_improves_clustered_retrieval():
    feats, pids = _clustered_features()
    q, g = feats[::3], feats[np.arange(len(feats)) % 3 != 0]
    q_pids, g_pids = pids[::3], pids[np.arange(len(pids)) % 3 != 0]

    def sqdist(a, b):
        return ((a[:, None] - b[None]) ** 2).sum(-1)

    d_qg = sqdist(q, g)
    final = re_ranking(d_qg, sqdist(q, q), sqdist(g, g), k1=8, k2=3)
    assert final.shape == d_qg.shape
    # top-1 accuracy should stay perfect on well-separated clusters
    top1 = g_pids[np.argmin(final, axis=1)]
    assert (top1 == q_pids).mean() >= 0.9


def test_gnn_rerank_returns_valid_ranking():
    feats, pids = _clustered_features(num_pids=6, per_pid=5)
    mask = np.arange(len(feats)) % 3 == 0
    q, g = feats[mask], feats[~mask]
    q_pids, g_pids = pids[mask], pids[~mask]
    L = gnn_reranking(q, g, k1=8, k2=3)
    assert L.shape == (len(q), len(g))
    # each row is a permutation of gallery indices
    assert (np.sort(L, axis=1) == np.arange(len(g))).all()
    top1 = g_pids[L[:, 0]]
    assert (top1 == q_pids).mean() >= 0.8


def test_rerank_lambda_blend_endpoints():
    feats, _ = _clustered_features(num_pids=4, per_pid=4)
    q, g = feats[:4], feats[4:]

    def sqdist(a, b):
        return ((a[:, None] - b[None]) ** 2).sum(-1)

    # lambda=1 -> pure (column-normalized) original distance ordering
    final = re_ranking(sqdist(q, g), sqdist(q, q), sqdist(g, g),
                       k1=6, k2=2, lambda_value=1.0)
    orig_order = np.argsort(sqdist(q, g), axis=1)
    new_order = np.argsort(final, axis=1)
    assert (orig_order[:, 0] == new_order[:, 0]).mean() >= 0.75


def test_gnn_propagation_gather_matches_dense():
    """The k2-term gather-sum propagation == the dense W @ A product it
    replaces (same math, n/k2 fewer FLOPs)."""
    import jax.numpy as jnp

    from ieee_tpu.ops.gnn_rerank import _gnn_rerank_scores, _scatter_rows

    rng = np.random.default_rng(11)
    X = rng.standard_normal((40, 16)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    q, g = X[:10], X[10:]
    k1, k2 = 8, 3

    scores = np.asarray(_gnn_rerank_scores(jnp.asarray(q), jnp.asarray(g),
                                           k1, k2))

    # dense oracle replicating the original formulation
    import jax

    X_u = jnp.concatenate([jnp.asarray(q), jnp.asarray(g)])
    n = X_u.shape[0]
    sim = jnp.dot(X_u, X_u.T, preferred_element_type=jnp.float32)
    S, rank = jax.lax.top_k(sim, k1)
    A = _scatter_rows(rank, jnp.ones_like(S), n)
    S = S * S
    W = _scatter_rows(rank[:, :k2], S[:, :k2], n)
    for _ in range(2):
        A = A + A.T
        A = jnp.dot(W, A, preferred_element_type=jnp.float32)
        A = A / jnp.maximum(jnp.linalg.norm(A, axis=1, keepdims=True),
                            1e-12)
    dense_scores = np.asarray(jnp.dot(A[:10], A[10:].T,
                                      preferred_element_type=jnp.float32))
    np.testing.assert_allclose(scores, dense_scores, rtol=1e-5, atol=1e-6)


def test_device_rerank_matches_numpy_oracle():
    """re_ranking_device == the numpy port (itself bit-matched to the
    reference's utils/rerank.py) across seeds and (k1, k2) settings."""
    from ieee_tpu.ops.rerank import re_ranking
    from ieee_tpu.ops.rerank_device import re_ranking_device

    for seed, (k1, k2) in [(0, (8, 3)), (1, (20, 6)), (2, (11, 1))]:
        rng = np.random.default_rng(seed)
        nq, ng, d = 12, 48, 16
        q = rng.standard_normal((nq, d)).astype(np.float32)
        g = rng.standard_normal((ng, d)).astype(np.float32)

        def sqdist(a, b):
            return ((a[:, None] - b[None]) ** 2).sum(-1)

        args = (sqdist(q, g), sqdist(q, q), sqdist(g, g))
        ref = re_ranking(*args, k1=k1, k2=k2)
        dev = re_ranking_device(*args, k1=k1, k2=k2)
        np.testing.assert_allclose(dev, ref, rtol=1e-4, atol=1e-5)


def test_gnn_track_transpose_matches_explicit_form():
    """The transpose-free propagation (At tracked via the symmetry of
    A + A.T) is numerically equivalent to the explicit A + A.T form."""
    import jax.numpy as jnp

    from ieee_tpu.ops.gnn_rerank import _gnn_rerank_scores

    rng = np.random.default_rng(3)
    q = rng.standard_normal((12, 16)).astype(np.float32)
    g = rng.standard_normal((40, 16)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    g /= np.linalg.norm(g, axis=1, keepdims=True)

    s_new = np.asarray(_gnn_rerank_scores(jnp.asarray(q), jnp.asarray(g),
                                          8, 4, True))
    s_old = np.asarray(_gnn_rerank_scores(jnp.asarray(q), jnp.asarray(g),
                                          8, 4, False))
    np.testing.assert_allclose(s_new, s_old, rtol=1e-5, atol=1e-6)


def test_device_rerank_bf16_minsum_close_to_oracle():
    """minsum_bf16=True stays rank-meaningful: within ~2e-3 of the exact
    device result (it intentionally breaks the 1e-4 oracle parity)."""
    from ieee_tpu.ops.rerank_device import re_ranking_device

    rng = np.random.default_rng(11)
    feats = []
    pids = []
    for pid in range(8):
        c = 3.0 * rng.standard_normal(24)
        for _ in range(5):
            feats.append(c + rng.standard_normal(24))
            pids.append(pid)
    feats = np.asarray(feats, np.float32)
    q, g = feats[:12], feats[12:]

    def sqdist(a, b):
        return ((a[:, None] - b[None]) ** 2).sum(-1).astype(np.float32)

    exact = re_ranking_device(sqdist(q, g), sqdist(q, q), sqdist(g, g),
                              k1=10, k2=4)
    fast = re_ranking_device(sqdist(q, g), sqdist(q, q), sqdist(g, g),
                             k1=10, k2=4, minsum_bf16=True)
    assert np.abs(fast - exact).max() < 2e-3
    assert not np.array_equal(fast, exact)  # genuinely a different path


def test_device_rerank_tiny_problem_falls_back():
    """n <= k1+1 used to crash approx_max_k ('k must be smaller than n');
    tiny problems now dispatch to the numpy oracle and still return the
    exact protocol result."""
    from ieee_tpu.ops.rerank import re_ranking
    from ieee_tpu.ops.rerank_device import re_ranking_device

    rng = np.random.default_rng(3)
    nq, ng, d = 3, 5, 8  # n=8 << default k1+1=21
    q = rng.standard_normal((nq, d)).astype(np.float32)
    g = rng.standard_normal((ng, d)).astype(np.float32)

    def sqdist(a, b):
        return ((a[:, None] - b[None]) ** 2).sum(-1)

    args = (sqdist(q, g), sqdist(q, q), sqdist(g, g))
    ref = re_ranking(*args)
    dev = re_ranking_device(*args)
    np.testing.assert_allclose(dev, ref, rtol=1e-6, atol=1e-7)
