"""Loss parity tests against independently-built torch formulations."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from ieee_tpu.losses import (
    DeepSupervision,
    cross_entropy_loss,
    hard_mine_triplet_loss,
    hetero_loss,
    multi_modal_margin_loss,
)


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((8, 10)).astype(np.float32)
    targets = rng.integers(0, 10, 8)

    got = float(cross_entropy_loss(logits, targets, eps=0.1))

    # torch formulation: smoothed one-hot * log_softmax, mean over batch
    t_logits = torch.tensor(logits)
    lp = F.log_softmax(t_logits, dim=1)
    onehot = F.one_hot(torch.tensor(targets), 10).float()
    smoothed = 0.9 * onehot + 0.1 / 10
    want = float((-smoothed * lp).mean(0).sum())
    assert got == pytest.approx(want, rel=1e-5)


def test_cross_entropy_no_smoothing_is_plain_ce():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((6, 5)).astype(np.float32)
    targets = rng.integers(0, 5, 6)
    got = float(cross_entropy_loss(logits, targets, label_smooth=False))
    want = float(F.cross_entropy(torch.tensor(logits), torch.tensor(targets)))
    assert got == pytest.approx(want, rel=1e-5)


def _torch_hard_triplet(feats, pids, margin=0.3):
    x = torch.tensor(feats)
    n = x.size(0)
    dist = torch.cdist(x, x, p=2).clamp(min=1e-6)
    mask = torch.tensor(pids).expand(n, n).eq(torch.tensor(pids).expand(n, n).t())
    ap = torch.stack([dist[i][mask[i]].max() for i in range(n)])
    an = torch.stack([dist[i][~mask[i]].min() for i in range(n)])
    return float(F.margin_ranking_loss(an, ap, torch.ones_like(an), margin=margin))


def test_triplet_matches_torch():
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((16, 32)).astype(np.float32)
    pids = np.repeat(np.arange(4), 4)
    got = float(hard_mine_triplet_loss(feats, pids, margin=0.3))
    want = _torch_hard_triplet(feats, pids, margin=0.3)
    assert got == pytest.approx(want, rel=1e-3)


def test_margin_3m_matches_direct_formula():
    rng = np.random.default_rng(3)
    P, K, D = 2, 4, 16
    f1 = rng.standard_normal((P * K, D)).astype(np.float32)
    f2 = rng.standard_normal((P * K, D)).astype(np.float32)
    f3 = rng.standard_normal((P * K, D)).astype(np.float32)
    margin = 1.0
    got = float(multi_modal_margin_loss(f1, f2, f3, num_instances=K, margin=margin))

    want = 0.0
    for p in range(P):
        cs = [f.reshape(P, K, D)[p].mean(0) for f in (f1, f2, f3)]
        d12 = ((cs[0] - cs[1]) ** 2).sum()
        d23 = ((cs[1] - cs[2]) ** 2).sum()
        d13 = ((cs[0] - cs[2]) ** 2).sum()
        want += max(abs(margin - d12), abs(margin - d23), abs(margin - d13))
    assert got == pytest.approx(want, rel=1e-4)

    # mean_over_ids (documented divergence knob): exactly sum/P, so the
    # margin:CE gradient ratio stops scaling with batch size
    got_mean = float(multi_modal_margin_loss(
        f1, f2, f3, num_instances=K, margin=margin, mean_over_ids=True))
    assert got_mean == pytest.approx(want / P, rel=1e-4)


def test_hetero_loss():
    rng = np.random.default_rng(4)
    P, K, D = 3, 2, 8
    f1 = rng.standard_normal((P * K, D)).astype(np.float32)
    f2 = rng.standard_normal((P * K, D)).astype(np.float32)
    got = float(hetero_loss(f1, f2, num_instances=K))
    want = sum(
        ((f1.reshape(P, K, D)[p].mean(0) - f2.reshape(P, K, D)[p].mean(0)) ** 2).sum()
        for p in range(P)
    )
    assert got == pytest.approx(float(want), rel=1e-4)


def test_deep_supervision_sums():
    xs = [np.ones((2, 3), np.float32) * i for i in range(3)]
    y = np.array([0, 1])
    crit = lambda x, t: float(x.sum())
    assert DeepSupervision(crit, xs, y) == pytest.approx(sum(x.sum() for x in xs))


def test_triplet_loss_jittable():
    import jax

    f = jax.jit(lambda x, t: hard_mine_triplet_loss(x, t))
    rng = np.random.default_rng(5)
    out = f(rng.standard_normal((8, 4)).astype(np.float32), np.repeat([0, 1], 4))
    assert np.isfinite(float(out))
