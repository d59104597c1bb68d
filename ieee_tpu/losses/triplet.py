"""Batch-hard triplet loss, fully vectorized.

Reference analog: ``torchreid/losses/hard_mine_triplet_loss.py:18-48`` —
per-anchor Python loop over boolean masks. Here hardest positive/negative are
masked row max/min, so mining fuses into the train-step XLA program.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["hard_mine_triplet_loss", "TripletLoss"]


def hard_mine_triplet_loss(features, targets, margin=0.3):
    """Args:
        features: (B, D) embeddings.
        targets: (B,) int pids.
    """
    features = jnp.asarray(features)
    n = features.shape[0]
    sq = jnp.sum(features * features, axis=1)
    dist = sq[:, None] + sq[None, :] - 2.0 * jnp.dot(
        features, features.T, preferred_element_type=jnp.float32
    )
    dist = jnp.sqrt(jnp.clip(dist, min=1e-12))  # numerical stability as reference

    targets = jnp.asarray(targets)
    pos_mask = targets[:, None] == targets[None, :]  # includes self, as reference

    neg_inf = jnp.finfo(dist.dtype).min
    pos_inf = jnp.finfo(dist.dtype).max
    dist_ap = jnp.max(jnp.where(pos_mask, dist, neg_inf), axis=1)
    dist_an = jnp.min(jnp.where(pos_mask, pos_inf, dist), axis=1)

    # MarginRankingLoss(margin)(dist_an, dist_ap, y=1) = mean(relu(ap - an + m))
    return jnp.mean(jnp.maximum(dist_ap - dist_an + margin, 0.0))


class TripletLoss:
    def __init__(self, margin=0.3):
        self.margin = margin

    def __call__(self, inputs, targets):
        return hard_mine_triplet_loss(inputs, targets, self.margin)
