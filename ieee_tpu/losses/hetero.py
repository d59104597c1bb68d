"""Hetero-center loss: pull per-identity modality centers together.

Reference analog: ``torchreid/losses/hcloss.py:18-39`` (l2 branch:
sum over identities of MSE-sum between the two modality centers).
Same (P, K, D) static-reshape contract as the 3M loss.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["hetero_loss", "HeteroLoss"]


def hetero_loss(feat1, feat2, num_instances, margin=0.1):
    """l2 hetero loss; ``margin`` kept for reference signature parity (the
    reference's l2 branch never uses it: ``max(0, abs(mse))`` == mse)."""
    del margin
    f1, f2 = jnp.asarray(feat1), jnp.asarray(feat2)
    b, d = f1.shape
    p = b // num_instances
    c1 = jnp.mean(f1.reshape(p, num_instances, d), axis=1)
    c2 = jnp.mean(f2.reshape(p, num_instances, d), axis=1)
    diff = c1 - c2
    return jnp.sum(diff * diff)


class HeteroLoss:
    def __init__(self, margin=0.1, dist_type="l2", num_instances=4):
        if dist_type != "l2":
            raise NotImplementedError("Only dist_type='l2' is supported")
        self.margin = margin
        self.num_instances = int(num_instances)

    def __call__(self, feat1, feat2, labels=None):
        del labels
        return hetero_loss(feat1, feat2, self.num_instances, self.margin)
