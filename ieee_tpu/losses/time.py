"""time_loss — faithful port of the reference's degenerate temporal loss.

Reference analog: ``torchreid/losses/time_loss.py:18-36``: per-identity
centers of ``feat`` (batch chunked by unique label — the (P, K) sampler
contract here), then for each center the *self*-distance
``dist(center, center)`` is accumulated. MSE/L1 of a tensor with itself is
identically 0 (and ``1 - cos(c, c)`` likewise), so the loss is the constant
0 with zero gradients — dead code in the reference, ported for API
completeness and pinned to that behavior by tests so a migrating user's
``time_loss`` term keeps (non-)contributing identically.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["time_loss", "TimeLoss"]


def time_loss(feat, num_instances, margin=0.1, dist_type="l2"):
    """Sum over identities of dist(center, center) — identically zero, with
    a real (zero-valued) gradient path through the centers so it composes
    under ``jax.grad`` exactly like the reference composes under autograd."""
    del margin
    f = jnp.asarray(feat)
    b, d = f.shape
    p = b // num_instances
    centers = jnp.mean(f.reshape(p, num_instances, d), axis=1)
    diff = centers - centers
    if dist_type in ("l2", "l1"):
        per_id = jnp.sum(jnp.abs(diff) if dist_type == "l1" else diff * diff,
                         axis=1)
    elif dist_type == "cos":
        norm = jnp.linalg.norm(centers, axis=1)
        cos = jnp.sum(centers * centers, axis=1) / (norm * norm + 1e-12)
        per_id = jnp.maximum(0.0, 1.0 - cos)
    else:
        raise NotImplementedError(f"dist_type={dist_type!r}")
    return jnp.sum(per_id)


class TimeLoss:
    def __init__(self, margin=0.1, dist_type="l2", num_instances=4):
        self.margin = margin
        self.dist_type = dist_type
        self.num_instances = int(num_instances)

    def __call__(self, feat, labels=None):
        del labels
        return time_loss(feat, self.num_instances, self.margin,
                         self.dist_type)
