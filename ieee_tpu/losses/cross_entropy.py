"""Label-smoothed cross entropy.

Reference analog: ``torchreid/losses/cross_entropy_loss.py:29-50``. Identical
math — smoothed one-hot targets, ``(-targets * log_probs).mean(0).sum()`` —
but built on-device (the reference constructed the one-hot on CPU and shipped
it to GPU every step; SURVEY known-quirk list).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cross_entropy_loss", "CrossEntropyLoss"]


def cross_entropy_loss(logits, targets, num_classes=None, eps=0.1, label_smooth=True):
    """Args:
        logits: (B, C) pre-softmax scores.
        targets: (B,) int labels.
    """
    logits = jnp.asarray(logits)
    if num_classes is None:
        num_classes = logits.shape[-1]
    e = eps if label_smooth else 0.0
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(targets, num_classes, dtype=log_probs.dtype)
    smoothed = (1.0 - e) * onehot + e / num_classes
    return jnp.sum(jnp.mean(-smoothed * log_probs, axis=0))


class CrossEntropyLoss:
    """Callable wrapper keeping the reference's constructor signature."""

    def __init__(self, num_classes, eps=0.1, use_gpu=True, label_smooth=True):
        del use_gpu  # device placement is jit's concern
        self.num_classes = num_classes
        self.eps = eps if label_smooth else 0.0

    def __call__(self, inputs, targets):
        return cross_entropy_loss(
            inputs, targets, self.num_classes, eps=self.eps, label_smooth=self.eps > 0
        )
