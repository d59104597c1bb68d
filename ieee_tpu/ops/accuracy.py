"""Top-k classification accuracy (reference ``torchreid/metrics/accuracy.py:4-38``)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["accuracy"]


def accuracy(output, target, topk=(1,)):
    """Computes the accuracy over the k top predictions.

    Args:
        output: (B, C) logits, or a list/tuple of them (first element used,
            matching the reference's DeepSupervision convention).
        target: (B,) integer labels.
    Returns:
        list of accuracies (percentages) for each k in ``topk``.
    """
    if isinstance(output, (tuple, list)):
        output = output[0]
    output = jnp.asarray(output)
    target = jnp.asarray(target)
    maxk = max(topk)
    batch_size = target.shape[0]

    # top-maxk predicted classes per row
    pred = jnp.argsort(-output, axis=1)[:, :maxk]  # (B, maxk)
    correct = pred == target[:, None]  # (B, maxk)

    res = []
    for k in topk:
        correct_k = jnp.sum(correct[:, :k].any(axis=1).astype(jnp.float32))
        res.append(float(correct_k) * (100.0 / batch_size))
    return res
