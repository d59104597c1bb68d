"""3M loss — multi-modal margin loss.

Reference analog: ``torchreid/losses/multi_modal_margin_loss_new.py:19-40``.
Per identity in the batch, compute each modality's feature center, then the
pairwise center MSE (sum-reduction) across the three modalities; the loss
pushes each pair's distance TOWARD the margin (enlarge, not collapse):

    loss = sum_id max_{(i,j) in pairs} | margin - MSE(center_i, center_j) |

The reference relies on ``chunk(len(unique(labels)))`` splitting the batch
into contiguous same-pid groups — valid only because RandomIdentitySampler
emits K consecutive instances per pid. We make that contract explicit: the
batch is reshaped to (P, K, D) with static P = batch // num_instances, making
the loss jit-compilable with fixed shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["multi_modal_margin_loss", "MultiModalMarginLoss"]


def _pair_mse_sum(c1, c2):
    """nn.MSELoss(reduction='sum') between two center matrices: (P,) per-id."""
    d = c1 - c2
    return jnp.sum(d * d, axis=-1)


def multi_modal_margin_loss(feat1, feat2, feat3, num_instances, margin=3.0,
                            mean_over_ids=False):
    """Args:
        feat1/2/3: (B, D) per-modality features (R, N, T), B = P * num_instances
            with the sampler's K-consecutive-per-pid layout.
        num_instances: static K from the P x K sampler.
        margin: target inter-modality center distance.
        mean_over_ids: documented TPU divergence knob. The reference SUMS the
            per-id terms (``multi_modal_margin_loss_new.py:38-40``), so the
            margin:CE gradient ratio scales with P = batch/K — at TPU batch
            128/K=4 that is 16x the reference's batch-8/P=2 protocol, and the
            round-3/4 controls show it: from-scratch CE flatlines at P=32
            (E2E_TRAIN_r03.json) but descends at the reference's own P=2
            scale (E2E_CONTROL_refproto_r04.json). ``True`` averages over ids
            instead, making the margin term batch-size-invariant (like the
            CE term, which DeepSupervision means over the batch).
    """
    feats = [jnp.asarray(f) for f in (feat1, feat2, feat3)]
    b, d = feats[0].shape
    if b % num_instances != 0:
        raise ValueError(f"batch {b} not divisible by num_instances {num_instances}")
    p = b // num_instances
    centers = [jnp.mean(f.reshape(p, num_instances, d), axis=1) for f in feats]

    d12 = jnp.abs(margin - _pair_mse_sum(centers[0], centers[1]))
    d23 = jnp.abs(margin - _pair_mse_sum(centers[1], centers[2]))
    d13 = jnp.abs(margin - _pair_mse_sum(centers[0], centers[2]))
    per_id = jnp.maximum(jnp.maximum(d12, d23), d13)  # (P,)
    if mean_over_ids:
        return jnp.mean(per_id)
    return jnp.sum(per_id)


class MultiModalMarginLoss:
    """Callable wrapper (reference class ``multiModalMarginLossNew``)."""

    def __init__(self, margin=3.0, dist_type="l2", num_instances=4):
        if dist_type != "l2":
            raise NotImplementedError(
                "Only dist_type='l2' is supported (the reference's l1/cos "
                "branches are dead code for the published configs)"
            )
        self.margin = float(margin)
        self.num_instances = int(num_instances)

    def __call__(self, feat1, feat2, feat3, labels=None):
        del labels  # grouping is structural (P x K), not label-derived
        return multi_modal_margin_loss(
            feat1, feat2, feat3, self.num_instances, self.margin
        )
