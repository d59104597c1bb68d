"""Softmax (cross-entropy) engines.

Reference analog: ``torchreid/engine/image/softmax.py`` —
``MultiModalImageSoftmaxEngine`` (``softmax.py:11-130``) and the original
single-modal ``ImageSoftmaxEngine`` (``softmax.py:137-228``; the unused
``camids`` model arg is dropped per SURVEY known-quirk list).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...losses import cross_entropy_loss
from ..engine import Engine, _traced_accuracy


def _deep_ce(logits, pids, num_classes, label_smooth):
    """DeepSupervision CE over the part axis: (B, P, C) -> sum_p CE."""
    if logits.ndim == 3:
        p = logits.shape[1]
        flat = logits.reshape(-1, logits.shape[-1])
        rep_pids = jnp.repeat(pids[:, None], p, axis=1).reshape(-1)
        # sum over parts of per-part batch-mean CE == P * mean over (B*P)
        return p * cross_entropy_loss(
            flat, rep_pids, num_classes, label_smooth=label_smooth
        )
    return cross_entropy_loss(logits, pids, num_classes,
                              label_smooth=label_smooth)


class ImageSoftmaxEngine(Engine):
    """Single-modal CE engine (reference ``softmax.py:137-228``)."""

    def __init__(self, datamanager, model, optimizer=None, scheduler=None,
                 use_gpu=True, label_smooth=True, **kwargs):
        super().__init__(datamanager, model, optimizer, scheduler,
                         use_gpu=use_gpu, **kwargs)
        self.label_smooth = label_smooth
        self.num_classes = datamanager.num_train_pids

    def compute_loss(self, out, pids, hp=None):
        logits = out[0] if isinstance(out, (tuple, list)) else out
        loss = _deep_ce(logits, pids, self.num_classes, self.label_smooth)
        return loss, {"acc": _traced_accuracy(logits, pids)}


class MultiModalImageSoftmaxEngine(Engine):
    """3-modality CE engine: loss = CE_R + CE_N + CE_T over per-part logits
    (reference ``softmax.py:81-130``)."""

    def __init__(self, datamanager, model, optimizer=None, scheduler=None,
                 use_gpu=True, label_smooth=True, **kwargs):
        super().__init__(datamanager, model, optimizer, scheduler,
                         use_gpu=use_gpu, **kwargs)
        self.label_smooth = label_smooth
        self.num_classes = datamanager.num_train_pids

    def compute_loss(self, out, pids, hp=None):
        loss_R = _deep_ce(out["logits_R"], pids, self.num_classes,
                          self.label_smooth)
        loss_N = _deep_ce(out["logits_N"], pids, self.num_classes,
                          self.label_smooth)
        loss_T = _deep_ce(out["logits_T"], pids, self.num_classes,
                          self.label_smooth)
        loss = loss_R + loss_N + loss_T
        metrics = {
            "loss_R": loss_R,
            "acc_R": _traced_accuracy(out["logits_R"], pids),
            "loss_N": loss_N,
            "acc_N": _traced_accuracy(out["logits_N"], pids),
            "loss_T": loss_T,
            "acc_T": _traced_accuracy(out["logits_T"], pids),
        }
        return loss, metrics
