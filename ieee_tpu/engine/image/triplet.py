"""Triplet engine: CE + batch-hard triplet on the fused feature.

Reference analog: ``torchreid/engine/image/triplet.py:11-141``. The reference
unpacks ``outputs, features = model(imgs)`` which breaks for the IEEE model's
4-output triplet head (SURVEY known-quirk list); here both single-modal
(logits, feature) tuples and the IEEE dict output are handled.
"""

from __future__ import annotations

from ...losses import hard_mine_triplet_loss
from ..engine import Engine, _traced_accuracy
from .softmax import _deep_ce


class ImageTripletEngine(Engine):
    def __init__(self, datamanager, model, optimizer=None, scheduler=None,
                 use_gpu=True, label_smooth=True, margin=0.3, weight_t=1.0,
                 weight_x=1.0, **kwargs):
        super().__init__(datamanager, model, optimizer, scheduler,
                         use_gpu=use_gpu, **kwargs)
        self.label_smooth = label_smooth
        self.margin = margin
        self.weight_t = weight_t
        self.weight_x = weight_x
        self.num_classes = datamanager.num_train_pids

    def compute_loss(self, out, pids, hp=None):
        metrics = {}
        if isinstance(out, dict):  # IEEE multi-modal
            feature = out["feat"]
            loss_x = sum(
                _deep_ce(out[f"logits_{m}"], pids, self.num_classes,
                         self.label_smooth)
                for m in "RNT"
            )
            metrics["acc"] = _traced_accuracy(out["logits_R"], pids)
        else:  # (logits, feature)
            logits, feature = out
            loss_x = _deep_ce(logits, pids, self.num_classes, self.label_smooth)
            metrics["acc"] = _traced_accuracy(logits, pids)
        loss_t = hard_mine_triplet_loss(feature, pids, margin=self.margin)
        loss = self.weight_x * loss_x + self.weight_t * loss_t
        metrics.update(loss_t=loss_t, loss_x=loss_x)
        return loss, metrics
