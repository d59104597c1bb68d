"""Hetero-center loss engine.

Reference analog: ``torchreid/engine/image/hcloss.py:9-127``:
``loss = weight_m * (HC(R,N) + HC(R,T) + HC(N,T)) + weight_x * CE``.
"""

from __future__ import annotations

from ...losses import hetero_loss
from ..engine import Engine, _traced_accuracy
from .softmax import _deep_ce


class ImageHCEngine(Engine):
    def __init__(self, datamanager, model, optimizer=None, scheduler=None,
                 use_gpu=True, label_smooth=True, weight_m=1.0, weight_x=1.0,
                 **kwargs):
        super().__init__(datamanager, model, optimizer, scheduler,
                         use_gpu=use_gpu, **kwargs)
        self.label_smooth = label_smooth
        self.weight_m = weight_m
        self.weight_x = weight_x
        self.num_classes = datamanager.num_train_pids
        # per-pid group size; k_tfm draws are folded K-adjacent into batch
        self.num_instances = (getattr(datamanager, "num_instances", 4)
                              * getattr(datamanager, "k_tfm", 1))

    def compute_loss(self, out, pids, hp=None):
        loss = 0.0
        metrics = {}
        if self.weight_m > 0:
            k = self.num_instances
            loss_m = (
                hetero_loss(out["feat_R"], out["feat_N"], k)
                + hetero_loss(out["feat_R"], out["feat_T"], k)
                + hetero_loss(out["feat_N"], out["feat_T"], k)
            )
            loss = loss + self.weight_m * loss_m
            metrics["loss_m"] = loss_m
        if self.weight_x > 0:
            loss_x = sum(
                _deep_ce(out[f"logits_{m}"], pids, self.num_classes,
                         self.label_smooth)
                for m in "RNT"
            )
            loss = loss + self.weight_x * loss_x
            metrics["loss_x"] = loss_x
            metrics["acc"] = _traced_accuracy(out["logits_R"], pids)
        return loss, metrics
