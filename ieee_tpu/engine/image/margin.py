"""Image3MEngine — the full-IEEE training engine (loss = 3M margin + CE).

Reference analog: ``torchreid/engine/image/margin.py:9-154``:
``loss = weight_m * 3M(f_R, f_N, f_T) + weight_x * (CE_R + CE_N + CE_T)``.
The reference's LossM logging bug (tensor not .item(), ``margin.py:145``) is
fixed by construction — all metrics are scalars.
"""

from __future__ import annotations

from ...losses import multi_modal_margin_loss
from ..engine import Engine, _traced_accuracy
from .softmax import _deep_ce


class Image3MEngine(Engine):
    def __init__(self, datamanager, model, optimizer=None, scheduler=None,
                 use_gpu=True, label_smooth=True, margin=3.0, weight_m=1.0,
                 weight_x=1.0, weight_m_warmup=0,
                 margin_mean_over_ids=False, **kwargs):
        super().__init__(datamanager, model, optimizer, scheduler,
                         use_gpu=use_gpu, **kwargs)
        self.label_smooth = label_smooth
        self.margin = float(margin)
        self.weight_m = weight_m
        self.weight_x = weight_x
        # documented divergence knob (losses/margin.py mean_over_ids): makes
        # the 3M term batch-size-invariant so large-batch TPU training is not
        # structurally worse than the reference's batch-8 protocol
        self.margin_mean_over_ids = bool(margin_mean_over_ids)
        # TPU-first extension (no reference analog): linearly ramp weight_m
        # from 0 to its target over the first `weight_m_warmup` epochs.
        # Motivated by the measured gradient dominance of the 3M term from
        # random init (trunk grad 200-500x the CE contribution,
        # E2E_DIAG_r03.jsonl): the reference's protocol sidesteps this via
        # ImageNet warm-start; the ramp lets CE shape the trunk first when
        # training from scratch. Injected as a traced scalar (loss_hparams)
        # so the schedule never retraces the step.
        self.weight_m_warmup = int(weight_m_warmup)
        self.num_classes = datamanager.num_train_pids
        # (P, K) contract from the RandomIdentitySampler; with k_tfm > 1 the
        # train step folds K adjacent draws per image into the batch, so the
        # per-pid group grows to num_instances * k_tfm
        self.num_instances = (getattr(datamanager, "num_instances", 4)
                              * getattr(datamanager, "k_tfm", 1))

    def loss_hparams(self, epoch):
        if self.weight_m_warmup > 0 and self.weight_m > 0:
            # epoch is 0-based: epoch 0 trains pure CE, full weight_m from
            # epoch weight_m_warmup on. Dict structure stays stable across
            # the whole run (one trace).
            ramp = min(1.0, epoch / self.weight_m_warmup)
            return {"weight_m": self.weight_m * ramp}
        return None

    def compute_loss(self, out, pids, hp=None):
        loss = 0.0
        metrics = {}
        if self.weight_m > 0:
            loss_m = multi_modal_margin_loss(
                out["feat_R"], out["feat_N"], out["feat_T"],
                num_instances=self.num_instances, margin=self.margin,
                mean_over_ids=self.margin_mean_over_ids,
            )
            wm = hp["weight_m"] if hp and "weight_m" in hp else self.weight_m
            loss = loss + wm * loss_m
            metrics["LossM"] = loss_m
        if self.weight_x > 0:
            loss_R = _deep_ce(out["logits_R"], pids, self.num_classes,
                              self.label_smooth)
            loss_N = _deep_ce(out["logits_N"], pids, self.num_classes,
                              self.label_smooth)
            loss_T = _deep_ce(out["logits_T"], pids, self.num_classes,
                              self.label_smooth)
            loss_x = loss_R + loss_N + loss_T
            loss = loss + self.weight_x * loss_x
            metrics.update(
                LossX=loss_x,
                lossR=loss_R,
                lossN=loss_N,
                lossT=loss_T,
                accR=_traced_accuracy(out["logits_R"], pids),
                accN=_traced_accuracy(out["logits_N"], pids),
                accT=_traced_accuracy(out["logits_T"], pids),
            )
        return loss, metrics
