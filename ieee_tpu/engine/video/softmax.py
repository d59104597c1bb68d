"""Video softmax engine.

Reference analog: ``torchreid/engine/video/softmax.py:7-109``: training folds
tracklet frames into the batch axis ((B,S,H,W,C) -> (B*S,H,W,C) with pids
repeated per frame); evaluation pools per-frame features avg/max over the
tracklet.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..image.softmax import ImageSoftmaxEngine


class VideoSoftmaxEngine(ImageSoftmaxEngine):
    def __init__(self, datamanager, model, optimizer=None, scheduler=None,
                 use_gpu=True, label_smooth=True, pooling_method="avg",
                 **kwargs):
        super().__init__(datamanager, model, optimizer, scheduler,
                         use_gpu=use_gpu, label_smooth=label_smooth, **kwargs)
        self.pooling_method = pooling_method

    def _put_batch(self, data, in_shard=None):
        del in_shard  # derived from the engine mesh (see base _put_batch)
        imgs = data["img"]  # (B, S, H, W, 3) uint8
        pids = data["pid"]
        if imgs.ndim == 5:
            b, s = imgs.shape[:2]
            imgs = imgs.reshape(b * s, *imgs.shape[2:])
            pids = np.repeat(pids, s)
        # delegate placement to the base helper: multi-host global-array
        # assembly (make_array_from_process_local_data) and rank-aware
        # spatial sharding both apply to the folded (B*S,H,W,C) batch too
        return self._put_arrays(imgs, pids)

    def _build_eval_step(self):
        model = self.model
        tfm = self.datamanager.transform_te
        pooling = self.pooling_method

        def step(params, batch_stats, imgs):
            # imgs: (B, S, H, W, 3)
            b, s = imgs.shape[:2]
            flat = tfm(imgs.reshape(b * s, *imgs.shape[2:]))
            feats = model.module.apply(
                {"params": params, "batch_stats": batch_stats}, flat,
                train=False,
            )
            feats = feats.reshape(b, s, -1)
            if pooling == "avg":
                return jnp.mean(feats, axis=1)
            return jnp.max(feats, axis=1)

        return jax.jit(step)


class VideoTripletEngine(VideoSoftmaxEngine):
    """Video triplet engine (reference ``engine/video/triplet.py:7-122``):
    same frame folding, triplet+CE loss."""

    def __init__(self, datamanager, model, optimizer=None, scheduler=None,
                 use_gpu=True, label_smooth=True, margin=0.3, weight_t=1.0,
                 weight_x=1.0, pooling_method="avg", **kwargs):
        super().__init__(datamanager, model, optimizer, scheduler,
                         use_gpu=use_gpu, label_smooth=label_smooth,
                         pooling_method=pooling_method, **kwargs)
        self.margin = margin
        self.weight_t = weight_t
        self.weight_x = weight_x

    def compute_loss(self, out, pids, hp=None):
        from ...losses import hard_mine_triplet_loss
        from ..engine import _traced_accuracy
        from ..image.softmax import _deep_ce

        logits, feature = out
        loss_x = _deep_ce(logits, pids, self.num_classes, self.label_smooth)
        loss_t = hard_mine_triplet_loss(feature, pids, margin=self.margin)
        loss = self.weight_x * loss_x + self.weight_t * loss_t
        return loss, {"loss_t": loss_t, "loss_x": loss_x,
                      "acc": _traced_accuracy(logits, pids)}
