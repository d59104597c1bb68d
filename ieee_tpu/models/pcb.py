"""PCB — part-based convolutional baseline (Sun et al., ECCV 2018).

Reference analog: ``torchreid/models/pcb.py:120-302``: ResNet-50 trunk with
last_stride=1, 6 (or 4) horizontal part stripes, dropout, shared 1x1 reduce
to 256, per-part classifiers. Eval feature = L2-normalized pooled 2048-d
part stack (12288-d at parts=6), matching ``pcb.py`` forward.

Note: the fork's pcb.py forward returns raw part features without applying
classifiers (dead-end train path); the published PCB applies per-part
classifiers — implemented here (documented divergence).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import ConvBN, adaptive_avg_pool
from .ieee3modal import PartClassifier
from .resnet import ResNetTrunk


class PCB(nn.Module):
    num_classes: int = 100
    loss: str = "softmax"
    parts: int = 6
    reduced_dim: int = 256
    backbone_layers: Sequence[int] = (3, 4, 6, 3)
    dropout_p: float = 0.5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, return_featuremaps: bool = False):
        f = ResNetTrunk(block="bottleneck", layers=tuple(self.backbone_layers),
                        last_stride=1, dtype=self.dtype, name="trunk")(x, train)
        if return_featuremaps:
            return f
        v_g = adaptive_avg_pool(f, self.parts, 1)  # (B, P, 1, 2048)

        if not train:
            v = v_g[:, :, 0, :].astype(jnp.float32)  # (B, P, 2048)
            v = v / jnp.maximum(
                jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12
            )
            # reference flattens (B, 2048, P, 1) C-order -> channel-major
            # (pcb.py eval: F.normalize(v_g, dim=1).view(B, -1)); keep that
            # exact layout for drop-in feature compatibility
            return jnp.swapaxes(v, 1, 2).reshape(v.shape[0], -1)

        v_g = nn.Dropout(rate=self.dropout_p, deterministic=not train)(v_g)
        v_h = ConvBN(self.reduced_dim, (1, 1), nonlinear="relu",
                     dtype=self.dtype, name="conv5")(v_g, train)
        v_h = v_h[:, :, 0, :]  # (B, P, 256)
        logits = PartClassifier(self.parts, self.num_classes,
                                name="classifier")(v_h)  # (B, P, C)
        if self.loss == "softmax":
            return logits
        if self.loss == "triplet":
            flat = v_h.reshape(v_h.shape[0], -1).astype(jnp.float32)
            return logits, flat
        raise KeyError(f"Unsupported loss: {self.loss}")
