"""PFNet — the RGBNT201 paper's progressive-fusion baseline.

Reference analog: ``torchreid/models/pfnet.py:299-490``. Structure: 3 x
ResNet-50 trunks -> 5 feature branches (RGB, NI, TI, RT = RGB+TI,
RN = RGB+NI) -> 2-part pooling -> 2048->768 reduce per branch -> per-part
768->256 FC necks -> per-part classifiers per branch + one ``classifier_all``
over the 2560-d concat. Eval feature: ``concat([TI, RT, RGB, RN, NI])``
(``pfnet.py:434``). The reference registers pfnet nowhere
(``models/__init__.py``); registered here since it is the published baseline
(SURVEY known-quirk list).

TPU notes: same batched-einsum part heads as the IEEE model; the 5 branch
reduces run as one stacked 1x1 conv application per branch.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import ConvBN, adaptive_avg_pool, dense_init
from .ieee3modal import PartClassifier, PartFC, _l2norm
from .resnet import ResNetTrunk

__all__ = ["PFNET"]

BRANCHES = ("RGB", "NI", "TI", "RT", "RN")


class PFNET(nn.Module):
    num_classes: int = 100
    loss: str = "softmax"
    parts: int = 2
    reduce_dim: int = 768
    cls_dim: int = 256
    backbone_layers: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.backbones = [
            ResNetTrunk(block="bottleneck", layers=tuple(self.backbone_layers),
                        last_stride=1, dtype=self.dtype, name=f"backbone_{i}")
            for i in range(3)
        ]
        self.reduce = [
            ConvBN(self.reduce_dim, (1, 1), nonlinear="relu", dtype=self.dtype,
                   name=f"reduce_{i}")
            for i in range(5)
        ]
        self.part_fc = [
            PartFC(self.parts, self.cls_dim, dtype=self.dtype, name=f"fc_{b}")
            for b in BRANCHES
        ]
        self.part_classifier = [
            PartClassifier(self.parts, self.num_classes, name=f"classifier_{b}")
            for b in BRANCHES
        ]
        self.classifier_all = nn.Dense(
            self.num_classes, kernel_init=dense_init, dtype=jnp.float32,
            param_dtype=jnp.float32, name="classifier_all",
        )

    def __call__(self, x, train: bool = False, return_featuremaps: bool = False):
        f_rgb = self.backbones[0](x[0], train)
        f_ni = self.backbones[1](x[1], train)
        f_ti = self.backbones[2](x[2], train)
        if return_featuremaps:
            return f_rgb, f_ni, f_ti

        branch_maps = [f_rgb, f_ni, f_ti, f_rgb + f_ti, f_rgb + f_ni]

        fc = []
        for i, fm in enumerate(branch_maps):
            pooled = adaptive_avg_pool(fm, self.parts, 1)  # (B, P, 1, 2048)
            red = self.reduce[i](pooled, train)[:, :, 0, :]  # (B, P, 768)
            fc.append(self.part_fc[i](red, train))  # (B, P, 256)

        b = fc[0].shape[0]
        flat = {name: f.reshape(b, -1).astype(jnp.float32)
                for name, f in zip(BRANCHES, fc)}
        # eval order: TI, RT, RGB, RN, NI (reference pfnet.py:434)
        fc_all = jnp.concatenate(
            [flat["TI"], flat["RT"], flat["RGB"], flat["RN"], flat["NI"]],
            axis=1,
        )

        if not train:
            return fc_all

        logits = [self.part_classifier[i](fc[i]) for i in range(5)]
        out = {f"logits_{name}": l for name, l in zip(BRANCHES, logits)}
        out["logits_all"] = self.classifier_all(fc_all)
        # aliases for the multi-modal engines' R/N/T contract
        out["logits_R"] = out["logits_RGB"]
        out["logits_N"] = out["logits_NI"]
        out["logits_T"] = out["logits_TI"]
        if self.loss in ("margin", "hcloss", "CMT"):
            out["feat_R"] = _l2norm(flat["RGB"])
            out["feat_N"] = _l2norm(flat["NI"])
            out["feat_T"] = _l2norm(flat["TI"])
        elif self.loss == "triplet":
            out["feat"] = _l2norm(fc_all)
        out["fc_all"] = fc_all
        return out
