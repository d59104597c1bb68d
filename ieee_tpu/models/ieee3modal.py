"""IEEE3modalPart — the flagship multi-modal (RGB+NI+TI) re-ID model.

Reference analog: ``torchreid/models/ieee3modalPart.py:285-555``. Structure:
3 x ResNet-50 trunks (last_stride=1) -> CIM cross-modal interaction with
channel attention -> 6-part + global pooling -> 2048->768 reduce ->
REM relation embedding -> per-part 768->128 FC necks -> per-part classifiers.
Eval feature is ``concat([fc_T, fc_R, fc_N])`` = 2304-d
(reference ``ieee3modalPart.py:502-505`` — T,R,N order matters for parity).

TPU-first re-design notes (same math, different factorization):
 - NHWC + bf16 on the MXU; the 1x1 CIM convs are (B*H*W, 2048)x(2048, 2048)
   matmuls XLA tiles onto the systolic array.
 - The reference's 18 per-part nn.Linear(768,128) modules become ONE stacked
   einsum per modality: (B,P,768) x (P,768,128) -> (B,P,128). Per-part
   BatchNorm1d(128) folds into a single BatchNorm over the flattened (B,P*128)
   axis — identical statistics, one fused kernel.
 - REM's nonLocal block (reference ``ieee3modalPart.py:51-80``) softmaxes an
   energy of shape (B,1,1): the softmax is constantly 1, so the block reduces
   EXACTLY (forward and gradient) to ``part + gamma * 2 * W_part(global)``.
   We keep the conv_query/conv_value parameters for reference-checkpoint
   conversion parity; XLA dead-code-eliminates their forward cost.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import (
    ConvBN,
    adaptive_avg_pool,
    dense_init,
    global_avg_pool,
    global_max_pool,
)
from .resnet import ResNetTrunk

__all__ = ["IEEE3modalPart", "ChannelAttention", "NonLocalREM"]


class ChannelAttention(nn.Module):
    """Sigmoid channel gate from avg+max pooled MLP
    (reference ``ieee3modalPart.py:266-282``)."""

    ratio: int = 16
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        c = x.shape[-1]
        mlp = nn.Sequential(
            [
                nn.Dense(c // self.ratio, use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32, name="fc1"),
                nn.relu,
                nn.Dense(c, use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32, name="fc2"),
            ]
        )
        avg_out = mlp(global_avg_pool(x))
        max_out = mlp(global_max_pool(x))
        gate = nn.sigmoid((avg_out + max_out).astype(jnp.float32))
        return gate[:, None, None, :].astype(x.dtype)  # broadcast over H, W


class NonLocalREM(nn.Module):
    """REM relation block (reference ``nonLocal``, ``ieee3modalPart.py:51-80``).

    The reference computes energy=(B,1,1), softmaxes it (constant 1, zero
    gradient), and returns ``query + gamma * (matmul(f_part, sim) + f_part)``
    = ``query + gamma * 2 * conv_part(part)``. Implemented in that reduced
    form; conv_query/conv_value params are declared (never used — the
    reference's gradients to them are identically zero) so reference
    checkpoints convert losslessly.
    """

    dim: int = 768
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, query, part):
        # query: (B, dim) part feature; part: (B, dim) modality-global feature
        _ = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="conv_query")(query)
        f_part = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                          name="conv_part")(part)
        _ = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="conv_value")(part)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return query + (gamma * 2.0).astype(query.dtype) * f_part


class PartFC(nn.Module):
    """Stacked per-part FC neck: (B,P,in) x (P,in,out) einsum + per-part BN
    (folded into one wide BN over (B, P*out)) + ReLU.

    Same math as the reference's P independent Linear+BN1d+ReLU stacks
    (``ieee3modalPart.py:354-371`` via ``_construct_fc_layer``).
    """

    parts: int
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, P, D)
        b, p, d = x.shape
        w = self.param("kernel", dense_init, (p, d, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (p, self.features),
                          jnp.float32)
        y = jnp.einsum(
            "bpd,pdf->bpf", x.astype(self.dtype), w.astype(self.dtype)
        ).astype(jnp.float32) + bias
        y = y.reshape(b, p * self.features)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, param_dtype=jnp.float32, name="bn",
        )(y)
        return nn.relu(y).reshape(b, p, self.features).astype(self.dtype)


class PartClassifier(nn.Module):
    """Stacked per-part classifiers: (B,P,F) x (P,F,C) -> per-part logits
    (reference ``ieee3modalPart.py:374-391``)."""

    parts: int
    num_classes: int

    @nn.compact
    def __call__(self, x):
        p = x.shape[1]
        w = self.param(
            "kernel", dense_init, (p, x.shape[2], self.num_classes), jnp.float32
        )
        b = self.param(
            "bias", nn.initializers.zeros, (p, self.num_classes), jnp.float32
        )
        return jnp.einsum("bpf,pfc->bpc", x.astype(jnp.float32), w) + b


def _l2norm(x, axis=1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


class IEEE3modalPart(nn.Module):
    """3-branch multi-modal part model. Input: tuple (R, N, T) of (B,H,W,3).

    Train output (loss='margin'): dict with per-modality part logits
    (B, P, C) and normalized per-modality features. Eval output: 2304-d
    ``fc_all`` in T,R,N order.
    """

    num_classes: int = 100
    loss: str = "softmax"
    parts: int = 6
    fc_dim: int = 128
    pooling_dim: int = 768
    interaction: bool = True
    attention: bool = True
    using_REM: bool = True
    backbone_layers: Sequence[int] = (3, 4, 6, 3)  # ResNet-50 by default
    dtype: Any = jnp.bfloat16
    fused_1x1: bool | None = None  # None = auto: Pallas matmul+BN on TPU
    block_megakernel: bool | None = None  # Pallas whole-block backward

    def setup(self):
        from .common import FusedConvBN1x1
        from .resnet import fuse_worthwhile, resolve_fused_1x1

        fused = resolve_fused_1x1(self.fused_1x1)

        def conv_bn_1x1(features, name, k_in=2048):
            if fused and fuse_worthwhile(k_in, features):
                return FusedConvBN1x1(features, nonlinear="relu",
                                      dtype=self.dtype, name=name)
            return ConvBN(features, (1, 1), nonlinear="relu",
                          dtype=self.dtype, name=name)

        self.backbones = [
            ResNetTrunk(
                block="bottleneck", layers=tuple(self.backbone_layers),
                last_stride=1, dtype=self.dtype, fused_1x1=fused,
                block_megakernel=self.block_megakernel,
                name=f"backbone_{m}",
            )
            for m in "RNT"
        ]
        if self.interaction:
            self.convOne = [
                conv_bn_1x1(2048, f"convOne_{i}") for i in range(3)
            ]
            self.convAvgRest = [
                conv_bn_1x1(2048, f"convAvgRest_{i}") for i in range(3)
            ]
            if self.attention:
                self.CA = [
                    ChannelAttention(dtype=self.dtype, name=f"CA_{i}")
                    for i in range(3)
                ]
        self.reduce = [
            conv_bn_1x1(self.pooling_dim, f"reduce_{i}") for i in range(3)
        ]
        if self.using_REM:
            self.REM = [
                NonLocalREM(self.pooling_dim, dtype=self.dtype, name=f"REM_{i}")
                for i in range(3)
            ]
        self.part_fc = [
            PartFC(self.parts, self.fc_dim, dtype=self.dtype, name=f"fc_{m}")
            for m in "RNT"
        ]
        self.part_classifier = [
            PartClassifier(self.parts, self.num_classes, name=f"classifier_{m}")
            for m in "RNT"
        ]

    def _cim(self, one, rest1, rest2, idx, train):
        """Cross-modal Interaction Module (reference ``ieee3modalPart.py:427-435``)."""
        f_one = self.convOne[idx](one, train)
        f_rest = self.convAvgRest[idx](rest1 + rest2, train)
        if self.attention:
            f_rest = self.CA[idx](f_rest) * f_rest + f_rest
        return f_one + f_rest

    def __call__(self, x, train: bool = False, return_featuremaps: bool = False,
                 pp_units=None):
        """``pp_units`` (pipeline parallelism, parallel/pipeline.py): a
        contiguous slice of the 5 logical units — 0..3 run that unit of all
        three modal trunks in lockstep (x is then a 3-tuple of images or
        feature maps, and a headless slice returns the 3 maps for the next
        stage); unit 4 is the fusion head (CIM+pool+reduce+REM+fc+classifier).
        """
        if pp_units is not None:
            pp_units = tuple(sorted(int(u) for u in pp_units))
            if not pp_units or pp_units[-1] > 4 or pp_units[0] < 0:
                raise ValueError(
                    f"pp_units out of range: {pp_units} (5 logical units, "
                    "0..4)")
            trunk_units = tuple(u for u in pp_units if u < 4)
            maps = x
            if trunk_units:
                maps = [self.backbones[i](x[i], train, units=trunk_units)
                        for i in range(3)]
            if 4 not in pp_units:
                return tuple(maps)
            return self._head(maps, train)

        maps = [self.backbones[i](x[i], train) for i in range(3)]  # (B,16,8,2048) x3

        if return_featuremaps:
            return tuple(maps)

        return self._head(maps, train)

    def _head(self, maps, train: bool = False):
        """Everything after the three trunks: CIM interaction, part/global
        pooling, shared reduce, REM, part FC necks, classifiers, outputs."""
        if self.interaction:
            pooled = [
                self._cim(maps[0], maps[1], maps[2], 0, train),
                self._cim(maps[1], maps[0], maps[2], 1, train),
                self._cim(maps[2], maps[0], maps[1], 2, train),
            ]
        else:
            pooled = maps

        # global (1,1) and part (P,1) pooling, then the SAME shared 2048->768
        # reduce applied twice sequentially, exactly as the reference
        # (``ieee3modalPart.py:449-455``): in train mode the global call
        # normalizes with B-item batch stats, the part call with B*P-item
        # stats, and the running averages take both updates in that order
        # (flax accumulates sequential mutable updates like torch does).
        # Verified against the reference's own class in
        # tests/test_reference_model_parity.py.
        feats_g, feats_p = [], []
        for i in range(3):
            g = adaptive_avg_pool(maps[i], 1, 1)  # (B,1,1,2048)
            p = adaptive_avg_pool(pooled[i], self.parts, 1)  # (B,P,1,2048)
            red_g = self.reduce[i](g, train)  # (B,1,1,768)
            red_p = self.reduce[i](p, train)  # (B,P,1,768)
            feats_g.append(red_g[:, 0, 0, :])  # (B,768)
            feats_p.append(red_p[:, :, 0, :])  # (B,P,768)

        if self.using_REM:
            feats_p = [
                self._rem_broadcast(i, fp, fg)
                for i, (fp, fg) in enumerate(zip(feats_p, feats_g))
            ]

        fc = [self.part_fc[i](feats_p[i], train) for i in range(3)]  # (B,P,128) x3
        b = fc[0].shape[0]
        fc_flat = [f.reshape(b, -1).astype(jnp.float32) for f in fc]  # (B,768) x3
        fc_R_all, fc_N_all, fc_T_all = fc_flat

        # eval feature: T, R, N concat order (reference ``ieee3modalPart.py:502``)
        fc_all = jnp.concatenate([fc_T_all, fc_R_all, fc_N_all], axis=1)

        if not train:
            return fc_all

        logits = [self.part_classifier[i](fc[i]) for i in range(3)]  # (B,P,C) x3
        out = {
            "logits_R": logits[0],
            "logits_N": logits[1],
            "logits_T": logits[2],
        }
        if self.loss in ("margin", "hcloss", "CMT"):
            out["feat_R"] = _l2norm(fc_R_all)
            out["feat_N"] = _l2norm(fc_N_all)
            out["feat_T"] = _l2norm(fc_T_all)
        elif self.loss == "triplet":
            out["feat"] = _l2norm(fc_all)
        out["fc_all"] = fc_all
        return out

    def _rem_broadcast(self, i, parts, global_feat):
        """Apply REM_i to each part against the modality-global feature.
        Since the block is ``part + 2*gamma*W(global)``, the global term is
        computed once and broadcast over the P axis — identical math to the
        reference's per-part loop (``ieee3modalPart.py:484-488``)."""
        zero_query = jnp.zeros_like(global_feat)
        delta = self.REM[i](zero_query, global_feat)  # = 2*gamma*W_part(global)
        return parts + delta[:, None, :]
