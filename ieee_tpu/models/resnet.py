"""ResNet family, TPU-native (flax / NHWC / bf16 MXU compute).

Reference analog: ``torchreid/models/resnet.py`` — the classic reID ``ResNet``
head (``resnet.py:187-399``), the headless ``ResNetIEEE`` trunk returning the
layer-4 map (``resnet.py:443-635``), and the plain ``ResNetBackbone``
(``resnet.py:883-1067``). One trunk implementation serves all three roles here;
the variants differ only in head. ``last_stride=1`` keeps a 16x8 final map at
256x128 input, as the reID variants require (``resnet.py:1143-1262``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import (
    ConvBN,
    DenseBNReLU,
    FusedConvBN1x1,
    conv_kaiming_init,
    dense_init,
    global_avg_pool,
)


def resolve_fused_1x1(flag):
    """None = auto: use the fused Pallas matmul+BN path on TPU, the plain
    XLA path elsewhere (CPU tests run Pallas in interpret mode only where
    explicitly requested)."""
    if flag is None:
        # measured round 2 (v5e, batch 128 IEEE step): XLA baseline 135.9
        # ms/step vs 219 (all sites fused), 152 (selective), 149 (selective +
        # XLA elementwise). The custom-vjp boundary blocks XLA fusion across
        # the op and the kernels pay layout copies at the 4D<->2D seams, so
        # the stats-epilogue win never materializes end-to-end on this
        # XLA/libtpu build. Default OFF; opt in via cfg.tpu.fused_1x1=True.
        return False
    return bool(flag)


def fuse_worthwhile(k_in: int, c_out: int, min_dim: int = 384) -> bool:
    """Per-site gate for the fused Pallas matmul+BN path. Measured on the
    v5e (round 2): the fused kernels beat XLA conv+BN when both channel dims
    are MXU-sized (CIM 2048x2048 runs at ~111 TF/s incl. backward; the
    layer-1/2 tall-skinny shapes, N~10^5 x C<=512, are faster as XLA convs).
    """
    return min(k_in, c_out) >= min_dim


def resolve_block_megakernel(flag):
    """None = auto (currently OFF: measure with tools/exp_variants.py
    megakernel before flipping). The Pallas whole-block backward
    (ops/pallas/block_bwd.py, round-3 VERDICT item 4) replaces XLA's
    per-fusion backward for every stride-1 no-downsample bottleneck; opt in
    via cfg.tpu.block_megakernel=True."""
    if flag is None:
        return False
    return bool(flag)


def megakernel_vmem_ok(width: int) -> bool:
    """Per-block VMEM gate for the whole-block backward. Its conv2 pass
    keeps the full 3x3 weight (bf16) plus the f32 dW accumulator
    VMEM-resident: 9*width^2*(2+4) bytes. At width 512 (layer4) that is
    ~13.5 MiB before activations and Mosaic's stack allocation OOMs on the
    v5e (measured via tools/megakernel_probe.py, r04); width<=256 compiles
    at every ResNet-50 stage shape. Wider blocks fall back to the plain
    XLA path until the kernel grows a kernel-position grid axis."""
    return width <= 256

__all__ = [
    "ResNetTrunk",
    "ReIDResNet",
    "RESNET_SPECS",
]


RESNET_SPECS = {
    # name: (block, layers, groups, width_per_group)
    "resnet18": ("basic", (2, 2, 2, 2), 1, 64),
    "resnet34": ("basic", (3, 4, 6, 3), 1, 64),
    "resnet50": ("bottleneck", (3, 4, 6, 3), 1, 64),
    "resnet101": ("bottleneck", (3, 4, 23, 3), 1, 64),
    "resnet152": ("bottleneck", (3, 8, 36, 3), 1, 64),
    "resnext50_32x4d": ("bottleneck", (3, 4, 6, 3), 32, 4),
    "resnext101_32x8d": ("bottleneck", (3, 4, 23, 3), 32, 8),
}


class BasicBlock(nn.Module):
    planes: int
    strides: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.bfloat16

    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = ConvBN(
            self.planes, (3, 3), (self.strides, self.strides), ((1, 1), (1, 1)),
            nonlinear="relu", dtype=self.dtype, name="cb1",
        )(x, train)
        out = ConvBN(
            self.planes, (3, 3), (1, 1), ((1, 1), (1, 1)),
            nonlinear=None, dtype=self.dtype, name="cb2",
        )(out, train)
        if self.downsample:
            identity = ConvBN(
                self.planes, (1, 1), (self.strides, self.strides),
                nonlinear=None, dtype=self.dtype, name="downsample",
            )(x, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    strides: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.bfloat16
    fused_1x1: bool = False  # Pallas matmul+BN path for cb1/cb3/downsample
    block_megakernel: bool = False  # Pallas whole-block backward (stride-1)

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        k_in = x.shape[-1]
        c_out = self.planes * self.expansion
        if (self.block_megakernel and self.groups == 1
                and self.strides == 1 and not self.downsample
                and megakernel_vmem_ok(width)):
            return self._megakernel_block(x, width, k_in, c_out, train)
        base_ok = self.fused_1x1 and self.groups == 1
        fuse_cb1 = base_ok and fuse_worthwhile(k_in, width)
        # cb3 and downsample must agree: the fused cb3 consumes the identity
        # as its residual operand
        fused = base_ok and fuse_worthwhile(width, c_out) \
            and (not self.downsample or fuse_worthwhile(k_in, c_out))
        identity = x
        if fuse_cb1:
            out = FusedConvBN1x1(width, nonlinear="relu", dtype=self.dtype,
                                 name="cb1")(x, train)
        else:
            out = ConvBN(width, (1, 1), nonlinear="relu", dtype=self.dtype,
                         name="cb1")(x, train)
        out = nn.Conv(
            width,
            kernel_size=(3, 3),
            strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)),
            feature_group_count=self.groups,
            use_bias=False,
            kernel_init=conv_kaiming_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv2",
        )(out)
        from .common import FastBatchNorm

        out = FastBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name="bn2",
        )(out)
        out = nn.relu(out)
        if fused:
            if self.downsample:
                # 1x1 stride-s conv == subsample rows/cols then stride-1 1x1
                xs = x[:, ::self.strides, ::self.strides, :] \
                    if self.strides != 1 else x
                identity = FusedConvBN1x1(
                    self.planes * self.expansion, dtype=self.dtype,
                    name="downsample",
                )(xs, train)
            # cb3 + residual fused; relu applied here (see FusedConvBN1x1)
            out = FusedConvBN1x1(
                self.planes * self.expansion, dtype=self.dtype, name="cb3",
            )(out, train, residual=identity)
            return nn.relu(out)
        out = ConvBN(
            self.planes * self.expansion, (1, 1), nonlinear=None,
            dtype=self.dtype, name="cb3",
        )(out, train)
        if self.downsample:
            identity = ConvBN(
                self.planes * self.expansion, (1, 1),
                (self.strides, self.strides), nonlinear=None,
                dtype=self.dtype, name="downsample",
            )(x, train)
        return nn.relu(out + identity)

    def _megakernel_block(self, x, width, k_in, c_out, train):
        """Pallas whole-block-backward path (ops/pallas/block_bwd.py).
        Param/stat tree is identical to the plain path (cb1/{conv,bn},
        conv2, bn2, cb3/{conv,bn}) via the bare holders, so checkpoints,
        converters and the other block variants interchange."""
        from ..ops.pallas.block_bwd import block_eval_jnp, bottleneck_train
        from .common import _BNState, _ConvBNState, _ConvKernel

        k1, s1, b1, m1, v1 = _ConvBNState(width, k_in, name="cb1")()
        k2 = _ConvKernel((3, 3, width, width), name="conv2")()
        s2, b2, m2, v2 = _BNState(width, name="bn2")()
        k3, s3, b3, m3, v3 = _ConvBNState(c_out, width, name="cb3")()
        xb = x.astype(self.dtype)

        if train:
            y, stats = bottleneck_train(xb, k1, s1, b1, k2, s2, b2,
                                        k3, s3, b3)
            if not self.is_initializing():
                st = jax.lax.stop_gradient(stats)
                mom = 0.9  # == ConvBN bn_momentum / FastBatchNorm default
                for ref, new in zip((m1, v1, m2, v2, m3, v3), st):
                    ref.value = mom * ref.value + (1 - mom) * new
            return y
        return block_eval_jnp(
            xb, k1, s1, b1, k2, s2, b2, k3, s3, b3,
            (m1.value, v1.value, m2.value, v2.value, m3.value, v3.value))


_BLOCKS = {"basic": BasicBlock, "bottleneck": Bottleneck}


class ResNetTrunk(nn.Module):
    """conv1..layer4 trunk; returns the final feature map (NHWC).

    ``return_stages=True`` returns all four stage outputs (the reference's
    ``featuremaps`` returning 4 stages, ``resnet.py:558-575``) for actmap
    visualization and the pfnet fusion taps.
    """

    block: str = "bottleneck"
    layers: Sequence[int] = (3, 4, 6, 3)
    groups: int = 1
    width_per_group: int = 64
    last_stride: int = 2
    num_stages: int = 4  # <4 truncates the trunk (e.g. resnetmid's 3-stage base)
    dtype: Any = jnp.bfloat16
    fused_1x1: bool | None = None  # None = auto (TPU only)
    block_megakernel: bool | None = None  # Pallas whole-block backward

    @property
    def feature_dim(self) -> int:
        return 512 * _BLOCKS[self.block].expansion

    @nn.compact
    def __call__(self, x, train: bool = False, return_stages: bool = False,
                 units=None):
        """``units`` (pipeline parallelism, parallel/pipeline.py): run only a
        CONTIGUOUS slice of the trunk's units — unit 0 is stem+maxpool+layer1,
        unit k is layer{k+1}. When the slice starts past unit 0, ``x`` is the
        previous unit's feature map, not an image. Module names are explicit,
        so the params materialized by a slice are exactly the matching subtree
        of the full trunk's params."""
        block_cls = _BLOCKS[self.block]
        fused = resolve_fused_1x1(self.fused_1x1) and self.block == "bottleneck"
        mk = resolve_block_megakernel(self.block_megakernel) \
            and self.block == "bottleneck"
        if units is None:
            units = tuple(range(self.num_stages))
        units = tuple(sorted(int(u) for u in units))
        if units != tuple(range(units[0], units[-1] + 1)):
            raise ValueError(f"trunk units must be contiguous, got {units}")
        if units[-1] >= self.num_stages:
            raise ValueError(
                f"unit {units[-1]} out of range for a {self.num_stages}-stage "
                "trunk")
        x = x.astype(self.dtype)
        if 0 in units:
            x = ConvBN(
                64, (7, 7), (2, 2), ((3, 3), (3, 3)), nonlinear="relu",
                dtype=self.dtype, name="stem",
            )(x, train)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))

        stages = []
        planes = (64, 128, 256, 512)[: self.num_stages]
        strides = (1, 2, 2, self.last_stride)[: self.num_stages]
        in_planes = 64
        for stage_idx, (p, n_blocks, s) in enumerate(
            zip(planes, self.layers, strides)
        ):
            if stage_idx in units:
                for b in range(n_blocks):
                    stride = s if b == 0 else 1
                    needs_down = b == 0 and (
                        stride != 1 or in_planes != p * block_cls.expansion
                    )
                    extra = {"fused_1x1": fused, "block_megakernel": mk} \
                        if self.block == "bottleneck" else {}
                    x = block_cls(
                        planes=p,
                        strides=stride,
                        downsample=needs_down,
                        groups=self.groups,
                        base_width=self.width_per_group,
                        dtype=self.dtype,
                        name=f"layer{stage_idx + 1}_{b}",
                        **extra,
                    )(x, train)
                stages.append(x)
            in_planes = p * block_cls.expansion
        if return_stages:
            return tuple(stages)
        return x


class ReIDResNet(nn.Module):
    """Classic single-modal reID model: trunk + global avgpool
    [+ fc512-style neck] + classifier (reference ``resnet.py:187-399``;
    the unused ``camid`` forward arg is dropped per SURVEY known-quirk list).

    Train: logits (softmax) or (logits, features) (triplet).
    Eval: pooled feature vector.
    """

    num_classes: int = 1000
    loss: str = "softmax"
    block: str = "bottleneck"
    layers: Sequence[int] = (3, 4, 6, 3)
    groups: int = 1
    width_per_group: int = 64
    last_stride: int = 2
    fc_dims: Sequence[int] | None = None
    dropout_p: float | None = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, return_featuremaps: bool = False,
                 pp_units=None):
        """``pp_units`` (pipeline parallelism): a contiguous slice of the 5
        logical units — 0..3 are the trunk's units (see ``ResNetTrunk``),
        4 is the pool+neck+classifier head. A slice without unit 4 returns
        the feature map for the next stage; a slice starting past unit 0
        takes a feature map as ``x``."""
        trunk_units = None
        if pp_units is not None:
            pp_units = tuple(sorted(int(u) for u in pp_units))
            if not pp_units or pp_units[-1] > 4 or pp_units[0] < 0:
                raise ValueError(
                    f"pp_units out of range: {pp_units} (5 logical units, "
                    "0..4)")
            trunk_units = tuple(u for u in pp_units if u < 4)
        if pp_units is None or trunk_units:
            f = ResNetTrunk(
                block=self.block,
                layers=self.layers,
                groups=self.groups,
                width_per_group=self.width_per_group,
                last_stride=self.last_stride,
                dtype=self.dtype,
                name="trunk",
            )(x, train, units=trunk_units)
        else:
            f = x
        if pp_units is not None and 4 not in pp_units:
            return f
        if return_featuremaps:
            return f
        v = global_avg_pool(f).astype(jnp.float32)

        if self.fc_dims:
            for i, dim in enumerate(self.fc_dims):
                v = DenseBNReLU(dim, dtype=self.dtype, name=f"fc{i}")(v, train)
                if self.dropout_p and train:
                    v = nn.Dropout(rate=self.dropout_p, deterministic=not train)(v)
            v = v.astype(jnp.float32)

        if not train:
            return v

        y = nn.Dense(
            self.num_classes,
            kernel_init=dense_init,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="classifier",
        )(v)
        if self.loss == "softmax":
            return y
        if self.loss == "triplet":
            return y, v
        raise KeyError(f"Unsupported loss: {self.loss}")


class ResNetIEEE3Modal(nn.Module):
    """Analog of the reference's ``ResNetIEEE_3modal``
    (``resnet.py:639-880``): ``forward(rest, one_feat)`` runs the trunk over
    ``rest`` and returns the layer-4 map. The reference's per-stage
    cross-modal fusion calls are commented out in its own forward
    (``resnet.py:860-880``), leaving only a side branch —
    ``improveChannel(upsample_4x(one_feat))`` — whose output is discarded.
    The fusion parameters (improveChannel / convOne_layer / convAvgRest_layer
    / CA_layer at the layer-3 width) are declared here for checkpoint-tree
    parity; XLA dead-code-eliminates their forward cost."""

    block: str = "bottleneck"
    layers: Sequence[int] = (3, 4, 6, 3)
    last_stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, rest, one_feat=None, train: bool = False):
        import jax

        # the reference's dead side branch (output discarded there too);
        # runs unconditionally so the params always materialize — XLA
        # dead-code-eliminates the compute since nothing consumes it
        if one_feat is None:
            one_feat = jnp.zeros((rest.shape[0], 1, 1, 2048), self.dtype)
        up = jax.image.resize(
            one_feat,
            (one_feat.shape[0], one_feat.shape[1] * 4,
             one_feat.shape[2] * 4, one_feat.shape[3]),
            method="bilinear",
        )
        _ = ConvBN(1024, (1, 1), nonlinear="relu", dtype=self.dtype,
                   name="improveChannel")(up, train)
        # (the reference also declares never-called per-stage fusion modules
        # — convOne_layer / convAvgRest_layer / CA_layer; they receive no
        # gradient and are omitted here: flax only materializes called
        # modules, and no registered factory ever loads this variant's
        # checkpoints)
        return ResNetTrunk(
            block=self.block, layers=tuple(self.layers),
            last_stride=self.last_stride, dtype=self.dtype, name="trunk",
        )(rest, train)


def make_trunk(name: str = "resnet50", last_stride: int = 2, dtype=jnp.bfloat16):
    block, layers, groups, wpg = RESNET_SPECS[name]
    return partial(
        ResNetTrunk,
        block=block,
        layers=layers,
        groups=groups,
        width_per_group=wpg,
        last_stride=last_stride,
        dtype=dtype,
    )
