"""OSNet — omni-scale network for person re-ID (Zhou et al., ICCV 2019).

Reference analog: ``torchreid/models/osnet.py`` (587 LoC) — conv stem, three
stages of OS blocks with multi-scale Lite-3x3 streams fused by a unified
aggregation gate, transition 1x1 conv + 2x2 avgpool between stages, final
1x1 conv + global pool + fc512 head. Re-expressed in flax/NHWC; the
aggregation gate's channel-MLP runs once and gates every stream (shared
weights, as the reference's ChannelGate).

Factories: osnet_x1_0 / x0_75 / x0_5 / x0_25 / ibn variants follow the
reference width multipliers (``osnet.py`` factory section).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import conv_kaiming_init, dense_init, global_avg_pool

__all__ = ["OSNet", "OSNET_WIDTHS"]

OSNET_WIDTHS = {
    "osnet_x1_0": [64, 256, 384, 512],
    "osnet_x0_75": [48, 192, 288, 384],
    "osnet_x0_5": [32, 128, 192, 256],
    "osnet_x0_25": [16, 64, 96, 128],
}


class _ConvBNReLU(nn.Module):
    features: int
    kernel: int = 1
    strides: int = 1
    groups: int = 1
    relu: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.strides, self.strides),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.groups, use_bias=False,
            kernel_init=conv_kaiming_init, dtype=self.dtype,
            param_dtype=jnp.float32, name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn")(x)
        x = x.astype(self.dtype)
        return nn.relu(x) if self.relu else x


class LightConv3x3(nn.Module):
    """1x1 conv + depthwise 3x3 (reference ``osnet.py`` LightConv3x3)."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    kernel_init=conv_kaiming_init, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=self.features, use_bias=False,
                    kernel_init=conv_kaiming_init, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn")(x)
        return nn.relu(x.astype(self.dtype))


class ChannelGate(nn.Module):
    """Unified aggregation gate: squeeze-MLP -> sigmoid channel gate."""

    features: int
    reduction: int = 16
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        v = global_avg_pool(x)
        v = nn.Dense(self.features // self.reduction, use_bias=True,
                     dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(v)
        v = nn.relu(v)
        v = nn.Dense(self.features, use_bias=True, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc2")(v)
        gate = nn.sigmoid(v.astype(jnp.float32)).astype(x.dtype)
        return x * gate[:, None, None, :]


class OSBlock(nn.Module):
    """Omni-scale residual block: 4 streams of 1..4 stacked Lite-3x3 convs,
    gated sum, 1x1 expand, residual.

    ``in_norm=True`` = the OSBlockINin variant of OSNet-AIN: conv3 drops its
    BatchNorm (``Conv1x1Linear(..., bn=False)``) and instance normalization
    is applied to the expanded features inside the residual (reference
    ``osnet_ain.py:271-300``). ``post_in=True`` = the osnet.py OSBlock with
    ``IN=True`` used by osnet_ibn: IN is applied AFTER the residual add,
    before the relu (reference ``osnet.py:258-277``)."""

    features: int
    bottleneck_reduction: int = 4
    in_norm: bool = False
    post_in: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.features // self.bottleneck_reduction
        identity = x
        x1 = _ConvBNReLU(mid, 1, dtype=self.dtype, name="conv1")(x, train)

        gate = ChannelGate(mid, dtype=self.dtype, name="gate")
        streams = []
        for t in range(1, 5):  # stream t has t stacked Lite-3x3 convs
            s = x1
            for d in range(t):
                s = LightConv3x3(mid, dtype=self.dtype,
                                 name=f"conv2_{t}_{d}")(s, train)
            streams.append(gate(s))
        x2 = sum(streams)

        if self.in_norm:
            # Conv1x1Linear(bn=False) + IN inside the residual
            x3 = nn.Conv(self.features, (1, 1), use_bias=False,
                         kernel_init=conv_kaiming_init, dtype=self.dtype,
                         param_dtype=jnp.float32, name="conv3")(x2)
            x3 = nn.GroupNorm(num_groups=x3.shape[-1], epsilon=1e-5,
                              dtype=jnp.float32, param_dtype=jnp.float32,
                              name="IN")(x3).astype(self.dtype)
        else:
            x3 = _ConvBNReLU(self.features, 1, relu=False, dtype=self.dtype,
                             name="conv3")(x2, train)
        if identity.shape[-1] != self.features:
            identity = _ConvBNReLU(self.features, 1, relu=False,
                                   dtype=self.dtype, name="downsample")(
                identity, train)
        out = x3 + identity
        if self.post_in:
            out = nn.GroupNorm(num_groups=out.shape[-1], epsilon=1e-5,
                               dtype=jnp.float32, param_dtype=jnp.float32,
                               name="IN")(out).astype(self.dtype)
        return nn.relu(out)


class OSNet(nn.Module):
    num_classes: int = 1000
    loss: str = "softmax"
    widths: Sequence[int] = (64, 256, 384, 512)
    blocks_per_stage: Sequence[int] = (2, 2, 2)
    feature_dim: int = 512
    conv1_IN: bool = False  # osnet_ibn / osnet_ain stem instance norm
    # per-stage tuple of per-block in_norm flags (OSNet-AIN mixed pattern)
    in_pattern: Sequence[Sequence[bool]] = ((False, False),) * 3
    # per-stage tuple of per-block post-add IN flags (osnet_ibn: stage 1)
    post_in_pattern: Sequence[Sequence[bool]] = ((False, False),) * 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, return_featuremaps: bool = False):
        w = list(self.widths)
        x = x.astype(self.dtype)
        # stem: 7x7/2 conv + 3x3/2 maxpool
        if self.conv1_IN:
            x = nn.Conv(w[0], (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="conv1_conv")(x)
            x = nn.GroupNorm(num_groups=w[0], epsilon=1e-5,
                             dtype=jnp.float32, param_dtype=jnp.float32,
                             name="conv1_in")(x)
            x = nn.relu(x.astype(self.dtype))
        else:
            x = _ConvBNReLU(w[0], 7, strides=2, dtype=self.dtype,
                            name="conv1")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for stage in range(3):
            for b in range(self.blocks_per_stage[stage]):
                in_norm = bool(self.in_pattern[stage][b])
                post_in = bool(self.post_in_pattern[stage][b])
                x = OSBlock(w[stage + 1], in_norm=in_norm, post_in=post_in,
                            dtype=self.dtype,
                            name=f"conv{stage + 2}_{b}")(x, train)
            if stage < 2:  # transition: 1x1 conv + 2x2 avgpool
                x = _ConvBNReLU(w[stage + 1], 1, dtype=self.dtype,
                                name=f"transition{stage + 2}")(x, train)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        x = _ConvBNReLU(w[3], 1, dtype=self.dtype, name="conv5")(x, train)
        if return_featuremaps:
            return x

        v = global_avg_pool(x).astype(jnp.float32)
        # fc head (osnet uses fc512 + bn + relu)
        v = nn.Dense(self.feature_dim, kernel_init=dense_init,
                     dtype=jnp.float32, param_dtype=jnp.float32, name="fc")(v)
        v = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="fc_bn")(v)
        v = nn.relu(v)

        if not train:
            return v
        y = nn.Dense(self.num_classes, kernel_init=dense_init,
                     dtype=jnp.float32, param_dtype=jnp.float32,
                     name="classifier")(v)
        if self.loss == "softmax":
            return y
        if self.loss == "triplet":
            return y, v
        raise KeyError(f"Unsupported loss: {self.loss}")
