"""MobileNetV2 trunk (reference ``torchreid/models/mobilenetv2.py``, 274 LoC:
inverted-residual bottlenecks with expansion 6, width multipliers 1.0/1.4;
reID head is global pool + fc).

Reference-faithful details (both verified by the converter parity test):
 - channel widths are ``int(c * width_mult)`` (``mobilenetv2.py:95-117``),
   NOT torchvision's make_divisible rounding;
 - the 1x1 expansion conv exists even at expansion factor 1
   (``mobilenetv2.py:50`` — conv1 is unconditional).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .common import conv_kaiming_init

# (expansion t, channels c, repeats n, stride s) — reference _make_layer calls
_CFG = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


class _ConvBNReLU6(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    padding=((pad, pad), (pad, pad)),
                    feature_group_count=self.groups, use_bias=False,
                    kernel_init=conv_kaiming_init, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn")(x)
        x = x.astype(self.dtype)
        return jnp.minimum(nn.relu(x), 6.0) if self.act else x


class InvertedResidual(nn.Module):
    features: int
    strides: int
    expand: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand
        use_res = self.strides == 1 and in_ch == self.features
        # the reference's Bottleneck.conv1 is unconditional — present even
        # when expansion_factor == 1 (mobilenetv2.py:50)
        h = _ConvBNReLU6(hidden, 1, dtype=self.dtype, name="expand")(x, train)
        h = _ConvBNReLU6(hidden, 3, self.strides, groups=hidden,
                         dtype=self.dtype, name="dw")(h, train)
        h = _ConvBNReLU6(self.features, 1, act=False, dtype=self.dtype,
                         name="project")(h, train)
        return x + h if use_res else h


class MobileNetV2Trunk(nn.Module):
    width_mult: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        in_ch = int(32 * self.width_mult)
        x = _ConvBNReLU6(in_ch, 3, 2, dtype=self.dtype, name="conv1")(x, train)
        idx = 0
        for t, c, n, s in _CFG:
            out_ch = int(c * self.width_mult)
            for i in range(n):
                x = InvertedResidual(out_ch, s if i == 0 else 1, t,
                                     dtype=self.dtype,
                                     name=f"block{idx}")(x, train)
                idx += 1
        last = int(1280 * self.width_mult) if self.width_mult > 1 else 1280
        return _ConvBNReLU6(last, 1, dtype=self.dtype, name="conv_last")(
            x, train)
