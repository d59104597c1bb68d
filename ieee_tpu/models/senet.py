"""SE-ResNet / SE-ResNeXt trunks (reference ``torchreid/models/senet.py``,
688 LoC: squeeze-excitation bottlenecks; se_resnet50/101/152,
se_resnext50/101 variants, fc512 heads).

Reference-faithful details (verified by the converter parity test):
 - SEResNetBottleneck is Caffe-style — the stage stride sits on conv1, not
   conv2 (``senet.py:180-186``); SEResNeXtBottleneck strides conv2;
 - the stem maxpool uses ``ceil_mode=True`` (``senet.py:355``), emulated in
   NHWC with asymmetric ((0,1),(0,1)) -inf padding."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import ConvBN, conv_kaiming_init, global_avg_pool

SENET_SPECS = {
    # name: (layers, groups, reduction, width_per_group)
    "se_resnet50": ((3, 4, 6, 3), 1, 16, 64),
    "se_resnet101": ((3, 4, 23, 3), 1, 16, 64),
    "se_resnet152": ((3, 8, 36, 3), 1, 16, 64),
    "se_resnext50_32x4d": ((3, 4, 6, 3), 32, 16, 4),
    "se_resnext101_32x4d": ((3, 4, 23, 3), 32, 16, 4),
}


class SEModule(nn.Module):
    reduction: int = 16
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        v = global_avg_pool(x)
        v = nn.relu(nn.Dense(c // self.reduction, dtype=self.dtype,
                             param_dtype=jnp.float32, name="fc1")(v))
        v = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(v)
        gate = nn.sigmoid(v.astype(jnp.float32)).astype(x.dtype)
        return x * gate[:, None, None, :]


class SEBottleneck(nn.Module):
    planes: int
    strides: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    reduction: int = 16
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        # reference SEResNetBottleneck (groups==1) puts the stage stride on
        # conv1 (Caffe style, senet.py:180-186); SEResNeXt strides conv2
        s1 = self.strides if self.groups == 1 else 1
        s2 = 1 if self.groups == 1 else self.strides
        out = ConvBN(width, (1, 1), (s1, s1), nonlinear="relu",
                     dtype=self.dtype, name="cb1")(x, train)
        out = nn.Conv(width, (3, 3), strides=(s2, s2),
                      padding=((1, 1), (1, 1)),
                      feature_group_count=self.groups, use_bias=False,
                      kernel_init=conv_kaiming_init, dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv2")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=jnp.float32,
                           param_dtype=jnp.float32, name="bn2")(out)
        out = nn.relu(out.astype(self.dtype))
        out = ConvBN(self.planes * 4, (1, 1), nonlinear=None,
                     dtype=self.dtype, name="cb3")(out, train)
        out = SEModule(self.reduction, dtype=self.dtype, name="se")(out)
        if self.downsample:
            identity = ConvBN(self.planes * 4, (1, 1),
                              (self.strides, self.strides), nonlinear=None,
                              dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(out + identity)


class SENetTrunk(nn.Module):
    layers: Sequence[int] = (3, 4, 6, 3)
    groups: int = 1
    reduction: int = 16
    width_per_group: int = 64
    last_stride: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        x = ConvBN(64, (7, 7), (2, 2), ((3, 3), (3, 3)), nonlinear="relu",
                   dtype=self.dtype, name="stem")(x, train)
        # torch MaxPool2d(3, 2, padding=0, ceil_mode=True): emulate with
        # right/bottom -inf padding only (windows never start in padding)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)))
        planes = (64, 128, 256, 512)
        strides = (1, 2, 2, self.last_stride)
        in_planes = 64
        for stage, (p, n, s) in enumerate(zip(planes, self.layers, strides)):
            for b in range(n):
                stride = s if b == 0 else 1
                down = b == 0 and (stride != 1 or in_planes != p * 4)
                x = SEBottleneck(p, stride, down, self.groups,
                                 self.width_per_group, self.reduction,
                                 dtype=self.dtype,
                                 name=f"layer{stage + 1}_{b}")(x, train)
            in_planes = p * 4
        return x
