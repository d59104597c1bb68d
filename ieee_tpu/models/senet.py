"""SE-ResNet / SE-ResNeXt trunks (reference ``torchreid/models/senet.py``,
688 LoC: squeeze-excitation bottlenecks; se_resnet50/101/152,
se_resnext50/101 variants, fc512 heads).

Reference-faithful details (verified by the converter parity test):
 - SEResNetBottleneck is Caffe-style — the stage stride sits on conv1, not
   conv2 (``senet.py:180-186``); SEResNeXtBottleneck strides conv2;
 - the stem maxpool uses ``ceil_mode=True`` (``senet.py:355``), emulated in
   NHWC with asymmetric ((0,1),(0,1)) -inf padding;
 - ``senet154`` (``senet.py:530-546``): 3x 3x3 stem to 128 channels,
   154-style blocks (1x1 -> planes*2, grouped 3x3 -> planes*4 with the
   stage stride, groups=64), 3x3 downsample convs in layers 2-4. The
   factory's ``dropout_p=0.2`` is dead in the reference (applied only
   inside fc_dims stacks and senet154 passes ``fc_dims=None``), so no
   dropout here either."""

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
    style_154: bool = False
    down_kernel: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        if self.style_154:
            # SENet154 block (reference senet.py:143-172): conv1 1x1 ->
            # planes*2, conv2 grouped 3x3 -> planes*4 carrying the stage
            # stride, conv3 1x1 planes*4 -> planes*4
            w1, w2 = self.planes * 2, self.planes * 4
            s1, s2 = 1, self.strides
        else:
            w1 = w2 = int(self.planes * (self.base_width / 64.0)) \
                * self.groups
            # reference SEResNetBottleneck (groups==1) puts the stage stride
            # on conv1 (Caffe style, senet.py:180-186); SEResNeXt strides
            # conv2
            s1 = self.strides if self.groups == 1 else 1
            s2 = 1 if self.groups == 1 else self.strides
        out = ConvBN(w1, (1, 1), (s1, s1), nonlinear="relu",
                     dtype=self.dtype, name="cb1")(x, train)
        out = nn.Conv(w2, (3, 3), strides=(s2, s2),
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
            k = self.down_kernel
            identity = ConvBN(self.planes * 4, (k, k),
                              (self.strides, self.strides),
                              ((k // 2, k // 2), (k // 2, k // 2)),
                              nonlinear=None,
                              dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(out + identity)


class SENetTrunk(nn.Module):
    layers: Sequence[int] = (3, 4, 6, 3)
    groups: int = 1
    reduction: int = 16
    width_per_group: int = 64
    last_stride: int = 2
    style_154: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        if self.style_154:
            # SENet154 stem (reference senet.py:325-346, input_3x3=True,
            # inplanes=128): three 3x3 convs 3->64(s2)->64->128
            x = ConvBN(64, (3, 3), (2, 2), ((1, 1), (1, 1)),
                       nonlinear="relu", dtype=self.dtype,
                       name="stem1")(x, train)
            x = ConvBN(64, (3, 3), (1, 1), ((1, 1), (1, 1)),
                       nonlinear="relu", dtype=self.dtype,
                       name="stem2")(x, train)
            x = ConvBN(128, (3, 3), (1, 1), ((1, 1), (1, 1)),
                       nonlinear="relu", dtype=self.dtype,
                       name="stem3")(x, train)
            in_planes = 128
        else:
            x = ConvBN(64, (7, 7), (2, 2), ((3, 3), (3, 3)),
                       nonlinear="relu", dtype=self.dtype,
                       name="stem")(x, train)
            in_planes = 64
        # torch MaxPool2d(3, 2, padding=0, ceil_mode=True): emulate with
        # right/bottom -inf padding only (windows never start in padding)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)))
        planes = (64, 128, 256, 512)
        strides = (1, 2, 2, self.last_stride)
        for stage, (p, n, s) in enumerate(zip(planes, self.layers, strides)):
            # senet154 downsamples layers 2-4 with 3x3/pad-1 convs; layer1
            # (and every non-154 variant) uses 1x1 (senet.py:372-397)
            down_k = 3 if self.style_154 and stage > 0 else 1
            for b in range(n):
                stride = s if b == 0 else 1
                down = b == 0 and (stride != 1 or in_planes != p * 4)
                x = SEBottleneck(p, stride, down, self.groups,
                                 self.width_per_group, self.reduction,
                                 style_154=self.style_154,
                                 down_kernel=down_k, dtype=self.dtype,
                                 name=f"layer{stage + 1}_{b}")(x, train)
            in_planes = p * 4
        return x
