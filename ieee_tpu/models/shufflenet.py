"""ShuffleNet v1 trunk (reference ``torchreid/models/shufflenet.py``, 198
LoC: grouped 1x1 convs + channel shuffle bottlenecks, groups=3)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .common import conv_kaiming_init
from .shufflenetv2 import _channel_shuffle


class _GCBR(nn.Module):
    features: int
    kernel: int = 1
    strides: int = 1
    groups: int = 1
    depthwise: bool = False
    act: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        pad = self.kernel // 2
        gc = x.shape[-1] if self.depthwise else self.groups
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    padding=((pad, pad), (pad, pad)), feature_group_count=gc,
                    use_bias=False, kernel_init=conv_kaiming_init,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn")(x)
        x = x.astype(self.dtype)
        return nn.relu(x) if self.act else x


class ShuffleUnit(nn.Module):
    features: int
    strides: int
    groups: int = 3
    first_group: bool = True  # stage2's first unit skips grouping on 1x1 in
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        bottleneck = self.features // 4
        residual = x
        out_f = self.features - x.shape[-1] if self.strides == 2 \
            else self.features
        g_in = self.groups if self.first_group else 1
        h = _GCBR(bottleneck, 1, groups=g_in, dtype=self.dtype,
                  name="gconv1")(x, train)
        h = _channel_shuffle(h, self.groups)
        h = _GCBR(bottleneck, 3, self.strides, depthwise=True, act=False,
                  dtype=self.dtype, name="dwconv")(h, train)
        h = _GCBR(out_f, 1, groups=self.groups, act=False, dtype=self.dtype,
                  name="gconv2")(h, train)
        if self.strides == 2:
            residual = nn.avg_pool(x, (3, 3), strides=(2, 2),
                                   padding=((1, 1), (1, 1)))
            return nn.relu(jnp.concatenate([residual, h], axis=-1))
        return nn.relu(residual + h)


class ShuffleNetTrunk(nn.Module):
    groups: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        # groups=3 channel config
        stage_out = {1: (144, 288, 576), 2: (200, 400, 800),
                     3: (240, 480, 960), 4: (272, 544, 1088),
                     8: (384, 768, 1536)}[self.groups]
        x = x.astype(self.dtype)
        x = _GCBR(24, 3, 2, dtype=self.dtype, name="conv1")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (out_ch, reps) in enumerate(
            zip(stage_out, (4, 8, 4))
        ):
            for i in range(reps):
                x = ShuffleUnit(
                    out_ch, 2 if i == 0 else 1, self.groups,
                    first_group=not (stage == 0 and i == 0),
                    dtype=self.dtype, name=f"stage{stage + 2}_{i}",
                )(x, train)
        return x
