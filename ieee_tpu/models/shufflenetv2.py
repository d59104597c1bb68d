"""ShuffleNetV2 trunk (reference ``torchreid/models/shufflenetv2.py``, 262 LoC:
channel-split units with channel shuffle; width variants x0.5/x1.0/x1.5/x2.0)."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import conv_kaiming_init

SHUFFLENETV2_CFG = {
    "shufflenet_v2_x0_5": ((4, 8, 4), (24, 48, 96, 192, 1024)),
    "shufflenet_v2_x1_0": ((4, 8, 4), (24, 116, 232, 464, 1024)),
    "shufflenet_v2_x1_5": ((4, 8, 4), (24, 176, 352, 704, 1024)),
    "shufflenet_v2_x2_0": ((4, 8, 4), (24, 244, 488, 976, 2048)),
}


def _channel_shuffle(x, groups=2):
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


class _CBR(nn.Module):
    features: int
    kernel: int = 1
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
        return nn.relu(x) if self.act else x


class ShuffleV2Unit(nn.Module):
    features: int  # total output channels
    strides: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        half = self.features // 2
        if self.strides == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
            branch = _CBR(half, 1, dtype=self.dtype, name="b2_1")(x2, train)
            branch = _CBR(half, 3, 1, groups=half, act=False,
                          dtype=self.dtype, name="b2_dw")(branch, train)
            branch = _CBR(half, 1, dtype=self.dtype, name="b2_2")(branch, train)
            out = jnp.concatenate([x1, branch], axis=-1)
        else:
            left = _CBR(x.shape[-1], 3, self.strides, groups=x.shape[-1],
                        act=False, dtype=self.dtype, name="b1_dw")(x, train)
            left = _CBR(half, 1, dtype=self.dtype, name="b1_1")(left, train)
            right = _CBR(half, 1, dtype=self.dtype, name="b2_1")(x, train)
            right = _CBR(half, 3, self.strides, groups=half, act=False,
                         dtype=self.dtype, name="b2_dw")(right, train)
            right = _CBR(half, 1, dtype=self.dtype, name="b2_2")(right, train)
            out = jnp.concatenate([left, right], axis=-1)
        return _channel_shuffle(out)


class ShuffleNetV2Trunk(nn.Module):
    stages_repeats: Sequence[int] = (4, 8, 4)
    stages_out: Sequence[int] = (24, 116, 232, 464, 1024)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        x = _CBR(self.stages_out[0], 3, 2, dtype=self.dtype, name="conv1")(
            x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (reps, out_ch) in enumerate(
            zip(self.stages_repeats, self.stages_out[1:4])
        ):
            for i in range(reps):
                x = ShuffleV2Unit(out_ch, 2 if i == 0 else 1,
                                  dtype=self.dtype,
                                  name=f"stage{stage + 2}_{i}")(x, train)
        return _CBR(self.stages_out[4], 1, dtype=self.dtype, name="conv5")(
            x, train)
