"""Xception trunk (reference ``torchreid/models/xception.py``, 344 LoC:
depthwise-separable conv blocks — entry, 8-block middle, exit flows)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .common import conv_kaiming_init


class SeparableConv(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        c = x.shape[-1]
        x = nn.Conv(c, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    padding=((pad, pad), (pad, pad)), feature_group_count=c,
                    use_bias=False, kernel_init=conv_kaiming_init,
                    dtype=self.dtype, param_dtype=jnp.float32, name="dw")(x)
        return nn.Conv(self.features, (1, 1), use_bias=False,
                       kernel_init=conv_kaiming_init, dtype=self.dtype,
                       param_dtype=jnp.float32, name="pw")(x)


class _BN(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn")(x)
        return x.astype(self.dtype)


class XceptionBlock(nn.Module):
    features: int
    reps: int
    strides: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        skip = x
        if self.features != x.shape[-1] or self.strides != 1:
            skip = nn.Conv(self.features, (1, 1),
                           strides=(self.strides, self.strides),
                           use_bias=False, kernel_init=conv_kaiming_init,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name="skip_conv")(x)
            skip = _BN(self.dtype, name="skip_bn")(skip, train)

        h = x
        filters = x.shape[-1]
        for r in range(self.reps):
            if r > 0 or self.start_with_relu:
                h = nn.relu(h)
            out_f = self.features if (self.grow_first or r == self.reps - 1) \
                else filters
            h = SeparableConv(out_f, dtype=self.dtype, name=f"sep{r}")(h)
            h = _BN(self.dtype, name=f"bn{r}")(h, train)
            filters = out_f
        if self.strides != 1:
            h = nn.max_pool(h, (3, 3), strides=(self.strides, self.strides),
                            padding=((1, 1), (1, 1)))
        return h + skip


class XceptionTrunk(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        # reference stem convs have padding=0 (xception.py:161-164)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding="VALID",
                    use_bias=False,
                    kernel_init=conv_kaiming_init, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        x = nn.relu(_BN(self.dtype, name="bn1")(x, train))
        x = nn.Conv(64, (3, 3), padding="VALID", use_bias=False,
                    kernel_init=conv_kaiming_init, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(x)
        x = nn.relu(_BN(self.dtype, name="bn2")(x, train))

        x = XceptionBlock(128, 2, 2, start_with_relu=False, dtype=self.dtype,
                          name="block1")(x, train)
        x = XceptionBlock(256, 2, 2, dtype=self.dtype, name="block2")(x, train)
        x = XceptionBlock(728, 2, 2, dtype=self.dtype, name="block3")(x, train)
        for i in range(8):  # middle flow
            x = XceptionBlock(728, 3, 1, dtype=self.dtype,
                              name=f"block{i + 4}")(x, train)
        x = XceptionBlock(1024, 2, 2, grow_first=False, dtype=self.dtype,
                          name="block12")(x, train)

        x = SeparableConv(1536, dtype=self.dtype, name="conv3")(x)
        x = nn.relu(_BN(self.dtype, name="bn3")(x, train))
        x = SeparableConv(2048, dtype=self.dtype, name="conv4")(x)
        return nn.relu(_BN(self.dtype, name="bn4")(x, train))
