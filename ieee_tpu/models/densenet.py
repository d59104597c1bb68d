"""DenseNet trunk (reference ``torchreid/models/densenet.py``, 380 LoC:
dense blocks with BN-ReLU-1x1-BN-ReLU-3x3 layers, transition halving;
121/169/201/161 configs)."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import conv_kaiming_init

DENSENET_CFG = {
    # (growth_rate, block_config, num_init_features)
    "densenet121": (32, (6, 12, 24, 16), 64),
    "densenet169": (32, (6, 12, 32, 32), 64),
    "densenet201": (32, (6, 12, 48, 32), 64),
    "densenet161": (48, (6, 12, 36, 24), 96),
}


class _BNReLUConv(nn.Module):
    features: int
    kernel: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn")(x)
        x = nn.relu(x.astype(self.dtype))
        pad = self.kernel // 2
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       padding=((pad, pad), (pad, pad)), use_bias=False,
                       kernel_init=conv_kaiming_init, dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv")(x)


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        h = _BNReLUConv(self.bn_size * self.growth_rate, 1, dtype=self.dtype,
                        name="l1")(x, train)
        h = _BNReLUConv(self.growth_rate, 3, dtype=self.dtype, name="l2")(
            h, train)
        return jnp.concatenate([x, h], axis=-1)


class DenseNetTrunk(nn.Module):
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    num_init_features: int = 64
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        x = nn.Conv(self.num_init_features, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False,
                    kernel_init=conv_kaiming_init, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn0")(x)
        x = nn.relu(x.astype(self.dtype))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        features = self.num_init_features
        for b, num_layers in enumerate(self.block_config):
            for l in range(num_layers):
                x = DenseLayer(self.growth_rate, dtype=self.dtype,
                               name=f"dense{b + 1}_{l}")(x, train)
            features += num_layers * self.growth_rate
            if b != len(self.block_config) - 1:
                x = _BNReLUConv(features // 2, 1, dtype=self.dtype,
                                name=f"transition{b + 1}")(x, train)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
                features //= 2

        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn_final")(x)
        return nn.relu(x.astype(self.dtype))
