"""SqueezeNet trunk (reference ``torchreid/models/squeezenet.py``, 236 LoC:
Fire modules, v1.0 and v1.1 layouts).

Reference-faithful details (verified by the converter parity test): the stem
conv has NO padding and every maxpool is ``ceil_mode=True``
(``squeezenet.py:80-110``) — emulated with VALID conv and right/bottom-only
-inf pool padding (exact for kernel 3 / stride 2)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .common import conv_kaiming_init


class Fire(nn.Module):
    squeeze: int
    expand1x1: int
    expand3x3: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.squeeze, (1, 1), use_bias=True,
                            kernel_init=conv_kaiming_init, dtype=self.dtype,
                            param_dtype=jnp.float32, name="squeeze")(x))
        e1 = nn.relu(nn.Conv(self.expand1x1, (1, 1), use_bias=True,
                             kernel_init=conv_kaiming_init, dtype=self.dtype,
                             param_dtype=jnp.float32, name="expand1x1")(s))
        e3 = nn.relu(nn.Conv(self.expand3x3, (3, 3),
                             padding=((1, 1), (1, 1)), use_bias=True,
                             kernel_init=conv_kaiming_init, dtype=self.dtype,
                             param_dtype=jnp.float32, name="expand3x3")(s))
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNetTrunk(nn.Module):
    version: str = "1_0"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        del train  # no BN in squeezenet
        x = x.astype(self.dtype)
        mp = lambda z: nn.max_pool(z, (3, 3), strides=(2, 2),
                                   padding=((0, 1), (0, 1)))
        if self.version == "1_0":
            x = nn.relu(nn.Conv(96, (7, 7), strides=(2, 2), padding="VALID",
                                use_bias=True,
                                kernel_init=conv_kaiming_init,
                                dtype=self.dtype, param_dtype=jnp.float32,
                                name="conv1")(x))
            x = mp(x)
            for i, cfg in enumerate([(16, 64, 64), (16, 64, 64),
                                     (32, 128, 128)]):
                x = Fire(*cfg, dtype=self.dtype, name=f"fire{i + 2}")(x)
            x = mp(x)
            for i, cfg in enumerate([(32, 128, 128), (48, 192, 192),
                                     (48, 192, 192), (64, 256, 256)]):
                x = Fire(*cfg, dtype=self.dtype, name=f"fire{i + 5}")(x)
            x = mp(x)
            x = Fire(64, 256, 256, dtype=self.dtype, name="fire9")(x)
        else:  # 1_1
            x = nn.relu(nn.Conv(64, (3, 3), strides=(2, 2), padding="VALID",
                                use_bias=True,
                                kernel_init=conv_kaiming_init,
                                dtype=self.dtype, param_dtype=jnp.float32,
                                name="conv1")(x))
            x = mp(x)
            x = Fire(16, 64, 64, dtype=self.dtype, name="fire2")(x)
            x = Fire(16, 64, 64, dtype=self.dtype, name="fire3")(x)
            x = mp(x)
            x = Fire(32, 128, 128, dtype=self.dtype, name="fire4")(x)
            x = Fire(32, 128, 128, dtype=self.dtype, name="fire5")(x)
            x = mp(x)
            for i, cfg in enumerate([(48, 192, 192), (48, 192, 192),
                                     (64, 256, 256), (64, 256, 256)]):
                x = Fire(*cfg, dtype=self.dtype, name=f"fire{i + 6}")(x)
        return x
