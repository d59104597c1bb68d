"""Inception-v4 trunk (reference ``torchreid/models/inceptionv4.py``, 381
LoC: stem + 4xInceptionA + ReductionA + 7xInceptionB + ReductionB +
3xInceptionC -> 1536 channels)."""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .common import conv_kaiming_init


class BasicConv(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: int = 1
    padding: Tuple[int, int] = (0, 0)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, tuple(self.kernel),
                    strides=(self.strides, self.strides),
                    padding=((self.padding[0], self.padding[0]),
                             (self.padding[1], self.padding[1])),
                    use_bias=False, kernel_init=conv_kaiming_init,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn")(x)
        return nn.relu(x.astype(self.dtype))


class InceptionV4Trunk(nn.Module):
    dtype: Any = jnp.bfloat16

    def _bc(self, f, k, s, p, name):
        return BasicConv(f, k, s, p, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x, train=False):
        bc = self._bc
        mp = lambda z, s=2: nn.max_pool(z, (3, 3), strides=(s, s))
        # reference branch pools use count_include_pad=False
        # (inceptionv4.py:134,202,275)
        ap3 = lambda z: nn.avg_pool(z, (3, 3), strides=(1, 1),
                                    padding=((1, 1), (1, 1)),
                                    count_include_pad=False)
        x = x.astype(self.dtype)
        # stem
        x = bc(32, (3, 3), 2, (0, 0), "s1")(x, train)
        x = bc(32, (3, 3), 1, (0, 0), "s2")(x, train)
        x = bc(64, (3, 3), 1, (1, 1), "s3")(x, train)
        x = jnp.concatenate(
            [mp(x), bc(96, (3, 3), 2, (0, 0), "s4")(x, train)], axis=-1)
        b1 = bc(96, (3, 3), 1, (0, 0), "s5b")(
            bc(64, (1, 1), 1, (0, 0), "s5a")(x, train), train)
        b2 = bc(64, (1, 1), 1, (0, 0), "s6a")(x, train)
        b2 = bc(64, (1, 7), 1, (0, 3), "s6b")(b2, train)
        b2 = bc(64, (7, 1), 1, (3, 0), "s6c")(b2, train)
        b2 = bc(96, (3, 3), 1, (0, 0), "s6d")(b2, train)
        x = jnp.concatenate([b1, b2], axis=-1)
        x = jnp.concatenate(
            [bc(192, (3, 3), 2, (0, 0), "s7")(x, train), mp(x)], axis=-1)

        def inception_a(h, i):
            p = f"a{i}_"
            s0 = bc(96, (1, 1), 1, (0, 0), p + "s0")(h, train)
            s1 = bc(96, (3, 3), 1, (1, 1), p + "s1b")(
                bc(64, (1, 1), 1, (0, 0), p + "s1a")(h, train), train)
            s2 = bc(96, (3, 3), 1, (1, 1), p + "s2c")(
                bc(96, (3, 3), 1, (1, 1), p + "s2b")(
                    bc(64, (1, 1), 1, (0, 0), p + "s2a")(h, train), train),
                train)
            s3 = bc(96, (1, 1), 1, (0, 0), p + "s3")(ap3(h), train)
            return jnp.concatenate([s0, s1, s2, s3], axis=-1)

        for i in range(4):
            x = inception_a(x, i)

        # reduction A
        r0 = bc(384, (3, 3), 2, (0, 0), "ra0")(x, train)
        r1 = bc(256, (3, 3), 2, (0, 0), "ra1c")(
            bc(224, (3, 3), 1, (1, 1), "ra1b")(
                bc(192, (1, 1), 1, (0, 0), "ra1a")(x, train), train), train)
        x = jnp.concatenate([r0, r1, mp(x)], axis=-1)

        def inception_b(h, i):
            p = f"b{i}_"
            s0 = bc(384, (1, 1), 1, (0, 0), p + "s0")(h, train)
            s1 = bc(224, (1, 7), 1, (0, 3), p + "s1b")(
                bc(192, (1, 1), 1, (0, 0), p + "s1a")(h, train), train)
            s1 = bc(256, (7, 1), 1, (3, 0), p + "s1c")(s1, train)
            s2 = bc(192, (1, 1), 1, (0, 0), p + "s2a")(h, train)
            s2 = bc(192, (7, 1), 1, (3, 0), p + "s2b")(s2, train)
            s2 = bc(224, (1, 7), 1, (0, 3), p + "s2c")(s2, train)
            s2 = bc(224, (7, 1), 1, (3, 0), p + "s2d")(s2, train)
            s2 = bc(256, (1, 7), 1, (0, 3), p + "s2e")(s2, train)
            s3 = bc(128, (1, 1), 1, (0, 0), p + "s3")(ap3(h), train)
            return jnp.concatenate([s0, s1, s2, s3], axis=-1)

        for i in range(7):
            x = inception_b(x, i)

        # reduction B
        r0 = bc(192, (1, 1), 1, (0, 0), "rb0a")(x, train)
        r0 = bc(192, (3, 3), 2, (0, 0), "rb0b")(r0, train)
        r1 = bc(256, (1, 1), 1, (0, 0), "rb1a")(x, train)
        r1 = bc(256, (1, 7), 1, (0, 3), "rb1b")(r1, train)
        r1 = bc(320, (7, 1), 1, (3, 0), "rb1c")(r1, train)
        r1 = bc(320, (3, 3), 2, (0, 0), "rb1d")(r1, train)
        x = jnp.concatenate([r0, r1, mp(x)], axis=-1)

        def inception_c(h, i):
            p = f"c{i}_"
            s0 = bc(256, (1, 1), 1, (0, 0), p + "s0")(h, train)
            s1 = bc(384, (1, 1), 1, (0, 0), p + "s1a")(h, train)
            s1 = jnp.concatenate([
                bc(256, (1, 3), 1, (0, 1), p + "s1b")(s1, train),
                bc(256, (3, 1), 1, (1, 0), p + "s1c")(s1, train),
            ], axis=-1)
            s2 = bc(384, (1, 1), 1, (0, 0), p + "s2a")(h, train)
            s2 = bc(448, (3, 1), 1, (1, 0), p + "s2b")(s2, train)
            s2 = bc(512, (1, 3), 1, (0, 1), p + "s2c")(s2, train)
            s2 = jnp.concatenate([
                bc(256, (1, 3), 1, (0, 1), p + "s2d")(s2, train),
                bc(256, (3, 1), 1, (1, 0), p + "s2e")(s2, train),
            ], axis=-1)
            s3 = bc(256, (1, 1), 1, (0, 0), p + "s3")(ap3(h), train)
            return jnp.concatenate([s0, s1, s2, s3], axis=-1)

        for i in range(3):
            x = inception_c(x, i)
        return x  # (B, h', w', 1536)
