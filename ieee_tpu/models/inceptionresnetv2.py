"""Inception-ResNet-v2 trunk (reference
``torchreid/models/inceptionresnetv2.py``, 361 LoC: stem + 10x block35 +
reduction-A + 20x block17 + reduction-B + 10x block8 + 1536-d conv)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .inceptionv4 import BasicConv


class InceptionResNetV2Trunk(nn.Module):
    dtype: Any = jnp.bfloat16

    def _bc(self, f, k, s, p, name):
        return BasicConv(f, k, s, p, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x, train=False):
        bc = self._bc
        mp = lambda z: nn.max_pool(z, (3, 3), strides=(2, 2))
        x = x.astype(self.dtype)

        # stem
        x = bc(32, (3, 3), 2, (0, 0), "s1")(x, train)
        x = bc(32, (3, 3), 1, (0, 0), "s2")(x, train)
        x = bc(64, (3, 3), 1, (1, 1), "s3")(x, train)
        x = mp(x)
        x = bc(80, (1, 1), 1, (0, 0), "s4")(x, train)
        x = bc(192, (3, 3), 1, (0, 0), "s5")(x, train)
        x = mp(x)

        # mixed_5b -> 320 channels
        b0 = bc(96, (1, 1), 1, (0, 0), "m5b_0")(x, train)
        b1 = bc(48, (1, 1), 1, (0, 0), "m5b_1a")(x, train)
        b1 = bc(64, (5, 5), 1, (2, 2), "m5b_1b")(b1, train)
        b2 = bc(64, (1, 1), 1, (0, 0), "m5b_2a")(x, train)
        b2 = bc(96, (3, 3), 1, (1, 1), "m5b_2b")(b2, train)
        b2 = bc(96, (3, 3), 1, (1, 1), "m5b_2c")(b2, train)
        b3 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                         count_include_pad=False)
        b3 = bc(64, (1, 1), 1, (0, 0), "m5b_3")(b3, train)
        x = jnp.concatenate([b0, b1, b2, b3], axis=-1)

        # 10x block35 (scale 0.17)
        for i in range(10):
            p = f"b35_{i}_"
            b0 = bc(32, (1, 1), 1, (0, 0), p + "0")(x, train)
            b1 = bc(32, (1, 1), 1, (0, 0), p + "1a")(x, train)
            b1 = bc(32, (3, 3), 1, (1, 1), p + "1b")(b1, train)
            b2 = bc(32, (1, 1), 1, (0, 0), p + "2a")(x, train)
            b2 = bc(48, (3, 3), 1, (1, 1), p + "2b")(b2, train)
            b2 = bc(64, (3, 3), 1, (1, 1), p + "2c")(b2, train)
            up = nn.Conv(320, (1, 1), use_bias=True, dtype=self.dtype,
                         param_dtype=jnp.float32, name=p + "up")(
                jnp.concatenate([b0, b1, b2], axis=-1))
            x = nn.relu(x + 0.17 * up)

        # reduction A -> 1088
        r0 = bc(384, (3, 3), 2, (0, 0), "ra_0")(x, train)
        r1 = bc(256, (1, 1), 1, (0, 0), "ra_1a")(x, train)
        r1 = bc(256, (3, 3), 1, (1, 1), "ra_1b")(r1, train)
        r1 = bc(384, (3, 3), 2, (0, 0), "ra_1c")(r1, train)
        x = jnp.concatenate([r0, r1, mp(x)], axis=-1)

        # 20x block17 (scale 0.10)
        for i in range(20):
            p = f"b17_{i}_"
            b0 = bc(192, (1, 1), 1, (0, 0), p + "0")(x, train)
            b1 = bc(128, (1, 1), 1, (0, 0), p + "1a")(x, train)
            b1 = bc(160, (1, 7), 1, (0, 3), p + "1b")(b1, train)
            b1 = bc(192, (7, 1), 1, (3, 0), p + "1c")(b1, train)
            up = nn.Conv(1088, (1, 1), use_bias=True, dtype=self.dtype,
                         param_dtype=jnp.float32, name=p + "up")(
                jnp.concatenate([b0, b1], axis=-1))
            x = nn.relu(x + 0.10 * up)

        # reduction B -> 2080
        r0 = bc(256, (1, 1), 1, (0, 0), "rb_0a")(x, train)
        r0 = bc(384, (3, 3), 2, (0, 0), "rb_0b")(r0, train)
        r1 = bc(256, (1, 1), 1, (0, 0), "rb_1a")(x, train)
        r1 = bc(288, (3, 3), 2, (0, 0), "rb_1b")(r1, train)
        r2 = bc(256, (1, 1), 1, (0, 0), "rb_2a")(x, train)
        r2 = bc(288, (3, 3), 1, (1, 1), "rb_2b")(r2, train)
        r2 = bc(320, (3, 3), 2, (0, 0), "rb_2c")(r2, train)
        x = jnp.concatenate([r0, r1, r2, mp(x)], axis=-1)

        # 9x block8 (scale 0.20) + final block8 (scale 1.0, noReLU) —
        # reference repeat_2 + self.block8 (inceptionresnetv2.py:289-300)
        for i in range(10):
            p = f"b8_{i}_"
            b0 = bc(192, (1, 1), 1, (0, 0), p + "0")(x, train)
            b1 = bc(192, (1, 1), 1, (0, 0), p + "1a")(x, train)
            b1 = bc(224, (1, 3), 1, (0, 1), p + "1b")(b1, train)
            b1 = bc(256, (3, 1), 1, (1, 0), p + "1c")(b1, train)
            up = nn.Conv(2080, (1, 1), use_bias=True, dtype=self.dtype,
                         param_dtype=jnp.float32, name=p + "up")(
                jnp.concatenate([b0, b1], axis=-1))
            if i < 9:
                x = nn.relu(x + 0.20 * up)
            else:
                x = x + up

        return bc(1536, (1, 1), 1, (0, 0), "conv_final")(x, train)
