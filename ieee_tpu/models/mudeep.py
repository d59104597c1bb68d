"""MuDeep — multi-scale deep architecture (Qian et al., ICCV 2017).

Reference analog: ``torchreid/models/mudeep.py`` (256 LoC): conv stem,
multi-scale-A, reduction, multi-scale-B streams fused by learned per-channel
saliency weights, 4096-d fc feature. The fork's forward drops the classifier;
applied here as the published model does (documented divergence). Input
fixed at 256x128 (the fc is sized for a 16x8 map).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .common import conv_kaiming_init, dense_init


class ConvBlock(nn.Module):
    features: int
    kernel: Tuple[int, int]
    strides: int = 1
    padding: Tuple[int, int] = (0, 0)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, tuple(self.kernel),
                    strides=(self.strides, self.strides),
                    padding=((self.padding[0], self.padding[0]),
                             (self.padding[1], self.padding[1])),
                    use_bias=True, kernel_init=conv_kaiming_init,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn")(x)
        return nn.relu(x.astype(self.dtype))


class MuDeep(nn.Module):
    num_classes: int = 100
    loss: str = "softmax"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False, return_featuremaps=False):
        cb = lambda f, k, s, p, n: ConvBlock(f, k, s, p, dtype=self.dtype,
                                             name=n)
        x = x.astype(self.dtype)
        # block1: stem
        x = cb(48, (3, 3), 1, (1, 1), "conv1")(x, train)
        x = cb(96, (3, 3), 1, (1, 1), "conv2")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        # block2: multi-scale A
        s1 = cb(24, (3, 3), 1, (1, 1), "a_s1b")(
            cb(96, (1, 1), 1, (0, 0), "a_s1a")(x, train), train)
        s2 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        s2 = cb(24, (1, 1), 1, (0, 0), "a_s2")(s2, train)
        s3 = cb(24, (1, 1), 1, (0, 0), "a_s3")(x, train)
        s4 = cb(24, (3, 3), 1, (1, 1), "a_s4c")(
            cb(24, (3, 3), 1, (1, 1), "a_s4b")(
                cb(16, (1, 1), 1, (0, 0), "a_s4a")(x, train), train), train)
        x = jnp.concatenate([s1, s2, s3, s4], axis=-1)  # 96

        # block3: reduction
        r1 = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        r2 = cb(96, (3, 3), 2, (1, 1), "r_s2")(x, train)
        r3 = cb(64, (3, 3), 2, (1, 1), "r_s3c")(
            cb(56, (3, 3), 1, (1, 1), "r_s3b")(
                cb(48, (1, 1), 1, (0, 0), "r_s3a")(x, train), train), train)
        x = jnp.concatenate([r1, r2, r3], axis=-1)  # 256

        # block4: multi-scale B (4 streams kept separate)
        b1 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        b1 = cb(256, (1, 1), 1, (0, 0), "b_s1")(b1, train)
        b2 = cb(256, (3, 1), 1, (1, 0), "b_s2c")(
            cb(128, (1, 3), 1, (0, 1), "b_s2b")(
                cb(64, (1, 1), 1, (0, 0), "b_s2a")(x, train), train), train)
        b3 = cb(256, (1, 1), 1, (0, 0), "b_s3")(x, train)
        b4 = cb(256, (3, 1), 1, (1, 0), "b_s4e")(
            cb(128, (1, 3), 1, (0, 1), "b_s4d")(
                cb(128, (3, 1), 1, (1, 0), "b_s4c")(
                    cb(64, (1, 3), 1, (0, 1), "b_s4b")(
                        cb(64, (1, 1), 1, (0, 0), "b_s4a")(x, train),
                        train), train), train), train)

        # block5: saliency fusion — learned per-channel weights per stream
        def w(name):
            return self.param(name, nn.initializers.uniform(scale=1.0),
                              (1, 1, 1, 256), jnp.float32).astype(self.dtype)

        fused = w("a1") * b1 + w("a2") * b2 + w("a3") * b3 + w("a4") * b4
        fused = nn.avg_pool(fused, (4, 4), strides=(4, 4))
        if return_featuremaps:
            return fused

        # reference flattens NCHW (B, 256, 16, 8) C-order (mudeep.py:191);
        # permute to channel-major so fc weights are layout-compatible
        v = jnp.transpose(fused, (0, 3, 1, 2)).reshape(
            fused.shape[0], -1).astype(jnp.float32)
        v = nn.Dense(4096, kernel_init=dense_init, dtype=jnp.float32,
                     param_dtype=jnp.float32, name="fc")(v)
        v = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32,
                                 param_dtype=jnp.float32, name="fc_bn")(v))
        if not train:
            return v
        y = nn.Dense(self.num_classes, kernel_init=dense_init,
                     dtype=jnp.float32, param_dtype=jnp.float32,
                     name="classifier")(v)
        if self.loss == "softmax":
            return y
        if self.loss == "triplet":
            return y, v
        raise KeyError(f"Unsupported loss: {self.loss}")
