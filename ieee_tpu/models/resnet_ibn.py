"""IBN-Net ResNets (Pan et al., ECCV 2018).

Reference analog: ``torchreid/models/resnet_ibn_a.py`` (289 LoC — half
InstanceNorm / half BatchNorm after each bottleneck's first 1x1 conv in
layers 1-3) and ``resnet_ibn_b.py`` (274 LoC — IN stem, IN after the last
block of layers 1-2). InstanceNorm is expressed as per-channel GroupNorm
(num_groups == channels), identical math.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import ConvBN, conv_kaiming_init


def _instance_norm(x, name):
    return nn.GroupNorm(num_groups=x.shape[-1], epsilon=1e-5,
                        dtype=jnp.float32, param_dtype=jnp.float32,
                        name=name)(x)


class IBN(nn.Module):
    """Half-IN / half-BN normalization (``resnet_ibn_a.py`` IBN module)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        half = x.shape[-1] // 2
        x1, x2 = x[..., :half], x[..., half:]
        x1 = _instance_norm(x1, "IN")
        x2 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="BN")(x2)
        return jnp.concatenate([x1, x2.astype(x1.dtype)], axis=-1)


class BottleneckIBN(nn.Module):
    planes: int
    strides: int = 1
    downsample: bool = False
    ibn: bool = False  # IBN-a: half-IN bn1
    out_in: bool = False  # IBN-b: IN after residual add
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      kernel_init=conv_kaiming_init, dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv1")(x)
        if self.ibn:
            out = IBN(dtype=self.dtype, name="ibn1")(out, train)
        else:
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, dtype=jnp.float32,
                               param_dtype=jnp.float32, name="bn1")(out)
        out = nn.relu(out.astype(self.dtype))
        out = ConvBN(self.planes, (3, 3), (self.strides, self.strides),
                     ((1, 1), (1, 1)), nonlinear="relu", dtype=self.dtype,
                     name="cb2")(out, train)
        out = ConvBN(self.planes * 4, (1, 1), nonlinear=None,
                     dtype=self.dtype, name="cb3")(out, train)
        if self.downsample:
            identity = ConvBN(self.planes * 4, (1, 1),
                              (self.strides, self.strides), nonlinear=None,
                              dtype=self.dtype, name="downsample")(x, train)
        out = out + identity
        if self.out_in:
            out = _instance_norm(out, "IN_out").astype(self.dtype)
        return nn.relu(out)


class ResNetIBNTrunk(nn.Module):
    variant: str = "a"  # 'a' | 'b'
    layers: Sequence[int] = (3, 4, 6, 3)
    last_stride: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, kernel_init=conv_kaiming_init,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        if self.variant == "b":
            x = _instance_norm(x, "in1").astype(self.dtype)
        else:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             param_dtype=jnp.float32, name="bn1")(x)
            x = x.astype(self.dtype)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        planes = (64, 128, 256, 512)
        strides = (1, 2, 2, self.last_stride)
        in_planes = 64
        for stage, (p, n, s) in enumerate(zip(planes, self.layers, strides)):
            for b in range(n):
                stride = s if b == 0 else 1
                down = b == 0 and (stride != 1 or in_planes != p * 4)
                ibn = self.variant == "a" and p != 512
                out_in = (self.variant == "b" and stage < 2
                          and b == n - 1)
                x = BottleneckIBN(p, stride, down, ibn=ibn, out_in=out_in,
                                  dtype=self.dtype,
                                  name=f"layer{stage + 1}_{b}")(x, train)
            in_planes = p * 4
        return x
