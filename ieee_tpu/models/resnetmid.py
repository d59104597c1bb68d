"""ResNet-mid: ResNet-50 with mid-level layer-4 feature fusion.

Reference analog: ``torchreid/models/resnetmid.py:95-230``: layer4's three
block outputs are pooled; blocks a+b concat through an fc fusion, then
concatenated with block c's pooled feature (v = [fc(v4a||v4b), v4c]).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import DenseBNReLU, dense_init, global_avg_pool
from .resnet import Bottleneck, ResNetTrunk


class ResNetMid(nn.Module):
    num_classes: int = 100
    loss: str = "softmax"
    layers: Sequence[int] = (3, 4, 6, 3)
    last_stride: int = 2
    fc_dims: Sequence[int] = (1024,)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False, return_featuremaps=False):
        # stages 1-3 via the shared trunk machinery (truncated trunk)
        x3 = ResNetTrunk(block="bottleneck", layers=tuple(self.layers),
                         last_stride=self.last_stride, num_stages=3,
                         dtype=self.dtype, name="trunk3")(x, train)

        # layer4 blocks applied individually to expose mid features
        n4 = self.layers[3]
        outs = []
        h = x3
        in_planes = 1024
        for b in range(n4):
            stride = self.last_stride if b == 0 else 1
            down = b == 0 and (stride != 1 or in_planes != 2048)
            h = Bottleneck(512, stride, down, dtype=self.dtype,
                           name=f"mid4_{b}")(h, train)
            in_planes = 2048
            outs.append(h)
        if return_featuremaps:
            return outs[-1]

        v4a = global_avg_pool(outs[0]).astype(jnp.float32)
        v4b = global_avg_pool(outs[1]).astype(jnp.float32)
        v4c = global_avg_pool(outs[-1]).astype(jnp.float32)
        v4ab = jnp.concatenate([v4a, v4b], axis=1)
        for i, dim in enumerate(self.fc_dims):
            v4ab = DenseBNReLU(dim, dtype=self.dtype,
                               name=f"fc_fusion{i}")(v4ab, train)
        v = jnp.concatenate([v4ab.astype(jnp.float32), v4c], axis=1)

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
