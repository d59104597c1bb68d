"""Generic reID head shared by zoo models: trunk -> global pool ->
[fc neck] -> classifier. Mirrors the head convention every Torchreid zoo
model follows (global avgpool + optional fc_dims + Linear classifier;
train -> logits (softmax) or (logits, v) (triplet); eval -> v)."""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import DenseBNReLU, dense_init, global_avg_pool, global_max_pool


class TrunkWithHead(nn.Module):
    trunk: Callable  # nn.Module factory (partial) taking (name=...)
    num_classes: int
    loss: str = "softmax"
    fc_dims: Sequence[int] | None = None
    dropout_p: float | None = None
    pool: str = "avg"  # 'avg' | 'max' | 'avgmax'
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, return_featuremaps: bool = False):
        try:
            trunk = self.trunk(name="trunk", dtype=self.dtype)
        except TypeError:  # partial with dtype already bound
            trunk = self.trunk(name="trunk")
        f = trunk(x, train)
        if return_featuremaps:
            return f
        if self.pool == "avg":
            v = global_avg_pool(f)
        elif self.pool == "max":
            v = global_max_pool(f)
        else:
            v = global_avg_pool(f) + global_max_pool(f)
        v = v.astype(jnp.float32)

        if self.fc_dims:
            for i, dim in enumerate(self.fc_dims):
                v = DenseBNReLU(dim, dtype=self.dtype, name=f"fc{i}")(v, train)
                if self.dropout_p and train:
                    v = nn.Dropout(rate=self.dropout_p,
                                   deterministic=not train)(v)
            v = v.astype(jnp.float32)

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
