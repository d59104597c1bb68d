"""Model wrapper: a flax module + metadata + variable init.

The engine layer works against this interface; it plays the role the bare
``nn.Module`` instance plays in the reference (``models/__init__.py:80-111``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Tuple

import jax
import jax.numpy as jnp


@dataclass
class ReIDModel:
    """A built model: flax module + how to feed it."""

    module: Any
    name: str
    num_classes: int
    loss: str
    num_streams: int = 1  # 1 = single-modal (B,H,W,3); 3 = (R,N,T) tuple
    feature_dim: int = 2048
    meta: dict = field(default_factory=dict)

    def dummy_input(self, batch: int = 2, height: int = 256, width: int = 128):
        x = jnp.zeros((batch, height, width, 3), jnp.float32)
        if self.num_streams == 1:
            return x
        return tuple(x for _ in range(self.num_streams))

    def init_variables(self, rng, batch: int = 2, height: int = 256, width: int = 128):
        """Initialize {params, batch_stats} with abstract-eval-cheap shapes."""
        if isinstance(rng, int):
            rng = jax.random.PRNGKey(rng)
        # train=True so train-only submodules (classifiers) get params too
        variables = self.module.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
            self.dummy_input(batch, height, width),
            train=True,
        )
        # drop batch_stats updates produced during init
        return {k: v for k, v in variables.items() if k in ("params", "batch_stats")}

    def apply(self, variables, x, train: bool = False, rngs=None, **kwargs):
        if train:
            return self.module.apply(
                variables, x, train=True, mutable=["batch_stats"], rngs=rngs,
                **kwargs,
            )
        return self.module.apply(variables, x, train=False, **kwargs)

    def param_count(self, variables) -> int:
        return sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
