"""Model complexity: parameter count + FLOPs.

Reference analog: ``torchreid/utils/model_complexity.py`` (per-layer-type
forward hooks). TPU-native approach: params from the variables pytree, FLOPs
from XLA's own cost analysis of the compiled forward — exact for the program
that actually runs, instead of a hook-based estimate.
"""

from __future__ import annotations

import warnings
from typing import Tuple

import jax
import numpy as np

__all__ = ["compute_model_complexity"]


def compute_model_complexity(model, variables=None, height: int = 256,
                             width: int = 128, batch: int = 1,
                             verbose: bool = False) -> Tuple[int, int]:
    """Returns (num_params, flops) for one eval forward at the given shape.

    ``model`` is a ReIDModel wrapper (ieee_tpu.models.base.ReIDModel).
    """
    if variables is None:
        variables = model.init_variables(jax.random.PRNGKey(0), batch=batch,
                                         height=height, width=width)
    num_params = int(
        sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(
            variables["params"]))
    )

    x = model.dummy_input(batch, height, width)

    def fwd(variables, x):
        return model.module.apply(variables, x, train=False)

    lowered = jax.jit(fwd).lower(variables, x)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # some backends return a list per module
            cost = cost[0]
        flops = int(cost.get("flops", 0))
        if flops == 0:
            warnings.warn(
                "XLA cost analysis returned no 'flops' entry for this "
                "backend; the FLOPs figure is unavailable (reported as 0).",
                RuntimeWarning, stacklevel=2)
    except Exception as e:  # noqa: BLE001 — backend-dependent API surface
        warnings.warn(
            f"XLA cost analysis failed ({type(e).__name__}: {e}); FLOPs "
            "unavailable on this backend (reported as 0). Parameter count "
            "is still exact.", RuntimeWarning, stacklevel=2)
        flops = 0

    if verbose:
        print("  ----------------------------------")
        print(f"  Model complexity at {height}x{width} (batch {batch})")
        print(f"  params: {num_params:,} ({num_params / 1e6:.2f}M)")
        print(f"  flops : {flops:,} ({flops / 1e9:.2f}G)")
        print("  ----------------------------------")
    return num_params, flops
