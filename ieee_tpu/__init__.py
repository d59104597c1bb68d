"""ieee_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multi-modal person re-ID
framework with the capabilities of the IEEE/Torchreid reference stack
(ziwang1121/IEEE, AAAI 2022).

Public API mirrors Torchreid's shape: ``build_model``, ``ImageDataManager``,
``engine.run`` (reference ``torchreid/__init__.py``).
"""

__version__ = "0.1.0"

from . import config, data, engine, losses, models, ops, optim, parallel, utils

# torchreid-compatible aliases
metrics = ops

__all__ = [
    "config",
    "data",
    "engine",
    "losses",
    "metrics",
    "models",
    "ops",
    "optim",
    "parallel",
    "utils",
]
