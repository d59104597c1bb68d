from .node import ConfigNode
from .defaults import (
    get_default_config,
    imagedata_kwargs,
    videodata_kwargs,
    optimizer_kwargs,
    lr_scheduler_kwargs,
    engine_run_kwargs,
)

__all__ = [
    "ConfigNode",
    "get_default_config",
    "imagedata_kwargs",
    "videodata_kwargs",
    "optimizer_kwargs",
    "lr_scheduler_kwargs",
    "engine_run_kwargs",
]
