from .multihost import ProcessShardSampler, init_multihost
from .pipeline import PipelinePlan, PipelineTrainStep
from .pipeline_fused import FusedPipelineTrainStep
from .mesh import (
    make_mesh,
    batch_sharding,
    replicate_sharding,
    shard_batch,
    shard_tree,
    tp_shardings,
    zero_shardings,
    replicate,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicate_sharding",
    "shard_batch",
    "replicate",
    "shard_tree",
    "tp_shardings",
    "zero_shardings",
    "ProcessShardSampler",
    "init_multihost",
    "PipelinePlan",
    "PipelineTrainStep",
    "FusedPipelineTrainStep",
]
