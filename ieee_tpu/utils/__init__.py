from .avgmeter import AverageMeter, MetricMeter
from .checkpoint import (
    load_checkpoint,
    load_pretrained_weights,
    resume_from_checkpoint,
    save_checkpoint,
)
from .loggers import Logger, RankLogger
from .tools import (
    check_isfile,
    collect_env_info,
    download_url,
    mkdir_if_missing,
    read_image,
    read_json,
    set_random_seed,
    write_json,
)

__all__ = [
    "AverageMeter",
    "MetricMeter",
    "Logger",
    "RankLogger",
    "save_checkpoint",
    "load_checkpoint",
    "resume_from_checkpoint",
    "load_pretrained_weights",
    "mkdir_if_missing",
    "check_isfile",
    "read_json",
    "write_json",
    "set_random_seed",
    "read_image",
    "download_url",
    "collect_env_info",
]
