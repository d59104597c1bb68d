"""Dataset registries (reference ``torchreid/data/datasets/__init__.py:13-126``)."""

from __future__ import annotations

from .base import Dataset, ImageDataset, MultiModalImageDataset, VideoDataset
from .image.allday import AllDay
from .image.cuhk01 import CUHK01
from .image.cuhk02 import CUHK02
from .image.cuhk03 import CUHK03
from .image.cuhksysu import CUHKSYSU
from .image.dukemtmcreid import DukeMTMCreID
from .image.grid import GRID
from .image.ilids import iLIDS
from .image.market1501 import Market1501
from .image.market_to_rgbnt201 import MarketToRGBNT201
from .image.msmt17 import MSMT17
from .image.prid import PRID
from .image.rgbnt201 import RGBNT201
from .image.sensereid import SenseReID
from .image.synthetic import Synthetic, SyntheticMM, SyntheticVideo
from .image.uav import UAV
from .image.university1652 import University1652
from .image.viper import VIPeR
from .video.dukemtmcvidreid import DukeMTMCVidReID
from .video.ilidsvid import iLIDSVID
from .video.mars import Mars
from .video.prid2011 import PRID2011

__image_datasets = {
    "market1501": Market1501,
    "cuhk03": CUHK03,
    "dukemtmcreid": DukeMTMCreID,
    "msmt17": MSMT17,
    "viper": VIPeR,
    "grid": GRID,
    "cuhk01": CUHK01,
    "ilids": iLIDS,
    "sensereid": SenseReID,
    "prid": PRID,
    "cuhk02": CUHK02,
    "cuhksysu": CUHKSYSU,
    "university1652": University1652,
    "RGBNT201": RGBNT201,
    "market_to_RGBNT201": MarketToRGBNT201,
    "AllDay": AllDay,
    "UAVdata": UAV,
    "synthetic": Synthetic,
    "synthetic_mm": SyntheticMM,
}

__video_datasets = {
    "synthetic_video": SyntheticVideo,
    "mars": Mars,
    "ilidsvid": iLIDSVID,
    "prid2011": PRID2011,
    "dukemtmcvidreid": DukeMTMCVidReID,
}


def init_image_dataset(name, **kwargs):
    """Initializes an image dataset (reference ``datasets/__init__.py:41-50``)."""
    avai = list(__image_datasets.keys())
    if name not in __image_datasets:
        raise ValueError(f'Invalid dataset name. Received "{name}", '
                         f"but expected to be one of {avai}")
    return __image_datasets[name](**kwargs)


def init_video_dataset(name, **kwargs):
    avai = list(__video_datasets.keys())
    if name not in __video_datasets:
        raise ValueError(f'Invalid dataset name. Received "{name}", '
                         f"but expected to be one of {avai}")
    return __video_datasets[name](**kwargs)


def register_image_dataset(name, cls):
    """Register a new image dataset (reference ``datasets/__init__.py:63-94``)."""
    curr = list(__image_datasets.keys())
    if name in curr:
        raise ValueError(f"The given name already exists: {name} "
                         f"(choose from {curr})")
    __image_datasets[name] = cls


def register_video_dataset(name, cls):
    curr = list(__video_datasets.keys())
    if name in curr:
        raise ValueError(f"The given name already exists: {name} "
                         f"(choose from {curr})")
    __video_datasets[name] = cls


__all__ = [
    "Dataset",
    "ImageDataset",
    "MultiModalImageDataset",
    "VideoDataset",
    "init_image_dataset",
    "init_video_dataset",
    "register_image_dataset",
    "register_video_dataset",
]
