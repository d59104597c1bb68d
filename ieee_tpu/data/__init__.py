from .datamanager import DataManager, ImageDataManager, VideoDataManager
from .datasets import (
    Dataset,
    ImageDataset,
    MultiModalImageDataset,
    VideoDataset,
    init_image_dataset,
    init_video_dataset,
    register_image_dataset,
    register_video_dataset,
)
from .loader import DataLoader
from .sampler import build_train_sampler
from .transforms import build_transforms

__all__ = [
    "DataManager",
    "ImageDataManager",
    "VideoDataManager",
    "Dataset",
    "ImageDataset",
    "MultiModalImageDataset",
    "VideoDataset",
    "init_image_dataset",
    "init_video_dataset",
    "register_image_dataset",
    "register_video_dataset",
    "DataLoader",
    "build_train_sampler",
    "build_transforms",
]
