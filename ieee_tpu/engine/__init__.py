from .engine import Engine, TrainState
from .image.softmax import ImageSoftmaxEngine, MultiModalImageSoftmaxEngine
from .image.margin import Image3MEngine
from .image.triplet import ImageTripletEngine
from .image.hcloss import ImageHCEngine
from .video.softmax import VideoSoftmaxEngine, VideoTripletEngine

__all__ = [
    "VideoSoftmaxEngine",
    "VideoTripletEngine",
    "Engine",
    "TrainState",
    "ImageSoftmaxEngine",
    "MultiModalImageSoftmaxEngine",
    "Image3MEngine",
    "ImageTripletEngine",
    "ImageHCEngine",
]
