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
    "build_engine",
]


def _parse_compiler_options(entries):
    opts = {}
    for s in entries:
        if "=" not in s:
            raise ValueError(
                "cfg.tpu.compiler_options entries must be 'flag=value'; "
                f"got {s!r}")
        k, v = s.split("=", 1)
        opts[k] = v
    return opts


def build_engine(cfg, datamanager, model, optimizer, scheduler,
                 variables=None):
    """Engine dispatch by ``cfg.loss.name`` (reference
    ``scripts/mainMultiModal.py:45-130``). The reference's ``CMT`` branch
    referenced a missing ImageCMTEngine; it maps to the HC engine here
    (identical model-output contract)."""
    tpu = getattr(cfg, "tpu", None)
    common = dict(optimizer=optimizer, scheduler=scheduler,
                  use_gpu=cfg.use_gpu, variables=variables,
                  seed=cfg.train.seed,
                  accum_steps=int(getattr(cfg.train, "accum_steps", 1)))
    if tpu is not None:
        from ..parallel import make_mesh

        common.update(
            mesh=make_mesh(list(tpu.mesh_shape) or None,
                           tuple(tpu.mesh_axes)),
            donate=bool(tpu.donate),
            sync_batchnorm=bool(tpu.sync_batchnorm),
            compiler_options=_parse_compiler_options(
                getattr(tpu, "compiler_options", [])),
            rerank_bf16=bool(getattr(tpu, "rerank_bf16", False)),
            fused_eval=bool(getattr(tpu, "fused_eval", False)),
            int8_eval=bool(getattr(tpu, "int8_eval", False)),
            tensor_parallel=bool(getattr(tpu, "tensor_parallel", False)),
            spatial_parallel=bool(getattr(tpu, "spatial_parallel", False)),
            pipeline_parallel=int(getattr(tpu, "pipeline_parallel", 0)),
            pipeline_microbatches=int(
                getattr(tpu, "pipeline_microbatches", 0)),
            pipeline_fused=bool(getattr(tpu, "pipeline_fused", False)),
            shard_opt_state=bool(getattr(tpu, "shard_opt_state", False)),
        )
    name = cfg.loss.name
    is_video = getattr(datamanager, "data_type", "image") == "video"
    if name == "softmax":
        if is_video:
            return VideoSoftmaxEngine(
                datamanager, model,
                label_smooth=cfg.loss.softmax.label_smooth,
                pooling_method=cfg.video.pooling_method, **common)
        if datamanager.num_streams > 1:
            return MultiModalImageSoftmaxEngine(
                datamanager, model,
                label_smooth=cfg.loss.softmax.label_smooth, **common)
        return ImageSoftmaxEngine(
            datamanager, model, label_smooth=cfg.loss.softmax.label_smooth,
            **common)
    if name == "triplet":
        cls = VideoTripletEngine if is_video else ImageTripletEngine
        return cls(
            datamanager, model, margin=cfg.loss.triplet_margin,
            weight_t=cfg.loss.weight_t, weight_x=cfg.loss.weight_x,
            label_smooth=cfg.loss.softmax.label_smooth, **common)
    if name == "margin":
        return Image3MEngine(
            datamanager, model, margin=cfg.loss.ieee_margin,
            weight_m=cfg.loss.weight_m, weight_x=cfg.loss.weight_x,
            weight_m_warmup=int(getattr(cfg.loss, "weight_m_warmup", 0)),
            margin_mean_over_ids=bool(
                getattr(cfg.loss, "margin_mean_over_ids", False)),
            label_smooth=cfg.loss.softmax.label_smooth, **common)
    if name in ("hcloss", "CMT"):
        return ImageHCEngine(
            datamanager, model, weight_m=cfg.loss.weight_m,
            weight_x=cfg.loss.weight_x,
            label_smooth=cfg.loss.softmax.label_smooth, **common)
    raise ValueError(f"Unsupported loss: {name}")
