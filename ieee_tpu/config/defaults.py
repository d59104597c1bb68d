"""Default config tree + kwargs adapters.

Mirrors the reference key schema (reference ``scripts/default_config.py:4-215``)
so that the reference's YAML files (e.g. ``configs/RGBNT_ieee_part_margin.yaml``)
load unmodified. TPU-specific keys live under ``cfg.tpu``.
"""

from __future__ import annotations

from .node import ConfigNode


def get_default_config() -> ConfigNode:
    cfg = ConfigNode()

    # model
    cfg.model = ConfigNode()
    cfg.model.name = "resnet50"
    cfg.model.pretrained = True  # load pretrained backbone weights if available
    cfg.model.load_weights = ""  # path to model weights
    cfg.model.resume = ""  # path to checkpoint for resume training
    # IEEE ablation flags (reference attributes interaction/attention/using_REM,
    # ``ieee3modalPart.py:312-314``; README documents them as the ablation API)
    cfg.model.interaction = True
    cfg.model.attention = True
    cfg.model.using_REM = True

    # data
    cfg.data = ConfigNode()
    cfg.data.type = "image"
    cfg.data.root = "reid-data"
    cfg.data.sources = ["market1501"]
    cfg.data.targets = ["market1501"]
    cfg.data.workers = 1  # host decode threads
    # pre-decoded uint8 memmap cache (data/cache.py): False = off, True =
    # tmp dir, or a directory path. Exact (caches _read_resized output);
    # covers the chip's step rate on decode-starved (few-core) hosts
    cfg.data.decode_cache = False
    # whole train set as uint8 in device HBM; batches gather on device by
    # sampler index (data/device_cache.py) — zero per-step host->device
    # image traffic. For datasets that fit (~<=4 GB); incompatible with
    # random_patch (host-state transform)
    cfg.data.device_cache = False
    cfg.data.split_id = 0
    cfg.data.height = 256
    cfg.data.width = 128
    cfg.data.combineall = False
    cfg.data.transforms = ["random_flip"]
    cfg.data.k_tfm = 1
    cfg.data.norm_mean = [0.485, 0.456, 0.406]
    cfg.data.norm_std = [0.229, 0.224, 0.225]
    cfg.data.save_dir = "log"
    cfg.data.load_train_targets = False

    # dataset-specific
    cfg.market1501 = ConfigNode()
    cfg.market1501.use_500k_distractors = False
    cfg.cuhk03 = ConfigNode()
    cfg.cuhk03.labeled_images = False
    cfg.cuhk03.classic_split = False
    cfg.cuhk03.use_metric_cuhk03 = False

    # sampler
    cfg.sampler = ConfigNode()
    cfg.sampler.train_sampler = "RandomSampler"
    cfg.sampler.train_sampler_t = "RandomSampler"
    cfg.sampler.num_instances = 4
    cfg.sampler.num_cams = 1
    cfg.sampler.num_datasets = 1

    # video
    cfg.video = ConfigNode()
    cfg.video.seq_len = 15
    cfg.video.sample_method = "evenly"
    cfg.video.pooling_method = "avg"

    # train
    cfg.train = ConfigNode()
    cfg.train.optim = "adam"
    cfg.train.lr = 0.0003
    cfg.train.weight_decay = 5e-4
    cfg.train.max_epoch = 60
    cfg.train.start_epoch = 0
    cfg.train.batch_size = 32
    cfg.train.fixbase_epoch = 0
    cfg.train.open_layers = ["classifier"]
    # faithful-fixbase extension (no reference-config analog): freeze frozen
    # layers' BN running stats during warmup like torchtools.py:171-221's
    # .eval() flip; default False = round-1 behavior (stats keep updating).
    # With fixbase_bn_eval (below) on, the stats pin is ALSO applied — it is
    # a no-op for flax BN modules (the interceptor already skips their
    # update) but required for the Pallas fused-BN paths (cfg.tpu.fused_1x1
    # / block_megakernel), whose in-kernel stat updates the interceptor
    # can't reach.
    cfg.train.fixbase_bn_freeze = False
    # full .eval() fidelity for frozen modules during fixbase warmup: BN
    # normalizes by RUNNING stats and skips the stat update, exactly the
    # reference's open_specified_layers (torchtools.py:171-221). Default on;
    # turn off to recover the round-1..3 batch-stat behavior.
    cfg.train.fixbase_bn_eval = True
    cfg.train.staged_lr = False
    cfg.train.new_layers = ["classifier"]
    cfg.train.base_lr_mult = 0.1
    cfg.train.lr_scheduler = "single_step"
    cfg.train.stepsize = [20]
    cfg.train.gamma = 0.1
    cfg.train.print_freq = 20
    cfg.train.seed = 1
    # gradient accumulation: the batch splits into N sequential microbatches
    # inside the one jitted step (lax.scan over chained BN stats, averaged
    # grads, a single optimizer update). Effective batch beyond HBM;
    # batch_size (x k_tfm) must divide by it. Beyond the reference.
    cfg.train.accum_steps = 1

    # optimizers
    cfg.sgd = ConfigNode()
    cfg.sgd.momentum = 0.9
    cfg.sgd.dampening = 0.0
    cfg.sgd.nesterov = True
    cfg.rmsprop = ConfigNode()
    cfg.rmsprop.alpha = 0.99
    cfg.adam = ConfigNode()
    cfg.adam.beta1 = 0.9
    cfg.adam.beta2 = 0.999

    # loss
    cfg.loss = ConfigNode()
    cfg.loss.name = "softmax"
    cfg.loss.softmax = ConfigNode()
    cfg.loss.softmax.label_smooth = True
    cfg.loss.triplet = ConfigNode()
    cfg.loss.triplet_margin = 0.3
    cfg.loss.ieee_margin = 3
    cfg.loss.weight_c = 1.0
    cfg.loss.weight_t = 1.0
    cfg.loss.weight_m = 1.0
    cfg.loss.weight_x = 1.0
    # TPU-first extension: ramp weight_m 0 -> weight_m over the first N
    # epochs (margin engine only). 0 = off (reference behavior). Useful when
    # training from scratch: the 3M term's trunk gradient otherwise
    # dominates CE by 200-500x (E2E_DIAG_r03.jsonl)
    cfg.loss.weight_m_warmup = 0
    # TPU-first extension (documented divergence, losses/margin.py): average
    # the 3M loss over ids instead of the reference's sum, making the
    # margin:CE gradient ratio batch-size-invariant. The reference's batch-8
    # protocol has P=2 ids/batch; at TPU batch 128 the summed term is 16x
    # stronger relative to CE and from-scratch CE flatlines (round-3/4
    # controls). False = reference-exact.
    cfg.loss.margin_mean_over_ids = False

    # test
    cfg.test = ConfigNode()
    cfg.test.batch_size = 100
    cfg.test.dist_metric = "euclidean"
    cfg.test.normalize_feature = False
    cfg.test.ranks = [1, 5, 10]
    cfg.test.evaluate = False
    cfg.test.eval_freq = -1
    cfg.test.start_eval = 0
    cfg.test.rerank = False
    cfg.test.visrank = False
    cfg.test.visrank_topk = 10

    # misc flags set by entry scripts (reference sets cfg.use_gpu at runtime)
    cfg.use_gpu = True

    # --- TPU-native additions (no reference analog) ---------------------
    cfg.tpu = ConfigNode()
    cfg.tpu.mesh_shape = []  # e.g. [8] -> 1-D data mesh; [] = all local devices
    cfg.tpu.mesh_axes = ["data"]
    cfg.tpu.compute_dtype = "bfloat16"  # matmul/conv dtype on the MXU
    # (params are always float32 masters — invariant, not a knob)
    # True (default): BN batch stats over the GLOBAL batch (pjit-natural).
    # False: per-replica stats via shard_map — nn.DataParallel-faithful
    # (SURVEY §2.8 divergence knob; engine.Engine._forward_train)
    cfg.tpu.sync_batchnorm = True
    cfg.tpu.prefetch = 2  # host loader prefetch depth (data/loader.py queue)
    cfg.tpu.donate = True  # donate train-state buffers to the jitted step
    # Fused Pallas matmul+BN path for 1x1 convs (models/common.py
    # FusedConvBN1x1). None = auto: on for single-device TPU and for
    # per-replica-BN multi-device runs (shard_map partitions the kernels);
    # off for multi-device global-batch BN, where a Pallas stats epilogue
    # would compute per-shard statistics under pjit.
    cfg.tpu.fused_1x1 = None
    # Pallas whole-block backward for stride-1 bottlenecks
    # (ops/pallas/block_bwd.py): None = auto (resolve_block_megakernel)
    cfg.tpu.block_megakernel = None
    # per-jit XLA:TPU option overrides for the train step, as
    # "flag=value" strings (e.g. ["xla_tpu_scoped_vmem_limit_kib=65536"]).
    # Measured candidates: tools/xla_flag_sweep.py; [] = compiler defaults
    cfg.tpu.compiler_options = []
    # opt-in bf16 streaming for the device k-reciprocal jaccard sweep
    # (ops/rerank_device.py): faster, ~1e-3 relative off the f32 oracle
    cfg.tpu.rerank_bf16 = False
    # opt-in fused IEEE eval (folded-BN + Pallas part-pool,
    # models/fast_eval.py); plain flax measured faster on v5e, so off
    cfg.tpu.fused_eval = False
    # opt-in w8a8 post-training-quantized eval/serving path
    # (models/int8_eval.py): int8 MXU measured +24-26% over bf16 on v5e;
    # activation scales calibrate from the first eval batch. Validate the
    # retrieval-quality delta per checkpoint before serving.
    cfg.tpu.int8_eval = False
    # tensor parallelism over a 2-D (data, model) mesh: wide layers shard
    # over the "model" axis (parallel/mesh.py tp_shardings). Use with e.g.
    # tpu.mesh_shape [4,2] tpu.mesh_axes "['data','model']". Requires
    # sync_batchnorm. Beyond the reference (DataParallel only, SURVEY §2.8)
    cfg.tpu.tensor_parallel = False
    # spatial parallelism over the same 2-D (data, model) mesh: the image
    # HEIGHT dim shards over the "model" axis and GSPMD spatially partitions
    # every conv (halo exchanges over ICI); params stay replicated and the
    # math is exactly the single-device program. For large inputs / small
    # per-chip batch. Requires sync_batchnorm; exclusive with tensor_parallel
    cfg.tpu.spatial_parallel = False
    # GPipe-style pipeline parallelism (parallel/pipeline.py): split the
    # model into N contiguous stages over a ('pipe', 'data') mesh — e.g.
    # tpu.mesh_shape [2,4] tpu.mesh_axes "['pipe','data']" with
    # pipeline_parallel 2. Each stage's params + optimizer moments live only
    # on its slice; microbatches flow through over ICI. 0 = off. Requires
    # sync_batchnorm; exclusive with tensor/spatial parallel + accum_steps.
    cfg.tpu.pipeline_parallel = 0
    # microbatches per step under pipeline_parallel (0 = one per stage, the
    # standard GPipe fill/drain). Batch must divide evenly.
    cfg.tpu.pipeline_microbatches = 0
    # run the whole GPipe schedule as ONE jitted wavefront program
    # (parallel/pipeline_fused.py: shard_map over 'pipe', lax.switch per
    # stage, ppermute activation rotation, grads through the scan) instead
    # of host-dispatched per-(stage, microbatch) jits. 3S+2 dispatches/step
    # independent of microbatch count.
    cfg.tpu.pipeline_fused = False
    # ZeRO-1: shard optimizer moments over the 'data' axis (each chip owns
    # 1/N of every moment; params stay replicated) — frees ~2/3 of the
    # non-activation HBM state for adam-family at N>=4. Exclusive with
    # tensor_parallel / pipeline_parallel (those already shard moments).
    cfg.tpu.shard_opt_state = False

    return cfg


def imagedata_kwargs(cfg: ConfigNode) -> dict:
    return dict(
        root=cfg.data.root,
        sources=cfg.data.sources,
        targets=cfg.data.targets,
        height=cfg.data.height,
        width=cfg.data.width,
        transforms=cfg.data.transforms,
        k_tfm=cfg.data.k_tfm,
        norm_mean=cfg.data.norm_mean,
        norm_std=cfg.data.norm_std,
        split_id=cfg.data.split_id,
        combineall=cfg.data.combineall,
        load_train_targets=cfg.data.load_train_targets,
        batch_size_train=cfg.train.batch_size,
        batch_size_test=cfg.test.batch_size,
        workers=cfg.data.workers,
        decode_cache=cfg.data.decode_cache,
        device_cache=cfg.data.device_cache,
        num_instances=cfg.sampler.num_instances,
        num_cams=cfg.sampler.num_cams,
        num_datasets=cfg.sampler.num_datasets,
        train_sampler=cfg.sampler.train_sampler,
        train_sampler_t=cfg.sampler.train_sampler_t,
        seed=cfg.train.seed,
        prefetch=cfg.tpu.prefetch,
        cuhk03_labeled=cfg.cuhk03.labeled_images,
        cuhk03_classic_split=cfg.cuhk03.classic_split,
        market1501_500k=cfg.market1501.use_500k_distractors,
    )


def videodata_kwargs(cfg: ConfigNode) -> dict:
    return dict(
        root=cfg.data.root,
        sources=cfg.data.sources,
        targets=cfg.data.targets,
        height=cfg.data.height,
        width=cfg.data.width,
        transforms=cfg.data.transforms,
        norm_mean=cfg.data.norm_mean,
        norm_std=cfg.data.norm_std,
        split_id=cfg.data.split_id,
        combineall=cfg.data.combineall,
        batch_size_train=cfg.train.batch_size,
        batch_size_test=cfg.test.batch_size,
        workers=cfg.data.workers,
        num_instances=cfg.sampler.num_instances,
        num_cams=cfg.sampler.num_cams,
        num_datasets=cfg.sampler.num_datasets,
        train_sampler=cfg.sampler.train_sampler,
        seed=cfg.train.seed,
        prefetch=cfg.tpu.prefetch,
        seq_len=cfg.video.seq_len,
        sample_method=cfg.video.sample_method,
    )


def optimizer_kwargs(cfg: ConfigNode) -> dict:
    return dict(
        optim=cfg.train.optim,
        lr=cfg.train.lr,
        weight_decay=cfg.train.weight_decay,
        momentum=cfg.sgd.momentum,
        sgd_dampening=cfg.sgd.dampening,
        sgd_nesterov=cfg.sgd.nesterov,
        rmsprop_alpha=cfg.rmsprop.alpha,
        adam_beta1=cfg.adam.beta1,
        adam_beta2=cfg.adam.beta2,
        staged_lr=cfg.train.staged_lr,
        new_layers=cfg.train.new_layers,
        base_lr_mult=cfg.train.base_lr_mult,
    )


def lr_scheduler_kwargs(cfg: ConfigNode) -> dict:
    return dict(
        lr_scheduler=cfg.train.lr_scheduler,
        stepsize=cfg.train.stepsize,
        gamma=cfg.train.gamma,
        max_epoch=cfg.train.max_epoch,
    )


def engine_run_kwargs(cfg: ConfigNode) -> dict:
    return dict(
        save_dir=cfg.data.save_dir,
        max_epoch=cfg.train.max_epoch,
        start_epoch=cfg.train.start_epoch,
        fixbase_epoch=cfg.train.fixbase_epoch,
        open_layers=cfg.train.open_layers,
        fixbase_bn_freeze=cfg.train.fixbase_bn_freeze,
        fixbase_bn_eval=cfg.train.fixbase_bn_eval,
        start_eval=cfg.test.start_eval,
        eval_freq=cfg.test.eval_freq,
        test_only=cfg.test.evaluate,
        print_freq=cfg.train.print_freq,
        dist_metric=cfg.test.dist_metric,
        normalize_feature=cfg.test.normalize_feature,
        visrank=cfg.test.visrank,
        visrank_topk=cfg.test.visrank_topk,
        use_metric_cuhk03=cfg.cuhk03.use_metric_cuhk03,
        ranks=cfg.test.ranks,
        rerank=cfg.test.rerank,
    )
