"""Data managers (reference ``torchreid/data/datamanager.py:10-555``).

``ImageDataManager`` builds the sum-of-sources train set, the train loader
(P x K sampler, drop_last), and per-target query/gallery test loaders.
Transforms are returned as compiled device functions rather than host
pipelines (see ``transforms.py``).
"""

from __future__ import annotations

from typing import Dict, List

from .datasets import init_image_dataset, init_video_dataset
from .loader import DataLoader
from .sampler import build_train_sampler
from .transforms import build_transforms


def _maybe_shard_per_process(sampler, global_batch: int, seed=None):
    """Multi-host: wrap the train sampler so this process yields its slice
    of every global batch (parallel/multihost.py). Returns the (possibly
    wrapped) sampler and the LOCAL loader batch size. Single-process (or
    uninitialized backend): unchanged.

    ``seed`` must be set in multi-host runs: the per-process slices only
    reassemble into the intended global batch if every process's base
    sampler draws the IDENTICAL index stream, which requires a shared
    explicit seed (seed=None draws from OS entropy per process — silent
    batch corruption)."""
    try:
        # Consult jax.distributed's own state instead of jax.process_count():
        # the latter force-initializes the backend, which would break the
        # documented 'jax.config.update("jax_platforms", ...) after building
        # the datamanager' pattern (and eagerly opens the TPU tunnel). The
        # distributed client exists iff jax.distributed.initialize() ran —
        # exactly the multi-host case; otherwise return untouched with no
        # backend side effects.
        from jax._src import distributed as _jax_distributed

        if getattr(_jax_distributed.global_state, "client", None) is None:
            return sampler, global_batch
        import jax

        pc, pi = jax.process_count(), jax.process_index()
    except Exception:
        return sampler, global_batch
    if pc <= 1:
        return sampler, global_batch
    if seed is None:
        raise ValueError(
            "multi-host training needs an explicit data seed "
            "(cfg.train.seed / DataManager(seed=...)): every process must "
            "draw the identical global index stream for the per-process "
            "batch slices to reassemble correctly")
    from ..parallel.multihost import ProcessShardSampler

    wrapped = ProcessShardSampler(sampler, global_batch, pi, pc)
    return wrapped, wrapped.local_batch_size

__all__ = ["DataManager", "ImageDataManager", "VideoDataManager"]


class DataManager:
    def __init__(
        self,
        sources=None,
        targets=None,
        height=256,
        width=128,
        transforms="random_flip",
        norm_mean=None,
        norm_std=None,
        use_gpu=False,
        verbose=True,
        k_tfm=1,
        seed=None,
    ):
        self.sources = [sources] if isinstance(sources, str) else sources
        if self.sources is None:
            raise ValueError("sources must not be None")
        self.targets = [targets] if isinstance(targets, str) else targets
        if self.targets is None:
            self.targets = self.sources
        self.height = height
        self.width = width
        self.k_tfm = int(k_tfm)
        self.transform_tr, self.transform_te = build_transforms(
            height, width, transforms=transforms, k_tfm=k_tfm,
            norm_mean=norm_mean, norm_std=norm_std, verbose=verbose,
        )
        # host-side per-image train transform (RandomPatch pool), or None;
        # seeded so random_patch is reproducible alongside the samplers
        from .transforms import build_host_transform

        self.host_transform_tr = build_host_transform(transforms, seed=seed)
        self.use_gpu = use_gpu  # kept for API parity

    @property
    def num_train_pids(self):
        return self._num_train_pids

    @property
    def num_train_cams(self):
        return self._num_train_cams

    @property
    def num_streams(self):
        """1 = single image per item; >1 = multi-modal image list."""
        return self._num_streams

    def fetch_test_loaders(self, name):
        """Returns (query_loader, gallery_loader) for a target dataset
        (reference ``datamanager.py:77-87``)."""
        return (
            self.test_loader[name]["query"],
            self.test_loader[name]["gallery"],
        )


class ImageDataManager(DataManager):
    """(reference ``datamanager.py:90-348``)"""

    data_type = "image"

    def __init__(
        self,
        root="",
        sources=None,
        targets=None,
        height=256,
        width=128,
        transforms="random_flip",
        k_tfm=1,
        norm_mean=None,
        norm_std=None,
        use_gpu=False,
        split_id=0,
        combineall=False,
        load_train_targets=False,
        batch_size_train=32,
        batch_size_test=32,
        workers=4,
        num_instances=4,
        num_cams=1,
        num_datasets=1,
        train_sampler="RandomSampler",
        train_sampler_t="RandomSampler",
        seed=None,
        verbose=True,
        prefetch=2,
        decode_cache=False,
        device_cache=False,
        **dataset_kwargs,
    ):
        super().__init__(
            sources=sources, targets=targets, height=height, width=width,
            transforms=transforms, norm_mean=norm_mean, norm_std=norm_std,
            use_gpu=use_gpu, verbose=verbose, k_tfm=k_tfm, seed=seed,
        )
        self.batch_size_train = batch_size_train
        self.num_instances = num_instances

        common = dict(
            mode="train", combineall=combineall, root=root, split_id=split_id,
            height=height, width=width, verbose=verbose, **dataset_kwargs,
        )
        if verbose:
            print("=> Loading train (source) dataset")
        trainset = sum(
            (init_image_dataset(name, **common) for name in self.sources[1:]),
            init_image_dataset(self.sources[0], **common),
        )
        self.trainset = trainset
        self._num_train_pids = trainset.num_train_pids
        self._num_train_cams = trainset.num_train_cams
        first = trainset.train[0][0]
        self._num_streams = len(first) if isinstance(first, (list, tuple)) else 1

        loader_trainset = trainset
        if decode_cache:
            from .cache import CachedDataset

            loader_trainset = CachedDataset(
                trainset,
                decode_cache if isinstance(decode_cache, str) else None)
        train_sampler_obj = build_train_sampler(
            trainset.train, train_sampler,
            batch_size=batch_size_train, num_instances=num_instances,
            num_cams=num_cams, num_datasets=num_datasets, seed=seed,
        )
        # multi-host: batch_size_train is the GLOBAL batch; each process
        # feeds its contiguous slice of every global batch and the engine
        # reassembles on device (parallel/multihost.py). Identical seeds
        # across processes keep the global sequence identical. No-op
        # single-process.
        train_sampler_obj, local_batch_train = _maybe_shard_per_process(
            train_sampler_obj, batch_size_train, seed)
        if device_cache and local_batch_train != batch_size_train:
            raise ValueError(
                "data.device_cache is single-process: the HBM-resident "
                "cache lives on this process's devices only; use "
                "decode_cache for multi-host runs")
        if device_cache:
            # whole train set as uint8 in HBM; batches gather on device
            # (data/device_cache.py). RandomPatch needs host pixels per item.
            if self.host_transform_tr is not None:
                raise ValueError(
                    "data.device_cache is incompatible with host-side "
                    "transforms (random_patch); drop it or use decode_cache"
                )
            from .device_cache import DeviceCachedLoader

            self.train_loader = DeviceCachedLoader(
                loader_trainset, train_sampler_obj,
                batch_size=local_batch_train, drop_last=True,
            )
        else:
            self.train_loader = DataLoader(
                loader_trainset,
                train_sampler_obj,
                batch_size=local_batch_train,
                drop_last=True,
                workers=workers,
                prefetch=prefetch,
                host_transform=self.host_transform_tr,
            )

        # optional unlabeled target train loader (reference :231-270)
        self.train_loader_t = None
        if load_train_targets:
            if set(self.sources) & set(self.targets):
                raise ValueError(
                    "sources={} and targets={} must not overlap when "
                    "load_train_targets=True".format(self.sources, self.targets)
                )
            if verbose:
                print("=> Loading train (target) dataset")
            trainset_t = sum(
                (init_image_dataset(name, **common) for name in self.targets[1:]),
                init_image_dataset(self.targets[0], **common),
            )
            sampler_t = build_train_sampler(
                trainset_t.train, train_sampler_t,
                batch_size=batch_size_train, num_instances=num_instances,
                seed=seed,
            )
            # multi-host: the target loader shards per process like the
            # source loader
            sampler_t, local_batch_t = _maybe_shard_per_process(
                sampler_t, batch_size_train, seed)
            self.train_loader_t = DataLoader(
                trainset_t,
                sampler_t,
                batch_size=local_batch_t,
                drop_last=True,
                workers=workers,
                prefetch=prefetch,
                host_transform=self.host_transform_tr,
            )

        if verbose:
            print("=> Loading test (target) dataset")
        self.test_loader: Dict[str, Dict[str, DataLoader]] = {}
        self.test_dataset: Dict[str, Dict[str, list]] = {}
        for name in self.targets:
            qset = init_image_dataset(
                name, mode="query", combineall=combineall, root=root,
                split_id=split_id, height=height, width=width,
                verbose=False, **dataset_kwargs,
            )
            gset = init_image_dataset(
                name, mode="gallery", combineall=combineall, root=root,
                split_id=split_id, height=height, width=width,
                verbose=False, **dataset_kwargs,
            )
            mk = lambda ds: DataLoader(
                ds, sampler=range(len(ds)), batch_size=batch_size_test,
                drop_last=False, workers=workers, prefetch=prefetch,
            )
            self.test_loader[name] = {"query": mk(qset), "gallery": mk(gset)}
            self.test_dataset[name] = {"query": qset.query, "gallery": gset.gallery}

        if verbose:
            print("\n  **************** Summary ****************")
            print(f"  source            : {self.sources}")
            print(f"  # source datasets : {len(self.sources)}")
            print(f"  # source ids      : {self.num_train_pids}")
            print(f"  # source images   : {len(trainset.train)}")
            print(f"  # source cameras  : {self.num_train_cams}")
            print(f"  target            : {self.targets}")
            print("  *****************************************\n")


class VideoDataManager(DataManager):
    """(reference ``datamanager.py:351-555``)"""

    data_type = "video"

    def __init__(
        self,
        root="",
        sources=None,
        targets=None,
        height=256,
        width=128,
        transforms="random_flip",
        norm_mean=None,
        norm_std=None,
        use_gpu=False,
        split_id=0,
        combineall=False,
        batch_size_train=3,
        batch_size_test=3,
        workers=4,
        num_instances=4,
        num_cams=1,
        num_datasets=1,
        train_sampler="RandomSampler",
        seq_len=15,
        sample_method="evenly",
        seed=None,
        verbose=True,
        prefetch=2,
        **dataset_kwargs,
    ):
        super().__init__(
            sources=sources, targets=targets, height=height, width=width,
            transforms=transforms, norm_mean=norm_mean, norm_std=norm_std,
            use_gpu=use_gpu, verbose=verbose, seed=seed,
        )
        common = dict(
            mode="train", combineall=combineall, root=root, split_id=split_id,
            height=height, width=width, seq_len=seq_len,
            sample_method=sample_method, seed=seed, verbose=verbose,
            **dataset_kwargs,
        )
        trainset = sum(
            (init_video_dataset(name, **common) for name in self.sources[1:]),
            init_video_dataset(self.sources[0], **common),
        )
        self.trainset = trainset
        self._num_train_pids = trainset.num_train_pids
        self._num_train_cams = trainset.num_train_cams
        self._num_streams = 1
        self.seq_len = seq_len

        video_sampler, local_batch_train = _maybe_shard_per_process(
            build_train_sampler(
                trainset.train, train_sampler, batch_size=batch_size_train,
                num_instances=num_instances, num_cams=num_cams,
                num_datasets=num_datasets, seed=seed,
            ), batch_size_train, seed)
        self.train_loader = DataLoader(
            trainset,
            video_sampler,
            batch_size=local_batch_train,
            drop_last=True,
            workers=workers,
            prefetch=prefetch,
            host_transform=self.host_transform_tr,
        )

        self.test_loader = {}
        self.test_dataset = {}
        for name in self.targets:
            qset = init_video_dataset(
                name, mode="query", combineall=combineall, root=root,
                split_id=split_id, height=height, width=width, seq_len=seq_len,
                sample_method=sample_method, seed=seed, verbose=False,
                **dataset_kwargs,
            )
            gset = init_video_dataset(
                name, mode="gallery", combineall=combineall, root=root,
                split_id=split_id, height=height, width=width, seq_len=seq_len,
                sample_method=sample_method, seed=seed, verbose=False,
                **dataset_kwargs,
            )
            mk = lambda ds: DataLoader(
                ds, sampler=range(len(ds)), batch_size=batch_size_test,
                drop_last=False, workers=workers,
            )
            self.test_loader[name] = {"query": mk(qset), "gallery": mk(gset)}
            self.test_dataset[name] = {"query": qset.query, "gallery": gset.gallery}
