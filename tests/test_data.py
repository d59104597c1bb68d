import os

import numpy as np
import pytest

import jax

from ieee_tpu.data import (
    ImageDataManager,
    build_train_sampler,
    build_transforms,
    init_image_dataset,
)
from ieee_tpu.data.sampler import RandomIdentitySampler


def test_synthetic_dataset():
    ds = init_image_dataset("synthetic", mode="train", num_pids=8,
                            imgs_per_pid=4, height=64, width=32)
    assert ds.num_train_pids == 8
    item = ds[0]
    assert item["img"].shape == (64, 32, 3)
    assert item["img"].dtype == np.uint8


def test_synthetic_mm_dataset():
    ds = init_image_dataset("synthetic_mm", mode="train", num_pids=8,
                            imgs_per_pid=4, height=64, width=32)
    item = ds[0]
    assert len(item["img"]) == 3
    assert item["img"][0].shape == (64, 32, 3)


def test_dataset_add_offsets_pids():
    a = init_image_dataset("synthetic", mode="train", num_pids=4,
                           imgs_per_pid=2, height=32, width=16)
    b = init_image_dataset("synthetic", mode="train", num_pids=3,
                           imgs_per_pid=2, height=32, width=16, seed=1)
    c = a + b
    assert c.num_train_pids == 7
    assert len(c.train) == len(a.train) + len(b.train)


def test_combineall():
    ds = init_image_dataset("synthetic", mode="train", num_pids=8,
                            imgs_per_pid=4, height=32, width=16,
                            combineall=True)
    # query/gallery use pids 0..3 which already exist, relabeled past 8
    assert ds.num_train_pids == 12


def test_random_identity_sampler_pk_structure():
    # fake data source: (path, pid, camid)
    data = [(f"p{i}", i % 10, 0) for i in range(100)]
    s = RandomIdentitySampler(data, batch_size=8, num_instances=4, seed=0)
    idxs = list(iter(s))
    assert len(idxs) % 8 == 0
    # each consecutive K=4 group must share one pid (the 3M loss contract)
    for g in range(len(idxs) // 4):
        group = idxs[g * 4:(g + 1) * 4]
        pids = {data[i][1] for i in group}
        assert len(pids) == 1
    # each batch has exactly P=2 distinct pids
    for b in range(len(idxs) // 8):
        batch = idxs[b * 8:(b + 1) * 8]
        assert len({data[i][1] for i in batch}) == 2


def test_sampler_factory():
    data = [(f"p{i}", i % 5, i % 3, 0) for i in range(50)]
    for name in ("RandomSampler", "SequentialSampler", "RandomIdentitySampler"):
        s = build_train_sampler(data, name, batch_size=10, num_instances=5)
        assert len(list(iter(s))) > 0
    with pytest.raises(ValueError):
        build_train_sampler(data, "nope")


def test_transforms_shapes_and_determinism():
    train_fn, test_fn = build_transforms(
        64, 32, transforms=["random_flip", "random_crop", "color_jitter",
                            "random_erase"], verbose=False)
    batch = np.random.default_rng(0).integers(0, 256, (4, 64, 32, 3),
                                              dtype=np.uint8)
    key = jax.random.PRNGKey(0)
    out1 = np.asarray(train_fn(key, batch))
    out2 = np.asarray(train_fn(key, batch))
    assert out1.shape == (4, 64, 32, 3)
    assert out1.dtype == np.float32
    np.testing.assert_array_equal(out1, out2)  # key-deterministic
    out3 = np.asarray(train_fn(jax.random.PRNGKey(1), batch))
    assert not np.array_equal(out1, out3)  # different key differs


def test_test_transform_matches_manual_normalize():
    _, test_fn = build_transforms(32, 16, transforms=None, verbose=False)
    batch = np.random.default_rng(1).integers(0, 256, (2, 32, 16, 3),
                                              dtype=np.uint8)
    out = np.asarray(test_fn(batch))
    mean = np.array([0.485, 0.456, 0.406])
    std = np.array([0.229, 0.224, 0.225])
    want = (batch.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_image_datamanager_end_to_end():
    dm = ImageDataManager(
        sources="synthetic", height=64, width=32, batch_size_train=8,
        batch_size_test=16, workers=0, train_sampler="RandomIdentitySampler",
        num_instances=4, num_pids=8, imgs_per_pid=8, verbose=False, seed=0,
    )
    assert dm.num_train_pids == 8
    assert dm.num_streams == 1
    batch = next(iter(dm.train_loader))
    assert batch["img"].shape == (8, 64, 32, 3)
    assert batch["pid"].shape == (8,)
    q_loader, g_loader = dm.fetch_test_loaders("synthetic")
    qb = next(iter(q_loader))
    assert qb["img"].shape[1:] == (64, 32, 3)


def test_image_datamanager_multimodal():
    dm = ImageDataManager(
        sources="synthetic_mm", height=64, width=32, batch_size_train=8,
        workers=1, train_sampler="RandomIdentitySampler", num_instances=4,
        num_pids=8, imgs_per_pid=8, verbose=False, seed=0,
    )
    assert dm.num_streams == 3
    batch = next(iter(dm.train_loader))
    assert len(batch["img"]) == 3
    assert batch["img"][0].shape == (8, 64, 32, 3)
    # P x K structure: 2 pids x 4 instances
    pids = batch["pid"].reshape(2, 4)
    assert (pids == pids[:, :1]).all()


def test_all_registered_datasets_importable():
    """Every registered parser class constructs its path plumbing (actual
    data dirs absent -> RuntimeError from check_before_run, which proves the
    parser wired up correctly rather than crashing on import)."""
    from ieee_tpu.data.datasets import (
        init_image_dataset,
        init_video_dataset,
    )

    image_names = [
        "market1501", "cuhk03", "dukemtmcreid", "msmt17", "viper", "grid",
        "cuhk01", "ilids", "sensereid", "prid", "cuhk02", "cuhksysu",
        "university1652", "RGBNT201", "market_to_RGBNT201", "AllDay",
        "UAVdata",
    ]
    for name in image_names:
        with pytest.raises((RuntimeError, FileNotFoundError)):
            init_image_dataset(name, root="/nonexistent-data-root")
    for name in ["mars", "ilidsvid", "prid2011", "dukemtmcvidreid"]:
        with pytest.raises((RuntimeError, FileNotFoundError)):
            init_video_dataset(name, root="/nonexistent-data-root")


def test_k_tfm_multiple_augmentations():
    train_fn, _ = build_transforms(32, 16, transforms=["random_flip"],
                                   k_tfm=3, verbose=False)
    batch = np.random.default_rng(0).integers(0, 256, (2, 32, 16, 3),
                                              dtype=np.uint8)
    out = np.asarray(train_fn(jax.random.PRNGKey(0), batch))
    assert out.shape == (3, 2, 32, 16, 3)
    # draws differ across k
    assert not np.array_equal(out[0], out[1]) or not np.array_equal(
        out[1], out[2])
