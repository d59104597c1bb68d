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


def test_synthetic_correlated_identities_share_appearance():
    """correlated=True: identity structure survives the per-image camera
    effects (retrieval is learnable — the end-to-end convergence run
    depends on this) but raw per-image pixels do NOT trivially cluster
    (untrained features start near chance)."""
    ds = init_image_dataset("synthetic_mm", mode="train", num_pids=4,
                            imgs_per_pid=16, height=64, width=32,
                            correlated=True)

    def img(i, m=0):
        rec = ds.train[i]
        return ds._read_resized(rec[0][m]).astype(np.float32), rec[1]

    # deterministic rendering
    a0, _ = img(0)
    a1, _ = img(0)
    np.testing.assert_array_equal(a0, a1)

    # averaging many renders integrates out the camera effects: per-pid
    # mean images must cluster by identity (split-half distance << cross-pid)
    by_pid = {}
    for i in range(len(ds.train)):
        x, pid = img(i)
        by_pid.setdefault(pid, []).append(x)
    pids = sorted(by_pid)
    halves = {p: (np.mean(by_pid[p][:8], 0), np.mean(by_pid[p][8:], 0))
              for p in pids}
    same = np.mean([np.abs(halves[p][0] - halves[p][1]).mean() for p in pids])
    cross = np.mean([np.abs(halves[p][0] - halves[q][0]).mean()
                     for p in pids for q in pids if p != q])
    # 8 renders/half only partially integrate out the roll: measured ratio
    # ~0.64 (28.1 vs 43.5) — assert clear separation, not purity
    assert same < 0.8 * cross, (same, cross)


def test_synthetic_x1_cross_modal_structure():
    """cross_modal=True (synthetic-x1): the discriminative benchmark's
    factorization holds — a group-shared code visible in every modality
    (group-mates cluster once camera effects average out) plus a
    modality-specific per-pid code (same-pid renders of one modality are
    closer than same-group-different-pid ones)."""
    ds = init_image_dataset("synthetic_mm", mode="train", num_pids=8,
                            imgs_per_pid=48, height=64, width=32,
                            cross_modal=True)
    assert ds.train[0][0][0].startswith("synthetic-x1://")

    def mean_img(pid, modal, half):
        recs = [r for r in ds.train if r[1] == pid]
        sl = recs[:24] if half == 0 else recs[24:]
        return np.mean([ds._read_resized(r[0][modal]).astype(np.float32)
                        for r in sl], 0)

    # deterministic rendering
    a = ds._read_resized(ds.train[0][0][0])
    np.testing.assert_array_equal(a, ds._read_resized(ds.train[0][0][0]))

    # groups of 4: pids 0-3 share a code, 4-7 another
    d = lambda x, y: float(np.abs(x - y).mean())
    m0 = {p: mean_img(p, 0, 0) for p in range(8)}
    same_group = np.mean([d(m0[p], m0[q]) for p in range(4)
                          for q in range(4) if p != q])
    cross_group = np.mean([d(m0[p], m0[q]) for p in range(4)
                           for q in range(4, 8)])
    # measured at 24 renders/half: 11.2 vs 13.3 (the roll nuisance only
    # partially integrates out) — assert separation with margin
    assert same_group < 0.92 * cross_group, (same_group, cross_group)

    # modality-specific code: same pid (both halves, one modality) closer
    # than same-group different-pid
    same_pid = np.mean([d(mean_img(p, 0, 0), mean_img(p, 0, 1))
                        for p in range(4)])
    # measured: 8.0 vs 11.2
    assert same_pid < 0.85 * same_group, (same_pid, same_group)


def test_synthetic_heldout_test_split_is_disjoint():
    """heldout_test=True: query/gallery identities are disjoint from train
    (open-set protocol like the real re-ID datasets); query ids still all
    appear in the gallery so CMC/mAP is well-defined."""
    for name in ("synthetic", "synthetic_mm"):
        tr = init_image_dataset(name, mode="train", num_pids=6,
                                imgs_per_pid=4, height=32, width=16,
                                correlated=True, heldout_test=True)
        train_pids = {rec[1] for rec in tr.train}
        q_pids = {rec[1] for rec in tr.query}
        g_pids = {rec[1] for rec in tr.gallery}
        assert train_pids == set(range(6))
        assert q_pids and not (q_pids & train_pids)
        assert q_pids <= g_pids
        # default stays the historical seen-id split
        tr2 = init_image_dataset(name, mode="train", num_pids=6,
                                 imgs_per_pid=4, height=32, width=16)
        assert {r[1] for r in tr2.query} <= {r[1] for r in tr2.train}


def test_device_cached_loader_matches_plain():
    """data.device_cache: batches gathered from the HBM-resident cache are
    identical to the host loader's (same sampler seed), and the loader
    satisfies the DataLoader batch-dict contract."""
    kw = dict(sources="synthetic_mm", height=32, width=16,
              batch_size_train=8, batch_size_test=8, workers=0,
              train_sampler="RandomIdentitySampler", num_instances=4,
              num_pids=4, imgs_per_pid=8, verbose=False, seed=0)
    dm_plain = ImageDataManager(**kw)
    dm_dev = ImageDataManager(device_cache=True, **kw)
    assert len(dm_dev.train_loader) == len(dm_plain.train_loader)
    b1 = next(iter(dm_plain.train_loader))
    b2 = next(iter(dm_dev.train_loader))
    np.testing.assert_array_equal(b1["pid"], b2["pid"])
    for m in range(3):
        np.testing.assert_array_equal(b1["img"][m], np.asarray(b2["img"][m]))


def test_device_cache_slab_ship_exact():
    """The donated dynamic_update_slice slab writer reproduces the source
    array exactly, including the short-tail overlap rewrite."""
    from ieee_tpu.data.device_cache import DeviceCachedLoader

    a = np.arange(37 * 5 * 4 * 3, dtype=np.uint8).reshape(37, 5, 4, 3)
    for slab_bytes in (200, 1 << 30):  # 3-rows/slab + single-transfer paths
        out = DeviceCachedLoader._ship(a, slab_bytes=slab_bytes)
        np.testing.assert_array_equal(np.asarray(out), a)


def test_device_cache_rejects_host_transform():
    with pytest.raises(ValueError, match="device_cache"):
        ImageDataManager(
            sources="synthetic", height=32, width=16, batch_size_train=8,
            batch_size_test=8, workers=0, num_pids=4, imgs_per_pid=4,
            verbose=False, seed=0, device_cache=True,
            transforms=["random_flip", "random_patch"])


def test_engine_trains_with_device_cache():
    from ieee_tpu.engine.image.softmax import ImageSoftmaxEngine
    from ieee_tpu.models import build_model
    from ieee_tpu.optim import build_optimizer

    dm = ImageDataManager(
        sources="synthetic", height=32, width=16, batch_size_train=8,
        batch_size_test=8, workers=0, num_pids=4, imgs_per_pid=8,
        verbose=False, seed=0, device_cache=True,
        train_sampler="RandomIdentitySampler", num_instances=4)
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False)
    eng = ImageSoftmaxEngine(dm, model,
                             optimizer=build_optimizer(optim="sgd", lr=0.01),
                             scheduler=lambda e: 0.01, seed=0)
    eng.max_epoch = 1
    eng.train(print_freq=100)


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


def test_random_patch_pool_pastes_from_earlier_images():
    """Exact RandomPatch semantics (reference transforms.py:144-230): the
    patch pasted onto an image comes from the persistent cross-batch pool —
    i.e. from EARLIER images, not the current one."""
    from ieee_tpu.data.transforms import RandomPatchPool

    pool = RandomPatchPool(min_sample_size=5, prob_happen=1.0,
                           prob_rotate=1.1,  # rotate never fires
                           prob_flip_leftright=1.1,  # flip never fires
                           seed=0)
    h, w = 64, 32
    # feed 8 solid-color donor images; each contributes a patch to the pool
    for i in range(8):
        img = np.full((h, w, 3), 10 + i * 10, np.uint8)
        pool(img)
    assert len(pool.pool) >= 5

    # fresh white images must come back with rectangles of donor pixels
    # (a paste may also source the white image's own pool patch, so check
    # across several calls)
    donor_vals = set(range(10, 90, 10)) | {255}
    saw_donor = False
    for _ in range(6):
        out = pool(np.full((h, w, 3), 255, np.uint8))
        pasted = np.unique(out[out != 255])
        assert all(int(v) in donor_vals for v in pasted)
        saw_donor = saw_donor or pasted.size > 0
    assert saw_donor


def test_random_patch_pool_fill_and_probability_gates():
    from ieee_tpu.data.transforms import RandomPatchPool

    # below min fill: image returned unchanged
    pool = RandomPatchPool(min_sample_size=100, seed=1)
    img = np.full((64, 32, 3), 200, np.uint8)
    out = pool(img)
    assert np.array_equal(out, img)

    # prob_happen=0: pool fills but never pastes
    pool = RandomPatchPool(min_sample_size=2, prob_happen=0.0, seed=2)
    for _ in range(5):
        out = pool(img)
        assert np.array_equal(out, img)
    assert len(pool.pool) >= 2


def test_build_host_transform_dispatch():
    from ieee_tpu.data.transforms import RandomPatchPool, build_host_transform

    assert build_host_transform(["random_flip"]) is None
    assert build_host_transform(None) is None
    ht = build_host_transform(["random_flip", "random_patch"])
    assert isinstance(ht, RandomPatchPool)


def test_loader_applies_host_transform():
    from ieee_tpu.data import ImageDataManager

    dm = ImageDataManager(
        sources="synthetic", height=32, width=16, batch_size_train=8,
        batch_size_test=8, workers=0, num_pids=4, imgs_per_pid=4,
        transforms=["random_flip", "random_patch"], verbose=False, seed=0,
    )
    assert dm.host_transform_tr is not None
    assert dm.train_loader.host_transform is dm.host_transform_tr
    # test loaders never see the occlusion transform
    tl = dm.test_loader["synthetic"]["query"]
    assert tl.host_transform is None
    batch = next(iter(dm.train_loader))
    assert batch["img"].dtype == np.uint8


def test_color_jitter_saturation_and_hue():
    import jax.numpy as jnp

    from ieee_tpu.data.transforms import _color_jitter, _hue_shift

    # hue: rotating pure red by 1/3 of the circle gives pure green; by 2/3
    # pure blue (torchvision hue semantics, fraction of full circle)
    red = jnp.zeros((1, 2, 2, 3)).at[..., 0].set(1.0)
    green = np.asarray(_hue_shift(red, jnp.full((1, 1, 1, 1), 1.0 / 3)))
    np.testing.assert_allclose(green[..., 1], 1.0, atol=1e-5)
    np.testing.assert_allclose(green[..., 0], 0.0, atol=1e-5)
    blue = np.asarray(_hue_shift(red, jnp.full((1, 1, 1, 1), 2.0 / 3)))
    np.testing.assert_allclose(blue[..., 2], 1.0, atol=1e-5)

    # saturation=0-range keeps images identical; gray images are fixed points
    # of any saturation factor
    gray = jnp.full((2, 4, 4, 3), 0.5)
    out = _color_jitter(jax.random.PRNGKey(0), gray, brightness=0,
                        contrast=0, saturation=0.8, hue=0)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)

    # full-jitter path runs with all four knobs active
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(2, 8, 4, 3)).astype(np.float32))
    out = _color_jitter(jax.random.PRNGKey(1), x, brightness=0.2,
                        contrast=0.15, saturation=0.3, hue=0.1)
    assert out.shape == x.shape
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0


def test_color_jitter_randomizes_two_op_order_per_image():
    """With brightness+contrast (the reference config), torchvision draws the
    op ORDER at random per image; our batch transform must produce a mix of
    both orders — every image equals one of the two compositions, and over a
    batch both orders appear."""
    import jax
    import jax.numpy as jnp

    from ieee_tpu.data.transforms import _color_jitter, _rgb_to_gray

    B = 32
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(size=(B, 6, 4, 3)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    bright, contr = 0.5, 0.5
    out = np.asarray(_color_jitter(key, x, brightness=bright,
                                   contrast=contr, saturation=0, hue=0))

    # recompute the two compositions with the SAME internal factor draws
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    bf = jax.random.uniform(k1, (B, 1, 1, 1), minval=1 - bright,
                            maxval=1 + bright)
    cf = jax.random.uniform(k2, (B, 1, 1, 1), minval=1 - contr,
                            maxval=1 + contr)

    def do_b(v):
        return jnp.clip(v * bf, 0.0, 1.0)

    def do_c(v):
        gray = _rgb_to_gray(v).mean(axis=(1, 2), keepdims=True)
        return jnp.clip((v - gray) * cf + gray, 0.0, 1.0)

    fwd = np.asarray(do_c(do_b(x)))
    rev = np.asarray(do_b(do_c(x)))

    is_fwd = np.array([np.allclose(out[i], fwd[i], atol=1e-6)
                       for i in range(B)])
    is_rev = np.array([np.allclose(out[i], rev[i], atol=1e-6)
                       for i in range(B)])
    assert np.all(is_fwd | is_rev)
    assert is_fwd.any() and is_rev.any()


def test_color_jitter_randomizes_three_op_order_per_image():
    """With >= 3 enabled ops torchvision still applies a uniform random
    permutation per image; every output must equal one of the 3! = 6
    compositions (same factor draws), and over a batch all 6 appear."""
    import itertools

    import jax
    import jax.numpy as jnp

    from ieee_tpu.data.transforms import _color_jitter, _rgb_to_gray

    B = 96
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(size=(B, 6, 4, 3)).astype(np.float32))
    key = jax.random.PRNGKey(11)
    bright = contr = sat = 0.5
    out = np.asarray(_color_jitter(key, x, brightness=bright, contrast=contr,
                                   saturation=sat, hue=0))

    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    bf = jax.random.uniform(k1, (B, 1, 1, 1), minval=1 - bright,
                            maxval=1 + bright)
    cf = jax.random.uniform(k2, (B, 1, 1, 1), minval=1 - contr,
                            maxval=1 + contr)
    sf = jax.random.uniform(k3, (B, 1, 1, 1), minval=1 - sat, maxval=1 + sat)

    def do_b(v):
        return jnp.clip(v * bf, 0.0, 1.0)

    def do_c(v):
        gray = _rgb_to_gray(v).mean(axis=(1, 2), keepdims=True)
        return jnp.clip((v - gray) * cf + gray, 0.0, 1.0)

    def do_s(v):
        gray = _rgb_to_gray(v)
        return jnp.clip(gray + (v - gray) * sf, 0.0, 1.0)

    orders = list(itertools.permutations((do_b, do_c, do_s)))
    comps = []
    for order in orders:
        v = x
        for op in order:
            v = op(v)
        comps.append(np.asarray(v))

    matches = np.stack([
        np.array([np.allclose(out[i], comp[i], atol=1e-6) for i in range(B)])
        for comp in comps
    ])  # (6, B)
    assert np.all(matches.any(axis=0)), "an image matched no permutation"
    assert np.all(matches.sum(axis=1) > 0), "a permutation never occurred"


def test_loader_thread_pool_order_and_completeness():
    """workers>=2 decodes via a thread pool but must deliver every batch in
    sampler order (the P x K pid-grouping contract depends on it)."""
    from ieee_tpu.data.datasets import init_image_dataset
    from ieee_tpu.data.loader import DataLoader

    ds = init_image_dataset("synthetic", mode="train", num_pids=6,
                            imgs_per_pid=6, height=16, width=8, verbose=False)
    for workers in (0, 1, 3):
        dl = DataLoader(ds, sampler=range(len(ds)), batch_size=5,
                        drop_last=False, workers=workers, prefetch=2)
        batches = list(iter(dl))
        pids = np.concatenate([b["pid"] for b in batches])
        if workers == 0:
            ref_pids = pids
        else:
            np.testing.assert_array_equal(pids, ref_pids)
        assert len(pids) == len(ds)
    # early abandonment leaks nothing and the pool shuts down
    dl = DataLoader(ds, sampler=range(len(ds)), batch_size=5, workers=3)
    it = iter(dl)
    next(it)
    it.close()  # no hang


def test_loader_pool_with_host_transform():
    from ieee_tpu.data.datasets import init_image_dataset
    from ieee_tpu.data.loader import DataLoader
    from ieee_tpu.data.transforms import RandomPatchPool

    ds = init_image_dataset("synthetic", mode="train", num_pids=4,
                            imgs_per_pid=6, height=32, width=16,
                            verbose=False)
    pool = RandomPatchPool(min_sample_size=3, prob_happen=1.0, seed=0)
    dl = DataLoader(ds, sampler=range(len(ds)), batch_size=4, workers=3,
                    host_transform=pool)
    batches = list(iter(dl))
    assert sum(len(b["pid"]) for b in batches) == len(ds)
    assert len(pool.pool) > 0  # the shared pool accumulated patches


def test_decode_cache_exact_and_persistent(tmp_path):
    """CachedDataset (data/cache.py) serves byte-identical images to the
    wrapped dataset, across epochs and across instances (disk persistence),
    single- and multi-modal."""
    import numpy as np

    from ieee_tpu.data.cache import CachedDataset
    from ieee_tpu.data.datasets import init_image_dataset

    for source in ("synthetic", "synthetic_mm"):
        ds = init_image_dataset(source, mode="train", root="", height=32,
                                width=16, num_pids=4, imgs_per_pid=4,
                                verbose=False)
        cached = CachedDataset(ds, str(tmp_path))
        for i in range(len(ds)):
            a, b = ds[i], cached[i]  # first touch: fill
            if isinstance(a["img"], list):
                for x, y in zip(a["img"], b["img"]):
                    np.testing.assert_array_equal(x, y)
            else:
                np.testing.assert_array_equal(a["img"], b["img"])
            assert a["pid"] == b["pid"] and a["camid"] == b["camid"]
        # second epoch: memmap hits
        for i in range(len(ds)):
            a, b = ds[i], cached[i]
            if isinstance(a["img"], list):
                np.testing.assert_array_equal(np.stack(a["img"]),
                                              np.stack(b["img"]))
            else:
                np.testing.assert_array_equal(a["img"], b["img"])
        # a fresh instance reuses the disk cache (fill flags persisted)
        cached2 = CachedDataset(ds, str(tmp_path))
        assert cached2._fill.sum() == len(ds)
        item = cached2[0]
        ref = ds[0]
        got = np.stack(item["img"]) if isinstance(item["img"], list) \
            else item["img"]
        want = np.stack(ref["img"]) if isinstance(ref["img"], list) \
            else ref["img"]
        np.testing.assert_array_equal(got, want)
        assert item["pid"] == ref["pid"]


def test_decode_cache_through_datamanager():
    """decode_cache=True wires a CachedDataset into the train loader and
    yields identical batches to the uncached manager."""
    import numpy as np

    from ieee_tpu.data import ImageDataManager

    def batches(cache):
        dm = ImageDataManager(
            sources="synthetic_mm", height=32, width=16,
            batch_size_train=8, batch_size_test=8, workers=0,
            train_sampler="RandomIdentitySampler", num_instances=4,
            num_pids=4, imgs_per_pid=8, verbose=False, seed=0,
            transforms=None, decode_cache=cache,
        )
        return [b for b in dm.train_loader]

    plain = batches(False)
    cached = batches(True)
    assert len(plain) == len(cached) > 0
    for a, b in zip(plain, cached):
        np.testing.assert_array_equal(a["pid"], b["pid"])
        for x, y in zip(a["img"], b["img"]):
            np.testing.assert_array_equal(x, y)


def test_decode_cache_warm_restart_meta_matches_cold(tmp_path):
    """Warm-restart cache hits (meta rebuilt from the dataset tuples) must
    return the SAME dict shape/values as a cold decode: impath is the first
    path string, and multi-modal items carry timeid."""
    import numpy as np

    from ieee_tpu.data.cache import CachedDataset
    from ieee_tpu.data.datasets import init_image_dataset

    ds = init_image_dataset("synthetic_mm", mode="train", root="", height=32,
                            width=16, num_pids=3, imgs_per_pid=2,
                            verbose=False)
    CachedDataset(ds, str(tmp_path))[0]  # fill entry 0, drop the instance
    warm = CachedDataset(ds, str(tmp_path))  # fresh instance: no meta dict
    assert warm._fill[0]
    a, b = ds[0], warm[0]
    assert set(a.keys()) == set(b.keys())
    assert a["impath"] == b["impath"] and isinstance(b["impath"], str)
    assert a["timeid"] == b["timeid"]
    assert a["pid"] == b["pid"] and a["camid"] == b["camid"]
    np.testing.assert_array_equal(np.stack(a["img"]), np.stack(b["img"]))


def test_decode_cache_hits_are_copies(tmp_path):
    """Cache hits must hand out COPIES: a consumer mutating the array in
    place must not corrupt the persistent on-disk cache."""
    import numpy as np

    from ieee_tpu.data.cache import CachedDataset
    from ieee_tpu.data.datasets import init_image_dataset

    ds = init_image_dataset("synthetic", mode="train", root="", height=32,
                            width=16, num_pids=2, imgs_per_pid=2,
                            verbose=False)
    cached = CachedDataset(ds, str(tmp_path))
    cached[0]  # fill
    hit = cached[0]  # memmap hit
    orig = hit["img"].copy()
    hit["img"][:] = 0  # consumer scribbles on the array
    np.testing.assert_array_equal(cached[0]["img"], orig)


def test_synthetic_render_any_size():
    """Non-multiple-of-8/4 sizes used to crash the plain synthetic render
    (floor-division kron vs full-size noise)."""
    from ieee_tpu.data.datasets import init_image_dataset

    ds = init_image_dataset("synthetic", mode="train", root="", height=100,
                            width=50, num_pids=2, imgs_per_pid=2,
                            verbose=False)
    item = ds[0]
    assert item["img"].shape == (100, 50, 3)
    ds_c = init_image_dataset("synthetic", mode="train", root="", height=100,
                              width=50, num_pids=2, imgs_per_pid=2,
                              correlated=True, verbose=False)
    assert ds_c[0]["img"].shape == (100, 50, 3)


def test_domain_sampler_len_is_exact():
    """RandomDomainSampler.__len__ must equal the yielded stream length
    even with imbalanced domains (the reference materializes one draw;
    len(data_source) overestimates)."""
    from ieee_tpu.data.sampler import RandomDatasetSampler, RandomDomainSampler

    # camid 0: 4 items, camid 1: 40 items -> iteration stops early
    data = [("p", 0, 0, 0)] * 4 + [("p", 0, 1, 0)] * 40
    s = RandomDomainSampler(data, batch_size=4, n_domain=2, seed=0)
    stream = list(s)
    assert len(s) == len(stream)
    assert len(s) < len(data)
    # dataset-balanced flavor: dsetid in slot 3
    data = [("p", 0, 0, 0)] * 4 + [("p", 0, 0, 1)] * 40
    s = RandomDatasetSampler(data, batch_size=4, n_dataset=2, seed=0)
    assert len(s) == len(list(s))


def test_video_random_frame_sampling_seeded():
    """sample_method='random' draws from a seeded per-dataset Generator:
    same seed -> same frame subsets; different seed -> different."""
    import numpy as np

    from ieee_tpu.data.datasets import init_video_dataset

    def frames(seed):
        ds = init_video_dataset("synthetic_video", mode="train", root="",
                                height=32, width=16, num_pids=2,
                                tracklets_per_pid=2, frames_per_tracklet=9,
                                seq_len=4, sample_method="random", seed=seed,
                                verbose=False)
        return np.stack([ds[i]["img"] for i in range(len(ds))])

    np.testing.assert_array_equal(frames(0), frames(0))
    assert not np.array_equal(frames(0), frames(1))
