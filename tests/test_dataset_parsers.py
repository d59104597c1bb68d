"""Parser tests against fabricated on-disk dataset layouts (golden-file
style, SURVEY §4): RGBNT201 and Market1501 directory conventions."""

import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from ieee_tpu.data import init_image_dataset


def _write_jpg(path, h=32, w=16):
    os.makedirs(osp.dirname(path), exist_ok=True)
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (h, w, 3), np.uint8)
    ).save(path)


@pytest.fixture
def rgbnt201_root(tmp_path):
    root = tmp_path
    base = root / "RGBNT201"
    # name format: <pid:6>_cam<camid>... e.g. 000001_cam2_0.jpg
    names = [
        "000001_cam1_0.jpg", "000001_cam2_1.jpg",
        "000002_cam1_0.jpg", "000002_cam3_1.jpg",
    ]
    for split in ("train_171", "test"):
        for modal in ("RGB", "NI", "TI"):
            for n in names:
                _write_jpg(str(base / split / modal / n))
    return str(root)


def test_rgbnt201_parser(rgbnt201_root):
    ds = init_image_dataset("RGBNT201", root=rgbnt201_root, mode="train",
                            verbose=False, height=32, width=16)
    assert ds.num_train_pids == 2  # relabeled 000001/000002
    assert len(ds.train) == 4
    paths, pid, camid, _ = ds.train[0]
    assert len(paths) == 3  # R, N, T triplet
    assert {osp.basename(p) for p in paths} == {osp.basename(paths[0])}
    # camid is 4th char of the cam field, 0-based
    cams = sorted({item[2] for item in ds.train})
    assert cams == [0, 1, 2]
    item = ds[0]
    assert len(item["img"]) == 3
    assert item["img"][0].shape == (32, 16, 3)


@pytest.fixture
def market_root(tmp_path):
    base = tmp_path / "market1501" / "Market-1501-v15.09.15"
    names_train = ["0002_c1s1_000451_03.jpg", "0002_c2s1_000551_01.jpg",
                   "0007_c3s3_077419_03.jpg"]
    names_q = ["0002_c1s1_000301_00.jpg"]
    names_g = ["0002_c2s1_000801_00.jpg", "-1_c1s1_000401_03.jpg",
               "0000_c4s6_000810_02.jpg"]
    for n in names_train:
        _write_jpg(str(base / "bounding_box_train" / n))
    for n in names_q:
        _write_jpg(str(base / "query" / n))
    for n in names_g:
        _write_jpg(str(base / "bounding_box_test" / n))
    return str(tmp_path)


def test_market1501_parser(market_root):
    ds = init_image_dataset("market1501", root=market_root, mode="query",
                            verbose=False, height=32, width=16)
    assert ds.num_train_pids == 2
    assert len(ds.query) == 1
    # junk pid -1 dropped from gallery; pid 0 (background) kept but junk-listed
    g_pids = {item[1] for item in ds.gallery}
    assert -1 not in g_pids
    assert 0 in ds._junk_pids
    # camid 0-based
    assert ds.query[0][2] == 0


@pytest.fixture
def allday_root(tmp_path):
    base = tmp_path / "AllDay"
    # name: <pid:6>_cam<camid>_<timeid>_x.jpg
    names = ["000001_cam1_1_0.jpg", "000002_cam2_2_0.jpg"]
    for modal in ("RGB", "NI", "TI"):
        for n in names:
            _write_jpg(str(base / "train" / modal / n))
    for modal in ("RGB", "NI_change_ID_final", "TI_change_ID_final"):
        for n in names:
            _write_jpg(str(base / "test" / modal / n))
    return str(tmp_path)


def test_allday_parser(allday_root):
    ds = init_image_dataset("AllDay", root=allday_root, mode="train",
                            verbose=False, height=32, width=16)
    assert ds.num_train_pids == 2
    # timeid carried in the 4th tuple slot
    timeids = sorted({item[3] for item in ds.train})
    assert timeids == [1, 2]
    # test NI/TI resolve into the *_change_ID_final dirs
    q = ds.query[0][0]
    assert "NI_change_ID_final" in q[1]


@pytest.fixture
def uav_root(tmp_path):
    base = tmp_path / "UAVdata"
    names = ["p001a.jpg", "p002b.jpg", "p001c.jpg"]
    for split in ("train", "query", "gallery"):
        for modal in ("RGB", "Gray"):
            for n in names:
                _write_jpg(str(base / split / modal / n))
    return str(tmp_path)


def test_uav_parser(uav_root):
    ds = init_image_dataset("UAVdata", root=uav_root, mode="train",
                            verbose=False, height=32, width=16)
    assert ds.num_train_pids == 2  # p001 (x2), p002
    item = ds[0]
    assert len(item["img"]) == 2  # RGB + Gray
    # camid is a running index
    cams = [it[2] for it in ds.train]
    assert cams == sorted(cams)
