"""VIPeR (reference ``torchreid/data/datasets/image/viper.py``).

identities: 632, 2 cameras, one image per identity per camera. 10 random
half splits x 2 query/gallery directions = 20 splits in splits.json.
"""

from __future__ import annotations

import glob
import os.path as osp

import numpy as np

from ....utils.tools import read_json, write_json
from ..base import ImageDataset


class VIPeR(ImageDataset):
    dataset_dir = "viper"
    dataset_url = None

    def __init__(self, root="", split_id=0, **kwargs):
        self.root = osp.abspath(osp.expanduser(root))
        self.dataset_dir = osp.join(self.root, self.dataset_dir)
        self.cam_a_dir = osp.join(self.dataset_dir, "VIPeR", "cam_a")
        self.cam_b_dir = osp.join(self.dataset_dir, "VIPeR", "cam_b")
        self.split_path = osp.join(self.dataset_dir, "splits.json")
        self.check_before_run([self.dataset_dir, self.cam_a_dir, self.cam_b_dir])

        self.prepare_split()
        splits = read_json(self.split_path)
        if split_id >= len(splits):
            raise ValueError(
                f"split_id exceeds range, received {split_id}, expected "
                f"between 0 and {len(splits) - 1}"
            )
        split = splits[split_id]
        train = [tuple(item) for item in split["train"]]
        query = [tuple(item) for item in split["query"]]
        gallery = [tuple(item) for item in split["gallery"]]
        super().__init__(train, query, gallery, **kwargs)

    def prepare_split(self):
        if osp.exists(self.split_path):
            return
        print("Creating 10 random splits of train ids and test ids")
        cam_a_imgs = sorted(glob.glob(osp.join(self.cam_a_dir, "*.bmp")))
        cam_b_imgs = sorted(glob.glob(osp.join(self.cam_b_dir, "*.bmp")))
        assert len(cam_a_imgs) == len(cam_b_imgs)
        num_pids = len(cam_a_imgs)
        num_train_pids = num_pids // 2
        rng = np.random.default_rng(0)

        splits = []
        for _ in range(10):
            order = rng.permutation(num_pids)
            train_idxs = order[:num_train_pids]
            test_idxs = order[num_train_pids:]

            train = []
            for pid, idx in enumerate(train_idxs):
                train.append((cam_a_imgs[idx], pid, 0))
                train.append((cam_b_imgs[idx], pid, 1))
            test_a = [(cam_a_imgs[idx], pid, 0) for pid, idx in
                      enumerate(test_idxs)]
            test_b = [(cam_b_imgs[idx], pid, 1) for pid, idx in
                      enumerate(test_idxs)]

            # both query/gallery directions, as the reference
            for q, g in ((test_a, test_b), (test_b, test_a)):
                splits.append({
                    "train": train, "query": q, "gallery": g,
                    "num_train_pids": num_train_pids,
                    "num_query_pids": num_pids - num_train_pids,
                    "num_gallery_pids": num_pids - num_train_pids,
                })
        print(f"Totally {len(splits)} splits are created")
        write_json(splits, self.split_path)
