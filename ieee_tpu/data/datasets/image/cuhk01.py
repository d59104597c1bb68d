"""CUHK01 (reference ``torchreid/data/datasets/image/cuhk01.py``).

identities: 971, images 3884. Name format 0001001.png: pid = chars [0:4],
camera pair = (chars [4:7] - 1) // 2. 10 random half splits x 2 directions.
"""

from __future__ import annotations

import glob
import os.path as osp
import zipfile

import numpy as np

from ....utils.tools import read_json, write_json
from ..base import ImageDataset


class CUHK01(ImageDataset):
    dataset_dir = "cuhk01"
    dataset_url = None

    def __init__(self, root="", split_id=0, **kwargs):
        self.root = osp.abspath(osp.expanduser(root))
        self.dataset_dir = osp.join(self.root, self.dataset_dir)
        self.zip_path = osp.join(self.dataset_dir, "CUHK01.zip")
        self.campus_dir = osp.join(self.dataset_dir, "campus")
        self.split_path = osp.join(self.dataset_dir, "splits.json")
        self.extract_file()
        self.check_before_run([self.dataset_dir, self.campus_dir])

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

    def extract_file(self):
        if not osp.exists(self.campus_dir) and osp.exists(self.zip_path):
            print("Extracting files")
            with zipfile.ZipFile(self.zip_path, "r") as z:
                z.extractall(self.dataset_dir)

    def prepare_split(self):
        if osp.exists(self.split_path):
            return
        print("Creating 10 random splits of train ids and test ids")
        img_paths = sorted(glob.glob(osp.join(self.campus_dir, "*.png")))
        img_list = []
        pid_container = set()
        for img_path in img_paths:
            img_name = osp.basename(img_path)
            pid = int(img_name[:4]) - 1
            camid = (int(img_name[4:7]) - 1) // 2  # 0 or 1
            img_list.append((img_path, pid, camid))
            pid_container.add(pid)
        num_pids = len(pid_container)
        num_train_pids = num_pids // 2
        rng = np.random.default_rng(0)

        splits = []
        for _ in range(10):
            order = rng.permutation(num_pids)
            train_idxs = np.sort(order[:num_train_pids])
            idx2label = {int(idx): label for label, idx in
                         enumerate(train_idxs)}
            train_set = set(int(i) for i in train_idxs)

            train, test_a, test_b = [], [], []
            for img_path, pid, camid in img_list:
                if pid in train_set:
                    train.append((img_path, idx2label[pid], camid))
                elif camid == 0:
                    test_a.append((img_path, pid, camid))
                else:
                    test_b.append((img_path, pid, camid))

            for q, g in ((test_a, test_b), (test_b, test_a)):
                splits.append({
                    "train": train, "query": q, "gallery": g,
                    "num_train_pids": num_train_pids,
                    "num_query_pids": num_pids - num_train_pids,
                    "num_gallery_pids": num_pids - num_train_pids,
                })
        print(f"Totally {len(splits)} splits are created")
        write_json(splits, self.split_path)
