"""PRID2011 single-shot (reference ``torchreid/data/datasets/image/prid.py``).

200 shared identities across cam_a/cam_b; pids 201..749 appear only in
cam_b and pad the gallery (marked junk for training).
"""

from __future__ import annotations

import os.path as osp

import numpy as np

from ....utils.tools import read_json, write_json
from ..base import ImageDataset


class PRID(ImageDataset):
    dataset_dir = "prid2011"
    dataset_url = None
    _junk_pids = list(range(201, 750))

    def __init__(self, root="", split_id=0, **kwargs):
        self.root = osp.abspath(osp.expanduser(root))
        self.dataset_dir = osp.join(self.root, self.dataset_dir)
        self.cam_a_dir = osp.join(self.dataset_dir, "prid_2011", "single_shot",
                                  "cam_a")
        self.cam_b_dir = osp.join(self.dataset_dir, "prid_2011", "single_shot",
                                  "cam_b")
        self.split_path = osp.join(self.dataset_dir, "splits_single_shot.json")
        self.check_before_run([self.dataset_dir, self.cam_a_dir, self.cam_b_dir])

        self.prepare_split()
        splits = read_json(self.split_path)
        if split_id >= len(splits):
            raise ValueError(
                f"split_id exceeds range, received {split_id}, expected "
                f"between 0 and {len(splits) - 1}"
            )
        train, query, gallery = self.process_split(splits[split_id])
        super().__init__(train, query, gallery, **kwargs)

    def prepare_split(self):
        if osp.exists(self.split_path):
            return
        print("Creating splits ...")
        rng = np.random.default_rng(0)
        splits = []
        for _ in range(10):
            pids = np.arange(1, 201)
            train_pids = sorted(
                rng.choice(pids, size=100, replace=False).tolist()
            )
            test_pids = [int(p) for p in pids if p not in set(train_pids)]
            splits.append({"train": train_pids, "test": test_pids})
        print(f"Totally {len(splits)} splits are created")
        write_json(splits, self.split_path)

    def process_split(self, split):
        train_pids, test_pids = split["train"], split["test"]
        pid2label = {pid: label for label, pid in enumerate(train_pids)}

        def name(pid):
            return f"person_{str(pid).zfill(4)}.png"

        train = []
        for pid in train_pids:
            train.append((osp.join(self.cam_a_dir, name(pid)), pid2label[pid], 0))
            train.append((osp.join(self.cam_b_dir, name(pid)), pid2label[pid], 1))
        query, gallery = [], []
        for pid in test_pids:
            query.append((osp.join(self.cam_a_dir, name(pid)), pid, 0))
            gallery.append((osp.join(self.cam_b_dir, name(pid)), pid, 1))
        for pid in range(201, 750):  # cam_b-only distractors
            gallery.append((osp.join(self.cam_b_dir, name(pid)), pid, 1))
        return train, query, gallery
