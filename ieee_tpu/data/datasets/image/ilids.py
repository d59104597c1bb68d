"""QMUL-iLIDS (reference ``torchreid/data/datasets/image/ilids.py``).

identities: 119, images 476. 10 random half splits; per test id, one random
image is query and another is gallery. Image name: pid in chars [0:4],
camid in chars [4:7].
"""

from __future__ import annotations

import glob
import os.path as osp
from collections import defaultdict

import numpy as np

from ....utils.tools import read_json, write_json
from ..base import ImageDataset


class iLIDS(ImageDataset):
    dataset_dir = "ilids"
    dataset_url = None

    def __init__(self, root="", split_id=0, **kwargs):
        self.root = osp.abspath(osp.expanduser(root))
        self.dataset_dir = osp.join(self.root, self.dataset_dir)
        self.data_dir = osp.join(self.dataset_dir, "i-LIDS_Pedestrian/Persons")
        self.split_path = osp.join(self.dataset_dir, "splits.json")
        self.check_before_run([self.dataset_dir, self.data_dir])

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
        paths = glob.glob(osp.join(self.data_dir, "*.jpg"))
        img_names = sorted(osp.basename(p) for p in paths)
        assert len(img_names) == 476, (
            f"There should be 476 images, but got {len(img_names)}"
        )
        pid_dict = defaultdict(list)
        for name in img_names:
            pid_dict[int(name[:4])].append(name)
        pids = sorted(pid_dict.keys())
        assert len(pids) == 119
        num_train_pids = int(len(pids) * 0.5)
        rng = np.random.default_rng(0)

        splits = []
        for _ in range(10):
            order = rng.permutation(pids)
            train_pids = sorted(order[:num_train_pids].tolist())
            test_pids = sorted(order[num_train_pids:].tolist())
            train, query, gallery = [], [], []
            for pid in train_pids:
                train.extend(pid_dict[pid])
            for pid in test_pids:
                samples = rng.choice(pid_dict[pid], size=2, replace=False)
                query.append(str(samples[0]))
                gallery.append(str(samples[1]))
            splits.append({"train": train, "query": query, "gallery": gallery})
        print(f"Totally {len(splits)} splits are created")
        write_json(splits, self.split_path)

    @staticmethod
    def _pid2label(img_names):
        pids = {int(name[:4]) for name in img_names}
        return {pid: label for label, pid in enumerate(sorted(pids))}

    def _parse(self, img_names, pid2label=None):
        data = []
        for name in img_names:
            pid = int(name[:4])
            if pid2label is not None:
                pid = pid2label[pid]
            camid = int(name[4:7]) - 1
            data.append((osp.join(self.data_dir, name), pid, camid))
        return data

    def process_split(self, split):
        train = self._parse(split["train"], self._pid2label(split["train"]))
        query = self._parse(split["query"])
        gallery = self._parse(split["gallery"])
        return train, query, gallery
