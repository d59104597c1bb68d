"""MSMT17 (reference ``torchreid/data/datasets/image/msmt17.py``).

identities: 4101; images 32621 train / 11659 query / 82161 gallery;
cameras: 15. Supports V1 and V2 folder layouts via the list_*.txt files.
"""

from __future__ import annotations

import os.path as osp

from ..base import ImageDataset

VERSION_DICT = {
    "MSMT17_V1": {"train_dir": "train", "test_dir": "test"},
    "MSMT17_V2": {"train_dir": "mask_train_v2", "test_dir": "mask_test_v2"},
}


class MSMT17(ImageDataset):
    dataset_dir = "msmt17"
    dataset_url = None

    def __init__(self, root="", combineall=False, **kwargs):
        self.root = osp.abspath(osp.expanduser(root))
        self.dataset_dir = osp.join(self.root, self.dataset_dir)

        main_dir = None
        for candidate in VERSION_DICT:
            if osp.exists(osp.join(self.dataset_dir, candidate)):
                main_dir = candidate
                break
        if main_dir is None:
            raise RuntimeError(f"Dataset folder not found under {self.dataset_dir}")
        sub = VERSION_DICT[main_dir]

        self.train_dir = osp.join(self.dataset_dir, main_dir, sub["train_dir"])
        self.test_dir = osp.join(self.dataset_dir, main_dir, sub["test_dir"])
        base = osp.join(self.dataset_dir, main_dir)
        self.check_before_run([self.dataset_dir, self.train_dir, self.test_dir])

        train = self.process_dir(self.train_dir, osp.join(base, "list_train.txt"))
        val = self.process_dir(self.train_dir, osp.join(base, "list_val.txt"))
        query = self.process_dir(self.test_dir, osp.join(base, "list_query.txt"))
        gallery = self.process_dir(self.test_dir,
                                   osp.join(base, "list_gallery.txt"))
        # do not add val to train by default (published-protocol fairness,
        # reference ``msmt17.py:79-81``)
        if combineall:
            train = train + val
        super().__init__(train, query, gallery, combineall=False, **kwargs)

    @staticmethod
    def process_dir(dir_path, list_path):
        with open(list_path, "r") as f:
            lines = f.readlines()
        data = []
        for line in lines:
            img_path, pid = line.split(" ")
            pid = int(pid)  # already relabeled in the lists
            camid = int(img_path.split("_")[2]) - 1
            data.append((osp.join(dir_path, img_path), pid, camid))
        return data
