"""DukeMTMC-reID (reference ``torchreid/data/datasets/image/dukemtmcreid.py``).

identities: 1404 (train+query); images 16522 train / 2228 query /
17661 gallery; cameras: 8.
"""

from __future__ import annotations

import glob
import os.path as osp
import re

from ..base import ImageDataset


class DukeMTMCreID(ImageDataset):
    dataset_dir = "dukemtmc-reid"
    dataset_url = None

    def __init__(self, root="", **kwargs):
        self.root = osp.abspath(osp.expanduser(root))
        self.dataset_dir = osp.join(self.root, self.dataset_dir)
        self.train_dir = osp.join(self.dataset_dir,
                                  "DukeMTMC-reID/bounding_box_train")
        self.query_dir = osp.join(self.dataset_dir, "DukeMTMC-reID/query")
        self.gallery_dir = osp.join(self.dataset_dir,
                                    "DukeMTMC-reID/bounding_box_test")
        self.check_before_run(
            [self.dataset_dir, self.train_dir, self.query_dir, self.gallery_dir]
        )
        train = self.process_dir(self.train_dir, relabel=True)
        query = self.process_dir(self.query_dir, relabel=False)
        gallery = self.process_dir(self.gallery_dir, relabel=False)
        super().__init__(train, query, gallery, **kwargs)

    @staticmethod
    def process_dir(dir_path, relabel=False):
        img_paths = sorted(glob.glob(osp.join(dir_path, "*.jpg")))
        pattern = re.compile(r"([-\d]+)_c(\d)")
        pid_container = {
            int(pattern.search(p).group(1)) for p in img_paths
        }
        pid2label = {pid: label for label, pid in enumerate(sorted(pid_container))}
        data = []
        for img_path in img_paths:
            pid, camid = map(int, pattern.search(img_path).groups())
            assert 1 <= camid <= 8
            camid -= 1
            if relabel:
                pid = pid2label[pid]
            data.append((img_path, pid, camid))
        return data
