"""CUHK-SYSU — train-only person-search crops
(reference ``torchreid/data/datasets/image/cuhksysu.py``). Dummy camera id 0;
query/gallery are single-item placeholders."""

from __future__ import annotations

import copy
import glob
import os.path as osp

from ..base import ImageDataset


class CUHKSYSU(ImageDataset):
    _train_only = True
    dataset_dir = "cuhksysu"
    dataset_url = None

    def __init__(self, root="", **kwargs):
        self.root = osp.abspath(osp.expanduser(root))
        self.dataset_dir = osp.join(self.root, self.dataset_dir)
        self.data_dir = osp.join(self.dataset_dir, "cropped_images")
        self.check_before_run([self.dataset_dir, self.data_dir])

        train = self.process_dir(self.data_dir)
        query = [copy.deepcopy(train[0])]
        gallery = [copy.deepcopy(train[0])]
        super().__init__(train, query, gallery, **kwargs)

    @staticmethod
    def process_dir(dirname):
        img_paths = sorted(glob.glob(osp.join(dirname, "*.jpg")))
        pid_container = {osp.basename(p).split("_")[0] for p in img_paths}
        pid2label = {pid: label for label, pid in enumerate(sorted(pid_container))}
        return [
            (p, pid2label[osp.basename(p).split("_")[0]], 0) for p in img_paths
        ]
