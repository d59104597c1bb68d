"""SenseReID — test-only dataset
(reference ``torchreid/data/datasets/image/sensereid.py``). Train is a dummy
copy of query+gallery (the set has no training split)."""

from __future__ import annotations

import copy
import glob
import os.path as osp

from ..base import ImageDataset


class SenseReID(ImageDataset):
    dataset_dir = "sensereid"
    dataset_url = None

    def __init__(self, root="", **kwargs):
        self.root = osp.abspath(osp.expanduser(root))
        self.dataset_dir = osp.join(self.root, self.dataset_dir)
        self.query_dir = osp.join(self.dataset_dir, "SenseReID", "test_probe")
        self.gallery_dir = osp.join(self.dataset_dir, "SenseReID",
                                    "test_gallery")
        self.check_before_run([self.dataset_dir, self.query_dir,
                               self.gallery_dir])

        query = self.process_dir(self.query_dir)
        gallery = self.process_dir(self.gallery_dir)

        g_pids = sorted({pid for _, pid, _ in gallery})
        pid2label = {pid: i for i, pid in enumerate(g_pids)}
        query = [(p, pid2label[pid], c) for p, pid, c in query]
        gallery = [(p, pid2label[pid], c) for p, pid, c in gallery]
        train = copy.deepcopy(query) + copy.deepcopy(gallery)  # dummy
        super().__init__(train, query, gallery, **kwargs)

    @staticmethod
    def process_dir(dir_path):
        img_paths = sorted(glob.glob(osp.join(dir_path, "*.jpg")))
        data = []
        for img_path in img_paths:
            img_name = osp.splitext(osp.basename(img_path))[0]
            pid, camid = map(int, img_name.split("_"))
            data.append((img_path, pid, camid))
        return data
