"""University-1652 drone-satellite geo-localization set
(reference ``torchreid/data/datasets/image/university1652.py``). Train dirs
are nested one level deeper than test; camid is a fake running index.
Auto-download dropped (gdown not available; dataset is manual)."""

from __future__ import annotations

import glob
import os
import os.path as osp

from ..base import ImageDataset

IMG_EXTENSIONS = (
    ".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif", ".tiff", ".webp"
)


class University1652(ImageDataset):
    dataset_dir = "university1652"
    dataset_url = None

    def __init__(self, root="", **kwargs):
        self.root = osp.abspath(osp.expanduser(root))
        self.dataset_dir = osp.join(self.root, self.dataset_dir)
        self.train_dir = osp.join(self.dataset_dir, "University-Release/train/")
        self.query_dir = osp.join(self.dataset_dir,
                                  "University-Release/test/query_drone")
        self.gallery_dir = osp.join(self.dataset_dir,
                                    "University-Release/test/gallery_satellite")
        self.check_before_run(
            [self.dataset_dir, self.train_dir, self.query_dir, self.gallery_dir]
        )
        self.fake_camid = 0
        train = self.process_dir(self.train_dir, relabel=True, train=True)
        query = self.process_dir(self.query_dir, relabel=False)
        gallery = self.process_dir(self.gallery_dir, relabel=False)
        super().__init__(train, query, gallery, **kwargs)

    def process_dir(self, dir_path, relabel=False, train=False):
        pattern = "*/*/*" if train else "*/*"
        img_paths = sorted(glob.glob(osp.join(dir_path, pattern)))
        img_paths = [p for p in img_paths
                     if p.lower().endswith(IMG_EXTENSIONS)]
        pid_container = {
            int(os.path.basename(os.path.dirname(p))) for p in img_paths
        }
        pid2label = {pid: label for label, pid in enumerate(sorted(pid_container))}
        data = []
        for img_path in img_paths:
            pid = int(os.path.basename(os.path.dirname(img_path)))
            if relabel:
                pid = pid2label[pid]
            data.append((img_path, pid, self.fake_camid))
            self.fake_camid += 1
        return data
