"""GRID (reference ``torchreid/data/datasets/image/grid.py``).

identities: 250, images 1275, cameras 8. Splits come from the dataset's own
``features_and_partitions.mat`` (10 predefined partitions).
"""

from __future__ import annotations

import glob
import os.path as osp

from ....utils.tools import read_json, write_json
from ..base import ImageDataset


class GRID(ImageDataset):
    dataset_dir = "grid"
    dataset_url = None
    _junk_pids = [0]

    def __init__(self, root="", split_id=0, **kwargs):
        self.root = osp.abspath(osp.expanduser(root))
        self.dataset_dir = osp.join(self.root, self.dataset_dir)
        self.probe_path = osp.join(self.dataset_dir, "underground_reid", "probe")
        self.gallery_path = osp.join(self.dataset_dir, "underground_reid",
                                     "gallery")
        self.split_mat_path = osp.join(
            self.dataset_dir, "underground_reid", "features_and_partitions.mat"
        )
        self.split_path = osp.join(self.dataset_dir, "splits.json")
        self.check_before_run([self.dataset_dir, self.probe_path,
                               self.gallery_path, self.split_mat_path])

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
        from scipy.io import loadmat

        print("Creating 10 random splits")
        split_mat = loadmat(self.split_mat_path)
        train_idx_all = split_mat["trainIdxAll"][0]  # length = 10
        probe_img_paths = sorted(glob.glob(osp.join(self.probe_path, "*.jpeg")))
        gallery_img_paths = sorted(
            glob.glob(osp.join(self.gallery_path, "*.jpeg"))
        )

        splits = []
        for split_idx in range(10):
            train_idxs = train_idx_all[split_idx][0][0][2][0].tolist()
            assert len(train_idxs) == 125
            idx2label = {idx: label for label, idx in enumerate(train_idxs)}

            train, query, gallery = [], [], []
            for bucket, paths in (("probe", probe_img_paths),
                                  ("gallery", gallery_img_paths)):
                for img_path in paths:
                    img_name = osp.basename(img_path)
                    img_idx = int(img_name.split("_")[0])
                    camid = int(img_name.split("_")[1]) - 1
                    if img_idx in train_idxs:
                        train.append((img_path, idx2label[img_idx], camid))
                    elif bucket == "probe":
                        query.append((img_path, img_idx, camid))
                    else:
                        gallery.append((img_path, img_idx, camid))

            splits.append({
                "train": train, "query": query, "gallery": gallery,
                "num_train_pids": 125, "num_query_pids": 125,
                "num_gallery_pids": 900,
            })
        print(f"Totally {len(splits)} splits are created")
        write_json(splits, self.split_path)
