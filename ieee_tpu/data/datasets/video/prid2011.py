"""PRID2011 multi-shot video (reference ``torchreid/data/datasets/video/prid2011.py``).

178 usable identities across cam_a/cam_b tracklet dirs; split JSONs list
train/test dir names.
"""

from __future__ import annotations

import glob
import os.path as osp

from ....utils.tools import read_json
from ..base import VideoDataset


class PRID2011(VideoDataset):
    dataset_dir = "prid2011"
    dataset_url = None

    def __init__(self, root="", split_id=0, **kwargs):
        self.root = osp.abspath(osp.expanduser(root))
        self.dataset_dir = osp.join(self.root, self.dataset_dir)
        self.split_path = osp.join(self.dataset_dir, "splits_prid2011.json")
        self.cam_a_dir = osp.join(self.dataset_dir, "prid_2011", "multi_shot",
                                  "cam_a")
        self.cam_b_dir = osp.join(self.dataset_dir, "prid_2011", "multi_shot",
                                  "cam_b")
        self.check_before_run([self.dataset_dir, self.cam_a_dir, self.cam_b_dir])

        splits = read_json(self.split_path)
        if split_id >= len(splits):
            raise ValueError(
                f"split_id exceeds range, received {split_id}, expected "
                f"between 0 and {len(splits) - 1}"
            )
        split = splits[split_id]
        train_dirs, test_dirs = split["train"], split["test"]
        train = self.process_dir(train_dirs, cam1=True, cam2=True)
        query = self.process_dir(test_dirs, cam1=True, cam2=False)
        gallery = self.process_dir(test_dirs, cam1=False, cam2=True)
        super().__init__(train, query, gallery, **kwargs)

    def process_dir(self, dirnames, cam1=True, cam2=True):
        tracklets = []
        dirname2pid = {dirname: i for i, dirname in enumerate(dirnames)}
        for dirname in dirnames:
            pid = dirname2pid[dirname]
            if cam1:
                imgs = tuple(sorted(glob.glob(
                    osp.join(self.cam_a_dir, dirname, "*.png"))))
                assert imgs
                tracklets.append((imgs, pid, 0))
            if cam2:
                imgs = tuple(sorted(glob.glob(
                    osp.join(self.cam_b_dir, dirname, "*.png"))))
                assert imgs
                tracklets.append((imgs, pid, 1))
        return tracklets
