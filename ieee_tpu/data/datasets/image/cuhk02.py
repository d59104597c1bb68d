"""CUHK02 (reference ``torchreid/data/datasets/image/cuhk02.py``).

5 camera pairs P1-P5 (1816 identities total); P1-P4 train, P5 evaluates
(cam1 = query, cam2 = gallery).
"""

from __future__ import annotations

import glob
import os.path as osp

from ..base import ImageDataset


class CUHK02(ImageDataset):
    dataset_dir = "cuhk02"
    cam_pairs = ["P1", "P2", "P3", "P4", "P5"]
    test_cam_pair = "P5"

    def __init__(self, root="", **kwargs):
        self.root = osp.abspath(osp.expanduser(root))
        self.dataset_dir = osp.join(self.root, self.dataset_dir, "Dataset")
        self.check_before_run([self.dataset_dir])
        train, query, gallery = self.get_data_list()
        super().__init__(train, query, gallery, **kwargs)

    def get_data_list(self):
        num_train_pids, camid = 0, 0
        train, query, gallery = [], [], []
        for cam_pair in self.cam_pairs:
            cam_pair_dir = osp.join(self.dataset_dir, cam_pair)
            impaths1 = sorted(glob.glob(osp.join(cam_pair_dir, "cam1", "*.png")))
            impaths2 = sorted(glob.glob(osp.join(cam_pair_dir, "cam2", "*.png")))
            if cam_pair == self.test_cam_pair:
                for impath in impaths1:
                    query.append((impath, int(osp.basename(impath).split("_")[0]),
                                  camid))
                camid += 1
                for impath in impaths2:
                    gallery.append(
                        (impath, int(osp.basename(impath).split("_")[0]), camid)
                    )
                camid += 1
            else:
                pids1 = [osp.basename(p).split("_")[0] for p in impaths1]
                pids2 = [osp.basename(p).split("_")[0] for p in impaths2]
                pids = sorted(set(pids1 + pids2))
                pid2label = {
                    pid: label + num_train_pids for label, pid in enumerate(pids)
                }
                for impath in impaths1:
                    train.append(
                        (impath, pid2label[osp.basename(impath).split("_")[0]],
                         camid)
                    )
                camid += 1
                for impath in impaths2:
                    train.append(
                        (impath, pid2label[osp.basename(impath).split("_")[0]],
                         camid)
                    )
                camid += 1
                num_train_pids += len(pids)
        return train, query, gallery
