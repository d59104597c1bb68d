"""iLIDS-VID (reference ``torchreid/data/datasets/video/ilidsvid.py``).

300 identities, 600 tracklets, 2 cameras. 10 splits from the dataset's
train_test_splits mat (Wang et al. ECCV'14 protocol).
"""

from __future__ import annotations

import glob
import os.path as osp

from ....utils.tools import read_json, write_json
from ..base import VideoDataset


class iLIDSVID(VideoDataset):
    dataset_dir = "ilids-vid"
    dataset_url = None

    def __init__(self, root="", split_id=0, **kwargs):
        self.root = osp.abspath(osp.expanduser(root))
        self.dataset_dir = osp.join(self.root, self.dataset_dir)
        self.data_dir = osp.join(self.dataset_dir, "i-LIDS-VID")
        self.split_dir = osp.join(self.dataset_dir, "train-test people splits")
        self.split_mat_path = osp.join(self.split_dir,
                                       "train_test_splits_ilidsvid.mat")
        self.split_path = osp.join(self.dataset_dir, "splits.json")
        self.cam_1_path = osp.join(self.data_dir, "sequences/cam1")
        self.cam_2_path = osp.join(self.data_dir, "sequences/cam2")
        self.check_before_run([self.dataset_dir, self.data_dir, self.split_dir])

        self.prepare_split()
        splits = read_json(self.split_path)
        if split_id >= len(splits):
            raise ValueError(
                f"split_id exceeds range, received {split_id}, expected "
                f"between 0 and {len(splits) - 1}"
            )
        split = splits[split_id]
        train_dirs, test_dirs = split["train"], split["test"]
        train = self.process_data(train_dirs, cam1=True, cam2=True)
        query = self.process_data(test_dirs, cam1=True, cam2=False)
        gallery = self.process_data(test_dirs, cam1=False, cam2=True)
        super().__init__(train, query, gallery, **kwargs)

    def prepare_split(self):
        if osp.exists(self.split_path):
            return
        from scipy.io import loadmat

        print("Creating splits ...")
        mat_split_data = loadmat(self.split_mat_path)["ls_set"]
        num_splits, num_total_ids = mat_split_data.shape
        assert num_splits == 10 and num_total_ids == 300
        num_ids_each = num_total_ids // 2

        person_cam1_dirs = sorted(
            osp.basename(p) for p in glob.glob(osp.join(self.cam_1_path, "*"))
        )
        person_cam2_dirs = sorted(
            osp.basename(p) for p in glob.glob(osp.join(self.cam_2_path, "*"))
        )
        assert set(person_cam1_dirs) == set(person_cam2_dirs)

        splits = []
        for i in range(num_splits):
            train_idxs = [int(x) - 1 for x in
                          sorted(mat_split_data[i, num_ids_each:])]
            test_idxs = [int(x) - 1 for x in
                         sorted(mat_split_data[i, :num_ids_each])]
            splits.append({
                "train": [person_cam1_dirs[j] for j in train_idxs],
                "test": [person_cam1_dirs[j] for j in test_idxs],
            })
        print(f"Totally {len(splits)} splits are created, following "
              f"Wang et al. ECCV'14")
        write_json(splits, self.split_path)

    def process_data(self, dirnames, cam1=True, cam2=True):
        tracklets = []
        dirname2pid = {dirname: i for i, dirname in enumerate(dirnames)}
        for dirname in dirnames:
            pid = dirname2pid[dirname]
            if cam1:
                imgs = tuple(sorted(glob.glob(
                    osp.join(self.cam_1_path, dirname, "*.png"))))
                assert imgs
                tracklets.append((imgs, pid, 0))
            if cam2:
                imgs = tuple(sorted(glob.glob(
                    osp.join(self.cam_2_path, dirname, "*.png"))))
                assert imgs
                tracklets.append((imgs, pid, 1))
        return tracklets
