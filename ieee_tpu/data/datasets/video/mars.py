"""MARS video re-ID (reference ``torchreid/data/datasets/video/mars.py``).

identities 1261; tracklets 8298 train / 1980 query / 9330 gallery; 6 cameras.
Metadata from the info/ .mat files.
"""

from __future__ import annotations

import os.path as osp
import warnings

from ..base import VideoDataset


class Mars(VideoDataset):
    dataset_dir = "mars"
    dataset_url = None

    def __init__(self, root="", **kwargs):
        from scipy.io import loadmat

        self.root = osp.abspath(osp.expanduser(root))
        self.dataset_dir = osp.join(self.root, self.dataset_dir)
        info = lambda f: osp.join(self.dataset_dir, "info", f)
        self.train_name_path = info("train_name.txt")
        self.test_name_path = info("test_name.txt")
        self.track_train_info_path = info("tracks_train_info.mat")
        self.track_test_info_path = info("tracks_test_info.mat")
        self.query_IDX_path = info("query_IDX.mat")
        self.check_before_run([
            self.dataset_dir, self.train_name_path, self.test_name_path,
            self.track_train_info_path, self.track_test_info_path,
            self.query_IDX_path,
        ])

        train_names = self._get_names(self.train_name_path)
        test_names = self._get_names(self.test_name_path)
        track_train = loadmat(self.track_train_info_path)["track_train_info"]
        track_test = loadmat(self.track_test_info_path)["track_test_info"]
        query_idx = loadmat(self.query_IDX_path)["query_IDX"].squeeze() - 1
        track_query = track_test[query_idx, :]
        gallery_idx = [i for i in range(track_test.shape[0])
                       if i not in set(query_idx.tolist())]
        track_gallery = track_test[gallery_idx, :]

        train = self._process(train_names, track_train, "bbox_train", True)
        query = self._process(test_names, track_query, "bbox_test", False)
        gallery = self._process(test_names, track_gallery, "bbox_test", False)
        super().__init__(train, query, gallery, **kwargs)

    @staticmethod
    def _get_names(fpath):
        with open(fpath, "r") as f:
            return [line.rstrip() for line in f]

    def _process(self, names, meta_data, home_dir, relabel, min_seq_len=0):
        pid_list = sorted(set(meta_data[:, 2].tolist()))
        pid2label = {pid: label for label, pid in enumerate(pid_list)}
        tracklets = []
        for row in meta_data:
            start_index, end_index, pid, camid = row.tolist()
            if pid == -1:
                continue  # junk
            assert 1 <= camid <= 6
            label = pid2label[pid] if relabel else pid
            img_names = names[start_index - 1:end_index]
            assert len({n[:4] for n in img_names}) == 1, \
                "a single tracklet contains different person images"
            assert len({n[5] for n in img_names}) == 1, \
                "images are captured under different cameras"
            img_paths = tuple(
                osp.join(self.dataset_dir, home_dir, n[:4], n)
                for n in img_names
            )
            if len(img_paths) >= min_seq_len:
                tracklets.append((img_paths, label, camid - 1))
        return tracklets

    def combine_all(self):
        warnings.warn(
            "Some query IDs do not appear in gallery. Therefore, combineall "
            "does not make any difference to Mars"
        )
