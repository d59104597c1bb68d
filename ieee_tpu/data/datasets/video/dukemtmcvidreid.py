"""DukeMTMC-VideoReID (reference
``torchreid/data/datasets/video/dukemtmcvidreid.py``). 702 train / 702 test
identities; per-identity tracklet dirs with F0001-style frame indices;
parsed splits cached to JSON.
"""

from __future__ import annotations

import glob
import os.path as osp
import warnings

from ....utils.tools import read_json, write_json
from ..base import VideoDataset


class DukeMTMCVidReID(VideoDataset):
    dataset_dir = "dukemtmc-vidreid"
    dataset_url = None

    def __init__(self, root="", min_seq_len=0, **kwargs):
        self.root = osp.abspath(osp.expanduser(root))
        self.dataset_dir = osp.join(self.root, self.dataset_dir)
        base = osp.join(self.dataset_dir, "DukeMTMC-VideoReID")
        self.train_dir = osp.join(base, "train")
        self.query_dir = osp.join(base, "query")
        self.gallery_dir = osp.join(base, "gallery")
        self.split_train_json_path = osp.join(self.dataset_dir,
                                              "split_train.json")
        self.split_query_json_path = osp.join(self.dataset_dir,
                                              "split_query.json")
        self.split_gallery_json_path = osp.join(self.dataset_dir,
                                                "split_gallery.json")
        self.min_seq_len = min_seq_len
        self.check_before_run([self.dataset_dir, self.train_dir,
                               self.query_dir, self.gallery_dir])

        train = self.process_dir(self.train_dir, self.split_train_json_path,
                                 relabel=True)
        query = self.process_dir(self.query_dir, self.split_query_json_path,
                                 relabel=False)
        gallery = self.process_dir(self.gallery_dir,
                                   self.split_gallery_json_path, relabel=False)
        super().__init__(train, query, gallery, **kwargs)

    def process_dir(self, dir_path, json_path, relabel):
        if osp.exists(json_path):
            return read_json(json_path)["tracklets"]
        print("=> Generating split json file (** this might take a while **)")
        pdirs = sorted(glob.glob(osp.join(dir_path, "*")))
        print(f'Processing "{dir_path}" with {len(pdirs)} person identities')

        pid_container = {int(osp.basename(p)) for p in pdirs}
        pid2label = {pid: label for label, pid in enumerate(sorted(pid_container))}

        tracklets = []
        for pdir in pdirs:
            pid = int(osp.basename(pdir))
            if relabel:
                pid = pid2label[pid]
            for tdir in sorted(glob.glob(osp.join(pdir, "*"))):
                raw_img_paths = glob.glob(osp.join(tdir, "*.jpg"))
                num_imgs = len(raw_img_paths)
                if num_imgs < self.min_seq_len:
                    continue
                img_paths = []
                for img_idx in range(num_imgs):
                    img_idx_name = "F" + str(img_idx + 1).zfill(4)
                    res = glob.glob(osp.join(tdir, f"*{img_idx_name}*.jpg"))
                    if not res:
                        warnings.warn(
                            f"Index name {img_idx_name} in {tdir} is missing, "
                            f"skip")
                        continue
                    img_paths.append(res[0])
                img_name = osp.basename(img_paths[0])
                camid = (int(img_name[5]) if "_" not in img_name
                         else int(img_name[6])) - 1
                tracklets.append((tuple(img_paths), pid, camid))

        print(f"Saving split to {json_path}")
        write_json({"tracklets": tracklets}, json_path)
        return tracklets
