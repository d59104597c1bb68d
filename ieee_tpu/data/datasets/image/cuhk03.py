"""CUHK03 (reference ``torchreid/data/datasets/image/cuhk03.py:92-260``).

identities: 1360, images 13164, cameras 6 (3 camera pairs x 2 views).
First use extracts pngs from the release ``cuhk-03.mat`` (h5py) and builds
four split JSONs: classic 20-split (detected/labeled; query == gallery,
single-gallery-shot metric) and the 767/700 new protocol from the
``cuhk03_new_protocol_config_*.mat`` files.
"""

from __future__ import annotations

import os.path as osp

from ....utils.tools import mkdir_if_missing, read_json, write_json
from ..base import ImageDataset


class CUHK03(ImageDataset):
    dataset_dir = "cuhk03"
    dataset_url = None

    def __init__(self, root="", split_id=0, cuhk03_labeled=False,
                 cuhk03_classic_split=False, **kwargs):
        self.root = osp.abspath(osp.expanduser(root))
        self.dataset_dir = osp.join(self.root, self.dataset_dir)
        self.data_dir = osp.join(self.dataset_dir, "cuhk03_release")
        self.raw_mat_path = osp.join(self.data_dir, "cuhk-03.mat")
        self.imgs_detected_dir = osp.join(self.dataset_dir, "images_detected")
        self.imgs_labeled_dir = osp.join(self.dataset_dir, "images_labeled")
        d = self.dataset_dir
        self.split_classic_det_json_path = osp.join(d, "splits_classic_detected.json")
        self.split_classic_lab_json_path = osp.join(d, "splits_classic_labeled.json")
        self.split_new_det_json_path = osp.join(d, "splits_new_detected.json")
        self.split_new_lab_json_path = osp.join(d, "splits_new_labeled.json")
        self.split_new_det_mat_path = osp.join(
            d, "cuhk03_new_protocol_config_detected.mat")
        self.split_new_lab_mat_path = osp.join(
            d, "cuhk03_new_protocol_config_labeled.mat")

        self.check_before_run([
            self.dataset_dir, self.data_dir, self.raw_mat_path,
            self.split_new_det_mat_path, self.split_new_lab_mat_path,
        ])
        self.preprocess_split()

        if cuhk03_labeled:
            split_path = (self.split_classic_lab_json_path
                          if cuhk03_classic_split else
                          self.split_new_lab_json_path)
        else:
            split_path = (self.split_classic_det_json_path
                          if cuhk03_classic_split else
                          self.split_new_det_json_path)
        splits = read_json(split_path)
        assert split_id < len(splits), (
            f"Condition split_id ({split_id}) < len(splits) "
            f"({len(splits)}) is false"
        )
        split = splits[split_id]
        super().__init__(split["train"], split["query"], split["gallery"],
                         **kwargs)

    def preprocess_split(self):
        if (osp.exists(self.imgs_labeled_dir)
                and osp.exists(self.imgs_detected_dir)
                and osp.exists(self.split_classic_det_json_path)
                and osp.exists(self.split_classic_lab_json_path)
                and osp.exists(self.split_new_det_json_path)
                and osp.exists(self.split_new_lab_json_path)):
            return

        import h5py
        from PIL import Image
        from scipy.io import loadmat

        mkdir_if_missing(self.imgs_detected_dir)
        mkdir_if_missing(self.imgs_labeled_dir)
        print(f'Extract image data from "{self.raw_mat_path}" and save as png')
        mat = h5py.File(self.raw_mat_path, "r")

        def _deref(ref):
            return mat[ref][:].T

        def _process_images(img_refs, campid, pid, save_dir):
            img_paths = []
            for imgid, img_ref in enumerate(img_refs):
                img = _deref(img_ref)
                if img.size == 0 or img.ndim < 3:
                    continue  # skip empty cell
                viewid = 1 if imgid < 5 else 2
                img_name = f"{campid + 1:01d}_{pid + 1:03d}_" \
                           f"{viewid:01d}_{imgid + 1:02d}.png"
                img_path = osp.join(save_dir, img_name)
                if not osp.isfile(img_path):
                    Image.fromarray(img.astype("uint8")).save(img_path)
                img_paths.append(img_path)
            return img_paths

        def _extract_img(image_type):
            print(f"Processing {image_type} images ...")
            meta_data = []
            imgs_dir = (self.imgs_detected_dir if image_type == "detected"
                        else self.imgs_labeled_dir)
            for campid, camp_ref in enumerate(mat[image_type][0]):
                camp = _deref(camp_ref)
                num_pids = camp.shape[0]
                for pid in range(num_pids):
                    img_paths = _process_images(camp[pid, :], campid, pid,
                                                imgs_dir)
                    assert img_paths, f"campid{campid}-pid{pid} has no images"
                    meta_data.append((campid + 1, pid + 1, img_paths))
                print(f"- done camera pair {campid + 1} with {num_pids} "
                      f"identities")
            return meta_data

        meta_detected = _extract_img("detected")
        meta_labeled = _extract_img("labeled")

        def _extract_classic_split(meta_data, test_split):
            train, test = [], []
            num_train_pids = num_test_pids = 0
            num_train_imgs = num_test_imgs = 0
            for campid, pid, img_paths in meta_data:
                if [campid, pid] in test_split:
                    for img_path in img_paths:
                        camid = int(osp.basename(img_path).split("_")[2]) - 1
                        test.append((img_path, num_test_pids, camid))
                    num_test_pids += 1
                    num_test_imgs += len(img_paths)
                else:
                    for img_path in img_paths:
                        camid = int(osp.basename(img_path).split("_")[2]) - 1
                        train.append((img_path, num_train_pids, camid))
                    num_train_pids += 1
                    num_train_imgs += len(img_paths)
            return (train, num_train_pids, num_train_imgs, test,
                    num_test_pids, num_test_imgs)

        print("Creating classic splits (# = 20) ...")
        splits_classic_det, splits_classic_lab = [], []
        for split_ref in mat["testsets"][0]:
            test_split = _deref(split_ref).tolist()
            for meta, acc in ((meta_detected, splits_classic_det),
                              (meta_labeled, splits_classic_lab)):
                (train, n_tr_pids, n_tr_imgs, test, n_te_pids,
                 n_te_imgs) = _extract_classic_split(meta, test_split)
                acc.append({
                    "train": train, "query": test, "gallery": test,
                    "num_train_pids": n_tr_pids, "num_train_imgs": n_tr_imgs,
                    "num_query_pids": n_te_pids, "num_query_imgs": n_te_imgs,
                    "num_gallery_pids": n_te_pids,
                    "num_gallery_imgs": n_te_imgs,
                })
        write_json(splits_classic_det, self.split_classic_det_json_path)
        write_json(splits_classic_lab, self.split_classic_lab_json_path)

        def _extract_set(filelist, pids, pid2label, idxs, img_dir, relabel):
            tmp_set, unique_pids = [], set()
            for idx in idxs:
                img_name = filelist[idx][0]
                camid = int(img_name.split("_")[2]) - 1
                pid = pids[idx]
                if relabel:
                    pid = pid2label[pid]
                tmp_set.append((osp.join(img_dir, img_name), int(pid), camid))
                unique_pids.add(pid)
            return tmp_set, len(unique_pids), len(idxs)

        def _extract_new_split(split_dict, img_dir):
            train_idxs = split_dict["train_idx"].flatten() - 1
            pids = split_dict["labels"].flatten()
            pid2label = {pid: label for label, pid in
                         enumerate(set(pids[train_idxs]))}
            filelist = split_dict["filelist"].flatten()
            return tuple(
                _extract_set(filelist, pids, pid2label,
                             split_dict[key].flatten() - 1, img_dir,
                             relabel=(key == "train_idx"))
                for key in ("train_idx", "query_idx", "gallery_idx")
            )

        for mat_path, img_dir, json_path, label in (
            (self.split_new_det_mat_path, self.imgs_detected_dir,
             self.split_new_det_json_path, "detected"),
            (self.split_new_lab_mat_path, self.imgs_labeled_dir,
             self.split_new_lab_json_path, "labeled"),
        ):
            print(f"Creating new split for {label} images (767/700) ...")
            train_info, query_info, gallery_info = _extract_new_split(
                loadmat(mat_path), img_dir)
            write_json([{
                "train": train_info[0], "query": query_info[0],
                "gallery": gallery_info[0],
                "num_train_pids": train_info[1],
                "num_train_imgs": train_info[2],
                "num_query_pids": query_info[1],
                "num_query_imgs": query_info[2],
                "num_gallery_pids": gallery_info[1],
                "num_gallery_imgs": gallery_info[2],
            }], json_path)
