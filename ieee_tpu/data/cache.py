"""Pre-decoded uint8 memmap cache for the train loader.

Round-2 finding (tools/loader_bench.py): on a 1-core host the threaded
jpeg-decode pool tops out near half the chip's step rate — the pool scales
with cores, but a deterministic fallback is needed when cores are scarce
(VERDICT round-2 item 7). Since ``Dataset._read_resized`` already produces
fixed-shape (H, W, 3) uint8 (decode + PIL resize, ``datasets/base.py:220``),
caching its output is numerically EXACT: the first epoch decodes once and
writes through to a disk memmap; later epochs are pure memcpy reads
(hundreds of batches/s), with augmentation still on device.

Sized at RGBNT201 scale: 4787 triplets x 3 x 256x128x3 u8 = 1.4 GB on disk.
Enable with ``cfg.data.decode_cache = True`` (tmp dir) or a directory path.
"""

from __future__ import annotations

import hashlib
import os.path as osp
import tempfile
import threading
from typing import Any, Dict

import numpy as np

from ..utils.tools import mkdir_if_missing

__all__ = ["CachedDataset"]


class CachedDataset:
    """Wraps a Dataset (train mode): serves decoded images from a uint8
    memmap after first access; metadata is captured alongside. Thread-safe
    under the loader pool (idempotent writes; a lock guards the metadata
    dict only)."""

    def __init__(self, dataset, cache_dir: str | None = None):
        self.ds = dataset
        n = len(dataset)
        first = dataset.data[0][0]
        self.multi = isinstance(first, (list, tuple))
        m = len(first) if self.multi else 1
        h, w = dataset.height, dataset.width
        self._shape = (n, m, h, w, 3)

        sig = repr(("v2", type(dataset).__name__, self._shape,
                    dataset.data[0][0], dataset.data[-1][0]))
        key = hashlib.md5(sig.encode()).hexdigest()[:12]
        d = cache_dir if isinstance(cache_dir, str) and cache_dir else \
            osp.join(tempfile.gettempdir(), "ieee_tpu_decode_cache")
        mkdir_if_missing(d)
        img_path = osp.join(d, f"decoded-{key}.u8")
        fill_path = osp.join(d, f"filled-{key}.u8")
        nbytes = int(np.prod(self._shape))
        fresh = not (osp.isfile(img_path)
                     and osp.getsize(img_path) == nbytes
                     and osp.isfile(fill_path)
                     and osp.getsize(fill_path) == n)
        mode = "w+" if fresh else "r+"
        self._imgs = np.memmap(img_path, np.uint8, mode, shape=self._shape)
        self._fill = np.memmap(fill_path, np.uint8, mode, shape=(n,))
        # metadata (pid/camid/impath/...) is tiny; captured on first decode
        # and rebuilt from the dataset tuples for pre-filled entries
        self._meta: Dict[int, Dict[str, Any]] = {}
        self._lock = threading.Lock()

    def __len__(self) -> int:
        return len(self.ds)

    def __getattr__(self, name):
        return getattr(self.ds, name)

    def _meta_from_tuple(self, index) -> Dict[str, Any]:
        # mirror the datasets' __getitem__ metadata exactly (base.py
        # Image/MultiModal/Video __getitem__): impath is the FIRST path for
        # multi-path items, and multi-modal items carry timeid — warm
        # restarts must hand out the same dict shape as cold decodes
        entry = self.ds.data[index]
        paths, pid, camid = entry[0], entry[1], entry[2]
        dsetid = entry[3] if len(entry) > 3 else 0
        impath = paths[0] if isinstance(paths, (list, tuple)) else paths
        meta = {"pid": pid, "camid": camid, "impath": impath,
                "dsetid": dsetid}
        if self.multi:
            meta["timeid"] = dsetid
        return meta

    def __getitem__(self, index: int) -> Dict[str, Any]:
        if self._fill[index]:
            with self._lock:
                meta = self._meta.get(index)
            if meta is None:
                meta = self._meta_from_tuple(index)
                with self._lock:
                    self._meta[index] = meta
            # REAL copy out of the memmap (np.asarray returns a live view
            # of the on-disk buffer; a consumer mutating it in place would
            # permanently corrupt the persistent cache)
            arr = np.array(self._imgs[index])
            item = dict(meta)
            item["img"] = list(arr) if self.multi else arr[0]
            return item

        item = self.ds[index]
        imgs = item["img"] if self.multi else [item["img"]]
        self._imgs[index] = np.stack(imgs)
        self._fill[index] = 1
        with self._lock:
            self._meta[index] = {k: v for k, v in item.items() if k != "img"}
        return item
