"""Host-side batch loader: sampler indices -> decoded uint8 numpy batches.

Replaces the reference's ``torch.utils.data.DataLoader`` usage
(``data/datamanager.py:214-330``). The host only decodes and collates;
augmentation/normalization happen on device (``transforms.py``). A small
thread pool overlaps jpeg decode with TPU compute (the reference ran
``workers: 0`` sequential PIL; SURVEY §7 calls for decode >= step rate).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, List

import numpy as np

__all__ = ["DataLoader", "batches_of_indices", "num_batches"]


def batches_of_indices(sampler, batch_size: int, drop_last: bool) -> Iterator[List[int]]:
    """Sampler order -> lists of ``batch_size`` indices (shared by the host
    loader and the device-cache loader so batching semantics can't diverge)."""
    buf: List[int] = []
    for idx in iter(sampler):
        buf.append(idx)
        if len(buf) == batch_size:
            yield buf
            buf = []
    if buf and not drop_last:
        yield buf


def num_batches(sampler, batch_size: int, drop_last: bool) -> int:
    n = len(sampler)
    if drop_last:
        return n // batch_size
    return -(-n // batch_size)


def _collate(items: List[Dict[str, Any]]) -> Dict[str, Any]:
    first = items[0]
    batch: Dict[str, Any] = {}
    if isinstance(first["img"], list):  # multi-modal: list of (H,W,3)
        n_modal = len(first["img"])
        batch["img"] = tuple(
            np.stack([it["img"][m] for it in items]) for m in range(n_modal)
        )
    else:
        batch["img"] = np.stack([it["img"] for it in items])
    batch["pid"] = np.asarray([it["pid"] for it in items], np.int32)
    batch["camid"] = np.asarray([it["camid"] for it in items], np.int32)
    batch["dsetid"] = np.asarray([it.get("dsetid", 0) for it in items], np.int32)
    batch["impath"] = [it["impath"] for it in items]
    return batch


class DataLoader:
    """Iterates a dataset in sampler order, yielding collated numpy batches."""

    def __init__(
        self,
        dataset,
        sampler,
        batch_size: int,
        drop_last: bool = False,
        workers: int = 0,
        prefetch: int = 2,
        host_transform=None,
    ):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.workers = workers
        self.prefetch = max(prefetch, 1)
        # host-side per-image transform (only RandomPatch lives here — its
        # persistent cross-batch patch pool is host state; transforms.py)
        self.host_transform = host_transform
        import threading as _threading

        self._ht_lock = _threading.Lock()

    def _batches_of_indices(self) -> Iterator[List[int]]:
        return batches_of_indices(self.sampler, self.batch_size, self.drop_last)

    def __len__(self):
        return num_batches(self.sampler, self.batch_size, self.drop_last)

    def _apply_host(self, img):
        if img.ndim == 4:  # video tracklet (T, H, W, 3): per frame
            return np.stack([self.host_transform(f) for f in img])
        return self.host_transform(img)

    def _load_batch(self, indices: List[int]) -> Dict[str, Any]:
        items = [self.dataset[i] for i in indices]
        if self.host_transform is not None:
            # the RandomPatch pool is shared mutable state (deque + rng):
            # serialize its application; decode above stays parallel
            with self._ht_lock:
                for it in items:
                    if isinstance(it["img"], list):
                        it["img"] = [self._apply_host(m) for m in it["img"]]
                    else:
                        it["img"] = self._apply_host(it["img"])
        return _collate(items)

    def _iter_pool(self) -> Iterator[Dict[str, Any]]:
        """workers >= 2: a thread pool decodes ``workers`` batches in
        parallel (PIL/numpy release the GIL); batches are delivered in
        sampler order, at most ``prefetch + workers`` in flight."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        ex = ThreadPoolExecutor(max_workers=self.workers)
        pending: "deque" = deque()
        it = self._batches_of_indices()
        try:
            for _ in range(self.prefetch + self.workers):
                indices = next(it, None)
                if indices is None:
                    break
                pending.append(ex.submit(self._load_batch, indices))
            while pending:
                batch = pending.popleft().result()
                indices = next(it, None)
                if indices is not None:
                    pending.append(ex.submit(self._load_batch, indices))
                yield batch
        finally:
            ex.shutdown(wait=False, cancel_futures=True)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        if self.workers <= 0:
            for indices in self._batches_of_indices():
                yield self._load_batch(indices)
            return
        if self.workers >= 2:
            yield from self._iter_pool()
            return

        # background-thread prefetch (decode overlaps device compute)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: List[BaseException] = []
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded put that gives up when the consumer abandoned iteration
            # (break/exception mid-epoch) so the thread never blocks forever
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for indices in self._batches_of_indices():
                    if stop.is_set() or not _put(self._load_batch(indices)):
                        return
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                _put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            stop.set()
            t.join()
        if err:
            raise err[0]
