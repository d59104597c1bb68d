"""Device-resident dataset cache: the whole (small) train set lives in HBM.

TPU-native answer to a transfer-bound input pipeline (SURVEY §7 "decode >=
step rate"): for datasets that fit in device memory as uint8 (RGBNT201
train is ~0.9 GB at 256x128x3 modalities — v5e HBM is 16 GB), decode every
image ONCE, ship it to the device ONCE, and serve each training batch as an
on-device gather by sampler indices. Per-step host->device traffic drops
from ~37 MB of images to ~1 KB of indices — the host never touches pixels
again. Augmentation is unaffected (it already runs on device, in-step,
``transforms.py``).

The reference has no analog (torch DataLoader re-ships every batch over
PCIe); this is the `cfg.data.device_cache` knob. Incompatible with
host-side transforms (``random_patch`` mutates a host-state pool per item).
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List

import numpy as np

__all__ = ["DeviceCachedLoader"]


class DeviceCachedLoader:
    """Drop-in for ``DataLoader`` (same batch dict contract): materializes
    the dataset on device once, then yields device-gathered image batches
    in sampler order. ``img`` entries are committed device arrays; the
    engine's ``device_put`` re-lays them out for the mesh without a host
    round-trip."""

    def __init__(
        self,
        dataset,
        sampler,
        batch_size: int,
        drop_last: bool = False,
        max_bytes: int = 4 << 30,
    ):
        import jax.numpy as jnp

        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.drop_last = drop_last

        n = len(dataset)
        first = dataset[0]
        multi = isinstance(first["img"], (list, tuple))
        shape = (first["img"][0] if multi else first["img"]).shape
        streams = len(first["img"]) if multi else 1
        total = n * streams * int(np.prod(shape))
        if total > max_bytes:
            raise ValueError(
                f"device_cache: dataset needs {total / 1e9:.2f} GB uint8 on "
                f"device (> {max_bytes / 1e9:.2f} GB cap); use the host "
                "decode_cache instead"
            )

        imgs = [np.empty((n,) + shape, np.uint8) for _ in range(streams)]
        pids = np.empty(n, np.int32)
        camids = np.empty(n, np.int32)
        dsetids = np.empty(n, np.int32)
        paths: List[Any] = [None] * n
        for i in range(n):
            it = dataset[i]
            if multi:
                for m in range(streams):
                    imgs[m][i] = it["img"][m]
            else:
                imgs[0][i] = it["img"]
            pids[i] = it["pid"]
            camids[i] = it["camid"]
            dsetids[i] = it.get("dsetid", 0)
            paths[i] = it["impath"]
        # one-time ship to the backend's default device, in bounded slabs:
        # one ~150 MB asarray is a single huge PJRT transfer (the axon
        # tunnel moves ~30 MB/s and has wedged on large one-shot buffers);
        # slabs keep each transfer the size of a normal training batch and
        # sync per slab so a stall surfaces as a slow ship, not a hang.
        self._cache = tuple(self._ship(a) for a in imgs)
        self._multi = multi
        self._pids = pids
        self._camids = camids
        self._dsetids = dsetids
        self._paths = paths

    @staticmethod
    def _sync(x) -> None:
        # block_until_ready does NOT reliably block through the axon PJRT
        # tunnel (CLAUDE.md); pulling a scalar is the project-wide sync.
        import numpy as _np

        idx = (0,) * x.ndim
        int(_np.asarray(x[idx]))

    @staticmethod
    def _ship(a: np.ndarray, slab_bytes: int = 48 << 20):
        import functools

        import jax
        import jax.numpy as jnp

        row = a[0].nbytes if a.ndim > 1 else a.itemsize
        rows = max(1, slab_bytes // max(row, 1))
        if rows >= a.shape[0]:
            out = jnp.asarray(a)
            DeviceCachedLoader._sync(out)
            return out

        # write slabs into a preallocated destination (donated, so XLA
        # aliases in place: peak device memory stays ~1x cache + 1 slab,
        # never 2x as a concatenate of all slabs would)
        @functools.partial(jax.jit, donate_argnums=(0,))
        def _write(dest, slab, start):
            zeros = (jnp.int32(0),) * (dest.ndim - 1)
            return jax.lax.dynamic_update_slice(dest, slab, (start,) + zeros)

        out = jnp.zeros(a.shape, a.dtype)
        for i in range(0, a.shape[0], rows):
            # keep ONE static slab shape so _write compiles once: a short
            # tail is replaced by the full-width window ending at n — the
            # overlap rewrites rows the previous slab already wrote with
            # identical data (idempotent), never with padding.
            if i + rows > a.shape[0]:
                i = a.shape[0] - rows
            slab = jax.device_put(np.ascontiguousarray(a[i:i + rows]))
            out = _write(out, slab, jnp.int32(i))
            DeviceCachedLoader._sync(out)
        return out

    def _batches_of_indices(self) -> Iterator[List[int]]:
        from .loader import batches_of_indices

        return batches_of_indices(self.sampler, self.batch_size, self.drop_last)

    def __len__(self):
        from .loader import num_batches

        return num_batches(self.sampler, self.batch_size, self.drop_last)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        import jax.numpy as jnp

        for indices in self._batches_of_indices():
            idx = jnp.asarray(np.asarray(indices, np.int32))
            gathered = tuple(c[idx] for c in self._cache)
            batch: Dict[str, Any] = {
                "img": gathered if self._multi else gathered[0],
                "pid": self._pids[indices],
                "camid": self._camids[indices],
                "dsetid": self._dsetids[indices],
                "impath": [self._paths[i] for i in indices],
            }
            yield batch
