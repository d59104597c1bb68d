"""Synthetic in-memory datasets (no reference analog).

Purpose: CI/tests/bench run in environments without the (license-gated) re-ID
datasets on disk. These generate deterministic random images in memory with
realistic id/camera structure so every layer above (sampler, loaders, engine,
eval protocol) exercises identically to a real dataset.
"""

from __future__ import annotations

import numpy as np

from ..base import ImageDataset, MultiModalImageDataset, VideoDataset


def _make_split(rng, num_pids, imgs_per_pid, num_cams, num_modal, pid_offset=0):
    data = []
    for pid in range(num_pids):
        for j in range(imgs_per_pid):
            camid = int(rng.integers(0, num_cams))
            key = int(rng.integers(0, 2**31))
            if num_modal == 1:
                data.append((f"synthetic://{pid + pid_offset}/{j}/{key}",
                             pid + pid_offset, camid))
            else:
                paths = [
                    f"synthetic://{pid + pid_offset}/{j}/{key}/{m}"
                    for m in range(num_modal)
                ]
                data.append((paths, pid + pid_offset, camid))
    return data


def _render(path: str, height: int, width: int) -> np.ndarray:
    """Deterministic pseudo-image from the path string (md5, not hash():
    python string hashing is randomized per process, which broke decode
    caches persisted across test processes)."""
    import hashlib

    seed = int(hashlib.md5(path.encode()).hexdigest()[:8], 16)
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(8, 4, 3), dtype=np.uint8)
    img = np.kron(base, np.ones((height // 8, width // 4, 1), dtype=np.uint8))
    noise = rng.integers(0, 32, size=(height, width, 3), dtype=np.uint8)
    return np.clip(img[:height, :width] + noise, 0, 255).astype(np.uint8)


class _SyntheticMixin:
    def _read_resized(self, path: str) -> np.ndarray:
        return _render(path, self.height, self.width)


class Synthetic(_SyntheticMixin, ImageDataset):
    """Single-modal synthetic dataset."""

    def __init__(self, root="", num_pids=16, imgs_per_pid=8, num_cams=4,
                 seed=0, **kwargs):
        rng = np.random.default_rng(seed)
        train = _make_split(rng, num_pids, imgs_per_pid, num_cams, 1)
        query = _make_split(rng, num_pids // 2, 2, num_cams, 1)
        gallery = _make_split(rng, num_pids // 2, 4, num_cams, 1)
        kwargs.setdefault("verbose", False)
        super().__init__(train, query, gallery, **kwargs)


class SyntheticVideo(_SyntheticMixin, VideoDataset):
    """Synthetic tracklet dataset for the video engines."""

    def __init__(self, root="", num_pids=8, tracklets_per_pid=3,
                 frames_per_tracklet=6, num_cams=2, seed=0, **kwargs):
        rng = np.random.default_rng(seed)

        def make(num, offset=0):
            data = []
            for pid in range(num):
                for t in range(tracklets_per_pid):
                    camid = int(rng.integers(0, num_cams))
                    key = int(rng.integers(0, 2**31))
                    frames = tuple(
                        f"synthetic://v/{pid + offset}/{t}/{key}/{f}"
                        for f in range(frames_per_tracklet)
                    )
                    data.append((frames, pid + offset, camid))
            return data

        train = make(num_pids)
        query = make(num_pids // 2)
        gallery = make(num_pids // 2)
        kwargs.setdefault("verbose", False)
        super().__init__(train, query, gallery, **kwargs)


class SyntheticMM(_SyntheticMixin, MultiModalImageDataset):
    """3-modal (R/N/T-style) synthetic dataset."""

    def __init__(self, root="", num_pids=16, imgs_per_pid=8, num_cams=4,
                 num_modal=3, seed=0, **kwargs):
        rng = np.random.default_rng(seed)
        train = _make_split(rng, num_pids, imgs_per_pid, num_cams, num_modal)
        query = _make_split(rng, num_pids // 2, 2, num_cams, num_modal)
        gallery = _make_split(rng, num_pids // 2, 4, num_cams, num_modal)
        kwargs.setdefault("verbose", False)
        super().__init__(train, query, gallery, **kwargs)
