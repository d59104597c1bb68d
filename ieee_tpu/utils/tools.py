"""Small host-side helpers.

Reference analog: ``torchreid/utils/tools.py``. Divergences: ``read_image``
retries a bounded number of times instead of looping forever
(reference ``utils/tools.py:110-117``).
"""

from __future__ import annotations

import errno
import json
import os
import os.path as osp
import random
import sys
import time
import warnings

import numpy as np

__all__ = [
    "mkdir_if_missing",
    "check_isfile",
    "read_json",
    "write_json",
    "set_random_seed",
    "read_image",
    "collect_env_info",
    "download_url",
]


def mkdir_if_missing(dirname: str) -> None:
    if dirname and not osp.exists(dirname):
        try:
            os.makedirs(dirname)
        except OSError as e:
            if e.errno != errno.EEXIST:
                raise


def check_isfile(fpath: str) -> bool:
    isfile = osp.isfile(fpath)
    if not isfile:
        warnings.warn(f'No file found at "{fpath}"')
    return isfile


def read_json(fpath: str):
    with open(fpath, "r") as f:
        return json.load(f)


def write_json(obj, fpath: str) -> None:
    mkdir_if_missing(osp.dirname(fpath))
    with open(fpath, "w") as f:
        json.dump(obj, f, indent=4, separators=(",", ": "))


def set_random_seed(seed: int) -> None:
    """Seed host-side RNGs. Device-side randomness is jax.random key-threaded
    (deterministic by construction), so there is no cudnn-style switch."""
    random.seed(seed)
    np.random.seed(seed)
    # note: only inherited by CHILD processes (worker subprocesses); the
    # current interpreter's hash seed was fixed at startup and cannot be
    # changed here
    os.environ["PYTHONHASHSEED"] = str(seed)


def read_image(path: str, max_retries: int = 5) -> np.ndarray:
    """Read an image file into an RGB uint8 HWC array."""
    from PIL import Image

    if not osp.exists(path):
        raise IOError(f'"{path}" does not exist')
    last_err = None
    for _ in range(max_retries):
        try:
            img = Image.open(path).convert("RGB")
            return np.asarray(img, dtype=np.uint8)
        except IOError as e:  # transient FS hiccup; bounded retry
            last_err = e
            time.sleep(0.05)
    raise IOError(f'Failed to read "{path}" after {max_retries} attempts') from last_err


def download_url(url: str, dst: str) -> None:
    """Download a file (kept for dataset auto-download API parity;
    reference ``utils/tools.py:57-77``)."""
    from urllib.request import urlretrieve

    print(f'* url="{url}"')
    print(f'* destination="{dst}"')

    def _reporthook(count, block_size, total_size):
        global _start_time
        if count == 0:
            _start_time = time.time()
            return
        duration = max(time.time() - _start_time, 1e-6)
        progress_size = int(count * block_size)
        speed = int(progress_size / (1024 * duration))
        percent = min(int(count * block_size * 100 / max(total_size, 1)), 100)
        sys.stdout.write(
            f"\r...{percent}%, {progress_size / (1024 * 1024):.1f} MB, "
            f"{speed} KB/s, {duration:.0f} seconds passed"
        )
        sys.stdout.flush()

    urlretrieve(url, dst, _reporthook)
    sys.stdout.write("\n")


def collect_env_info() -> str:
    import jax

    lines = [
        f"python: {sys.version.split()[0]}",
        f"numpy: {np.__version__}",
        f"jax: {jax.__version__}",
        f"backend: {jax.default_backend()}",
        f"devices: {[str(d) for d in jax.devices()]}",
    ]
    return "\n".join(lines)
