"""Compute channel mean and std over a dataset's train images.

Reference analog: ``tools/compute_mean_std.py:1-59``.

Usage:
    python tools/compute_mean_std.py --root <data-root> --sources market1501
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import numpy as np

from ieee_tpu.data import ImageDataManager


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", type=str, default="")
    parser.add_argument("--sources", type=str, nargs="+", default=["market1501"])
    parser.add_argument("--height", type=int, default=256)
    parser.add_argument("--width", type=int, default=128)
    parser.add_argument("--batch", type=int, default=100)
    args = parser.parse_args()

    dm = ImageDataManager(
        root=args.root, sources=args.sources, targets=args.sources,
        height=args.height, width=args.width, batch_size_train=args.batch,
        batch_size_test=args.batch, transforms=None, workers=1,
        train_sampler="SequentialSampler", verbose=False,
    )

    count = 0
    mean = np.zeros(3, np.float64)
    m2 = np.zeros(3, np.float64)
    for batch in dm.train_loader:
        imgs = batch["img"]
        streams = imgs if isinstance(imgs, tuple) else (imgs,)
        for x in streams:
            x = x.astype(np.float64) / 255.0
            n = x.shape[0] * x.shape[1] * x.shape[2]
            batch_mean = x.mean(axis=(0, 1, 2))
            batch_var = x.var(axis=(0, 1, 2))
            delta = batch_mean - mean
            total = count + n
            mean += delta * n / total
            m2 += batch_var * n + delta**2 * count * n / total
            count = total
    std = np.sqrt(m2 / count)
    print(f"mean: {mean.tolist()}")
    print(f"std:  {std.tolist()}")


if __name__ == "__main__":
    main()
