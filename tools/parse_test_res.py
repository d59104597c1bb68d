"""Parse and average test results across split log files.

Reference analog: ``tools/parse_test_res.py:31-103`` — regex-parses
``test.log*`` files under per-split directories and averages mAP and CMC
ranks.

Usage:
    python tools/parse_test_res.py <directory> [--suffix test.log]
"""

from __future__ import annotations

import argparse
import glob
import os.path as osp
import re
from collections import defaultdict

import numpy as np


def parse_file(filepath: str, regex_mAP, regex_r: dict):
    results = {}
    with open(filepath, "r") as f:
        for line in f:
            m = regex_mAP.search(line)
            if m:
                results["mAP"] = float(m.group(1))
            for name, regex in regex_r.items():
                m = regex.search(line)
                if m:
                    results[name] = float(m.group(1))
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("directory", type=str, help="path to directory")
    parser.add_argument("--suffix", type=str, default="test.log",
                        help="log file name suffix")
    args = parser.parse_args()

    regex_mAP = re.compile(r"mAP: ([\.\deE+-]+)%")
    ranks = [1, 5, 10, 20]
    regex_r = {
        f"r{r}": re.compile(rf"Rank-{r}\s*: ([\.\deE+-]+)%") for r in ranks
    }

    logs = sorted(glob.glob(osp.join(args.directory, "**", args.suffix + "*"),
                            recursive=True))
    if not logs:
        print(f"No {args.suffix}* files under {args.directory}")
        return

    metrics = defaultdict(list)
    for log in logs:
        res = parse_file(log, regex_mAP, regex_r)
        print(f"{log}: {res}")
        for k, v in res.items():
            metrics[k].append(v)

    print("\nAverage performance")
    for k, vals in metrics.items():
        print(f"{k}: {np.mean(vals):.1f}% (over {len(vals)} splits)")


if __name__ == "__main__":
    main()
