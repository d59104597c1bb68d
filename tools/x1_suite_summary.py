"""Distill the round-5 synthetic-x1 ablation runs into ONE artifact.

Reads every committed E2E_X1_<variant>_s<seed>_r05.json, extracts the
final heldout mAP/rank1 per run, and writes E2E_X1_SUITE_r05.json with
per-variant mean/std/runs, the empirical ordering, and gap-vs-noise
ratios (gap between adjacent Table-3 variants divided by the pooled
seed std). The paper's claim (Table 3) is base < cim < cim3m < full;
whatever the data shows is recorded as-is.

Usage: python tools/x1_suite_summary.py [--write]
"""

from __future__ import annotations

import argparse
import glob
import json
import os.path as osp
import re
import statistics

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
ORDER = ["base", "cim", "cim3m", "full"]


def collect():
    runs = {}
    for path in sorted(glob.glob(osp.join(ROOT, "E2E_X1_*_r05.json"))):
        m = re.match(r"E2E_X1_(\w+)_s(\d+)_r05\.json", osp.basename(path))
        if not m:
            continue
        variant, seed = m.group(1), int(m.group(2))
        with open(path) as f:
            a = json.load(f)
        if not a.get("complete") or not a.get("evals"):
            continue
        final = a["evals"][-1]
        runs.setdefault(variant, []).append({
            "seed": seed,
            "mAP": final["mAP"],
            "rank1": final["rank1"],
            "best_mAP": max(e["mAP"] for e in a["evals"]),
            "fingerprint": a.get("params_fingerprint"),
            "git_commit": a.get("git_commit"),
        })
    return runs


def collect_warm():
    """Warm-start leg (E2E_X1W_*): every variant initialized from the
    seed-0 trained base trunk, 40 epochs — the regime the reference's
    protocol assumes (its trunk is ImageNet-warm-started)."""
    warm = {}
    for path in sorted(glob.glob(osp.join(ROOT, "E2E_X1W_*_r05.json"))):
        m = re.match(r"E2E_X1W_(\w+)_s(\d+)_r05\.json", osp.basename(path))
        if not m:
            continue
        with open(path) as f:
            a = json.load(f)
        if not a.get("complete") or not a.get("evals"):
            continue
        final = a["evals"][-1]
        warm[m.group(1)] = {
            "seed": int(m.group(2)),
            "mAP": final["mAP"],
            "rank1": final["rank1"],
            "best_mAP": max(e["mAP"] for e in a["evals"]),
            "fingerprint": a.get("params_fingerprint"),
        }
    return warm


def summarize(runs):
    per_variant = {}
    stds = []
    for v, rs in runs.items():
        maps = [r["mAP"] for r in rs]
        per_variant[v] = {
            "n": len(rs),
            "mAP_mean": statistics.mean(maps),
            "mAP_std": statistics.stdev(maps) if len(maps) > 1 else None,
            "mAP_per_seed": {r["seed"]: r["mAP"] for r in rs},
            "rank1_mean": statistics.mean(r["rank1"] for r in rs),
            "fingerprints": sorted({r["fingerprint"] for r in rs
                                    if r["fingerprint"]}),
        }
        if len(maps) > 1:
            stds.append(statistics.stdev(maps))
    noise = (statistics.mean(stds) if stds else None)

    present = [v for v in ORDER if v in per_variant]
    empirical = sorted(present, key=lambda v: per_variant[v]["mAP_mean"])
    gaps = {}
    for lo, hi in zip(ORDER, ORDER[1:]):
        if lo in per_variant and hi in per_variant:
            gap = per_variant[hi]["mAP_mean"] - per_variant[lo]["mAP_mean"]
            gaps[f"{hi}-{lo}"] = {
                "gap": gap,
                "gap_over_noise": (gap / noise) if noise else None,
            }
    # every pair of runs must have distinct weight fingerprints
    all_fps = [fp for v in per_variant.values() for fp in v["fingerprints"]]
    return {
        "protocol": "synthetic-x1, 128x8 train pids, 64 heldout pids, "
                    "REFERENCE protocol: batch 8 (P=2), sgd 1e-3 wd 5e-4, "
                    "multi_step [20,40], 61 epochs, reference-exact sum "
                    "3M, from scratch",
        "variants": per_variant,
        "expected_order": ORDER,
        "empirical_order_by_mean_mAP": empirical,
        "matches_table3": empirical == present == ORDER[:len(present)]
                           and len(present) == 4,
        "adjacent_gaps": gaps,
        "seed_noise_std": noise,
        "fingerprints_all_distinct": len(all_fps) == len(set(all_fps)),
    }


def attach_warm(summary, warm):
    if not warm:
        return summary
    present = [v for v in ORDER if v in warm]
    summary["warm_leg"] = {
        "protocol": "same data (seed 0), every variant --init-from the "
                    "seed-0 trained base trunk "
                    "(.ckpts/x1_base_s0/model.msgpack-61), 40 epochs, "
                    "sgd 1e-3, multi_step [20,30]; base row = continued "
                    "training control",
        "variants": warm,
        "empirical_order_by_mAP": sorted(present, key=lambda v: warm[v]["mAP"]),
    }
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true",
                    help="write E2E_X1_SUITE_r05.json")
    args = ap.parse_args()
    runs = collect()
    summary = attach_warm(summarize(runs), collect_warm())
    print(json.dumps(summary, indent=1))
    if args.write:
        out = osp.join(ROOT, "E2E_X1_SUITE_r05.json")
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
