"""Summarize E2E_*.json convergence artifacts into one table.

Usage: python tools/summarize_e2e.py [glob ...]   (default: E2E_*.json)

Each artifact is written by tools/train_e2e.py (possibly partial —
``complete: false`` when a run was killed; the trajectory up to that
point is still real). Prints variant, protocol, last-epoch loss, the
mAP/rank1 trajectory endpoints, and completeness.
"""

from __future__ import annotations

import glob
import json
import sys


def row(path: str) -> dict:
    with open(path) as f:
        a = json.load(f)
    proto = a.get("protocol", {})
    losses = a.get("loss_per_epoch", {})
    evals = a.get("evals", [])
    last_ep = max((int(e) for e in losses), default=0)
    return {
        "artifact": path,
        "variant": proto.get("variant", "?"),
        # "held-out images of seen ids (closed-set)" must not truncate to
        # the open-set-looking "held-out"
        "split": ("seen-ids" if "seen ids" in proto.get("test_split", "")
                  else proto.get("test_split", "?").split(" ")[0]),
        "backbone": proto.get("backbone_layers", "?"),
        "epochs": f"{last_ep}/{proto.get('epochs', '?')}",
        "loss_last": (losses.get(str(last_ep)) or
                      losses.get(last_ep, {})).get("loss"),
        "mAP_first": evals[0]["mAP"] if evals else None,
        "mAP_last": evals[-1]["mAP"] if evals else None,
        "rank1_last": evals[-1]["rank1"] if evals else None,
        "complete": a.get("complete", True),
    }


def main():
    pats = sys.argv[1:] or ["E2E_*.json"]
    paths = sorted(p for pat in pats for p in glob.glob(pat))
    if not paths:
        print("no artifacts found", file=sys.stderr)
        return 1
    rows = [row(p) for p in paths]
    cols = ["artifact", "variant", "split", "backbone", "epochs",
            "loss_last", "mAP_first", "mAP_last", "rank1_last", "complete"]
    widths = {c: max(len(c), *(len(_fmt(r[c])) for r in rows)) for c in cols}
    print("  ".join(c.ljust(widths[c]) for c in cols))
    for r in rows:
        print("  ".join(_fmt(r[c]).ljust(widths[c]) for c in cols))
    return 0


def _fmt(v) -> str:
    if isinstance(v, float):
        return f"{v:.4f}"
    return str(v)


if __name__ == "__main__":
    sys.exit(main())
