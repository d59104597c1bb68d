#!/bin/bash
# Round-5 screening for the synthetic-x1 discriminative benchmark: base vs
# full (seed 0) on the chip to verify the benchmark discriminates before
# spending the full 4-variant x 3-seed suite. One chip client at a time.
#
# Protocol: 192 train pids x 8 imgs (reference few-shot regime), heldout
# 96-pid open-set eval, batch 32 (P=8 ids => 4x the reference's P=2 margin
# gradient, far below the collapsing P=32), amsgrad 3e-4, multi_step [30,50],
# 60 epochs. Reference-exact sum-form 3M loss (weight_m 1) for full.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1

run() { # run <tag> <variant> [extra...]
  local tag="$1" v="$2"; shift 2
  local out="/tmp/SCREEN_x1_${tag}.json" vlog="/tmp/screen_x1_${tag}.log"
  local attempt rc age pid
  if grep -q '"complete": true' "$out" 2>/dev/null; then
    echo "=== $tag already complete, skipping ==="; return 0
  fi
  for attempt in 1 2; do
    echo "=== screen $tag attempt $attempt ($(date)) ==="
    setsid timeout 7200 python tools/train_e2e.py --variant "$v" \
      --cross-modal --heldout-test --seed 0 \
      --pids 192 --imgs-per-pid 8 --batch 32 \
      --optim amsgrad --lr 3e-4 --stepsize 30,50 \
      --epochs 60 --eval-freq 10 --decode-cache --resume \
      --out "$out" --save-dir "/tmp/screen_x1_$tag" "$@" > "$vlog" 2>&1 &
    pid=$!
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      age=$(( $(date +%s) - $(stat -c %Y "$vlog" 2>/dev/null || echo 0) ))
      if [ "$age" -gt 1200 ]; then
        echo "$tag attempt $attempt STALLED (${age}s log silence)"
        kill -- -"$pid" 2>/dev/null; sleep 10; kill -9 -- -"$pid" 2>/dev/null
        break
      fi
    done
    wait "$pid"; rc=$?
    tail -5 "$vlog"
    if grep -q '"complete": true' "$out" 2>/dev/null; then
      echo "$tag OK"; return 0
    fi
    echo "$tag attempt $attempt FAILED rc=$rc"
  done
  return 1
}

run base base
run full full
echo "=== screen done ==="
for f in /tmp/SCREEN_x1_*.json; do
  echo "$f"; python - "$f" <<'EOF'
import json, sys
a = json.load(open(sys.argv[1]))
print(" variant:", a["protocol"]["variant"], "complete:", a["complete"],
      "fingerprint:", a.get("params_fingerprint"))
for e in a["evals"]: print("  epoch", e["epoch"], "mAP", round(e["mAP"], 4), "r1", round(e["rank1"], 4))
EOF
done
