#!/bin/bash
# Session-6 chip queue (tunnel revived after the session-4/5 outage, /tmp
# wiped so the base-variant checkpoint the warm-start experiment needs is
# gone). One chip client at a time:
#   1. re-train base 150 epochs (converged by ~100: E2E_ABLATION_base_r03
#      shows train acc 100% @50, heldout mAP 0.997 @100) to regenerate a
#      trained trunk checkpoint;
#   2. warm-start the FULL variant from it (tools/run_warmstart.sh) — tests
#      the reference's implicit ImageNet-warm-start precondition for the 3M
#      margin loss (see E2E_DIAG_r03.jsonl gradient-dominance diagnosis);
#   3. finish the remaining e2e suite variants (cim / cim3m / full_seen —
#      full + base artifacts are complete and skipped by the suite itself).
# Usage: bash tools/run_session6.sh
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1

BASEDIR=/tmp/e2e_base_ws
BASEOUT=/tmp/base_ws_retrain.json   # redundant with the committed artifact
vlog=/tmp/e2e_basews_run.log

ckpt_of() { ls -t "$BASEDIR"/model/epoch-*.msgpack 2>/dev/null | head -1; }

if [ -z "$(ckpt_of)" ]; then
  for attempt in 1 2 3; do
    echo "=== base-retrain attempt $attempt ($(date)) ==="
    setsid timeout 3600 python tools/train_e2e.py --variant base \
      --optim amsgrad --lr 3e-4 --stepsize "75,112" \
      --pids 48 --imgs-per-pid 32 --epochs 150 --eval-freq 50 \
      --save-freq 1000 --decode-cache --device-cache --resume \
      --out "$BASEOUT" --save-dir "$BASEDIR" \
      > "$vlog" 2>&1 &
    pid=$!
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      age=$(( $(date +%s) - $(stat -c %Y "$vlog" 2>/dev/null || echo 0) ))
      if [ "$age" -gt 600 ]; then
        echo "base-retrain attempt $attempt STALLED (${age}s log silence)"
        kill -- -"$pid" 2>/dev/null; sleep 10; kill -9 -- -"$pid" 2>/dev/null
        break
      fi
    done
    wait "$pid"; rc=$?
    tail -10 "$vlog"
    [ -n "$(ckpt_of)" ] && { echo "base-retrain OK"; break; }
    echo "base-retrain attempt $attempt FAILED rc=$rc"
  done
fi

CKPT=$(ckpt_of)
if [ -n "$CKPT" ]; then
  echo "=== warmstart from $CKPT ($(date)) ==="
  bash tools/run_warmstart.sh 150 "$CKPT"
else
  echo "no base checkpoint produced; skipping warmstart"
fi

echo "=== remaining suite variants ($(date)) ==="
bash tools/run_e2e_suite.sh
