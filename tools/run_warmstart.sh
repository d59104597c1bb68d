#!/bin/bash
# Warm-start experiment: train the FULL IEEE variant (CIM+CA+REM+3M margin)
# from the base-variant's 600-epoch trained trunk+heads (params+batch_stats
# only; fresh optimizer state), mirroring the reference's protocol where the
# 3M loss is always applied on an ImageNet-warm-started trunk
# (reference torchreid/models/resnet.py:1075-1089 pretrained=True default).
#
# Motivation (tools/diag_train.py, E2E_DIAG_r03.jsonl): from scratch the
# trunk gradient is 200-500x dominated by the margin term (backbone grad
# norm 350-1100 vs classifier 1.6-2.4) and the trunk never learns class-
# discriminative features, so CE stays at chance for 600 epochs while LossM
# falls. Warm features are the reference's implicit precondition; this run
# tests whether the full stack then trains (CE recovers, heldout mAP rises
# above the base variant's).
#
# Waits for the running e2e suite (PID in /tmp/e2e_suite.pid) to release the
# chip first (1 TPU client, 1 CPU core). Usage: bash tools/run_warmstart.sh
# [epochs] [init_blob]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
EPOCHS="${1:-150}"
INIT="${2:-/root/repo/base600.msgpack-ws}"
OUT="E2E_WARMSTART_r03.json"
S1=$((EPOCHS / 2)); S2=$((EPOCHS * 3 / 4))

if [ -f /tmp/e2e_suite.pid ]; then
  spid=$(cat /tmp/e2e_suite.pid)
  while kill -0 "$spid" 2>/dev/null; do
    echo "suite (pid $spid) still running, waiting... ($(date))"
    sleep 120
  done
fi

if grep -q '"complete": true' "$OUT" 2>/dev/null; then
  echo "$OUT already complete, nothing to do"; exit 0
fi
vlog=/tmp/e2e_warmstart_run.log
rm -rf /tmp/e2e_warmstart; rm -f "$OUT"
for attempt in 1 2 3; do
  echo "=== warmstart attempt $attempt ($(date)) ==="
  setsid timeout 7200 python tools/train_e2e.py --variant full \
    --optim amsgrad --lr 3e-4 --stepsize "$S1,$S2" \
    --pids 48 --imgs-per-pid 32 --epochs "$EPOCHS" --eval-freq 25 \
    --decode-cache --device-cache --resume --heldout-test \
    --init-from "$INIT" \
    --out "$OUT" --save-dir /tmp/e2e_warmstart \
    > "$vlog" 2>&1 &
  pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    age=$(( $(date +%s) - $(stat -c %Y "$vlog" 2>/dev/null || echo 0) ))
    if [ "$age" -gt 600 ]; then
      echo "warmstart attempt $attempt STALLED (${age}s log silence)"
      kill -- -"$pid" 2>/dev/null; sleep 10; kill -9 -- -"$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid"; rc=$?
  tail -20 "$vlog"
  if grep -q '"complete": true' "$OUT" 2>/dev/null; then
    echo "warmstart OK (attempt $attempt)"; exit 0
  fi
  echo "warmstart attempt $attempt FAILED rc=$rc"
done
exit 1
